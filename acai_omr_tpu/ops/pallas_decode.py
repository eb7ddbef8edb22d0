"""Fused Pallas decode-step attention kernel (TPU).

Single-token attention against the transposed KV cache: each grid program
handles one batch row and streams all heads' K^T / V^T (H, Dh, T) through VMEM
once, computing logits -> masked fp32 softmax -> weighted sum in a single
fused pass — no HBM round trip for attention weights, sequence axis on TPU
lanes end to end. This is the hot op of the KV-cached LMX decode benchmark.

Falls back to the XLA path (models.decode.decode_attention) off-TPU or for
shapes the kernel doesn't cover.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

# Benchmarked on v5e: the fused kernel matches the XLA path for bf16 caches
# (both HBM-bound at the same streams). Off by default; opt in via env or
# set_enabled() — the XLA fallback is numerically the reference path.
_ENABLED = os.environ.get("ACAI_PALLAS_DECODE", "0") == "1"

# int8 caches: the XLA fallback materializes full-size int8->bf16 converted
# copies of K/V every step, erasing the bandwidth win; the fused VPU-style
# kernel below (broadcast-multiply + reduce, no per-head dots) keeps the HBM
# streams int8. On by default whenever the cache is int8.
_ENABLED_INT8 = os.environ.get("ACAI_PALLAS_DECODE_INT8", "1") == "1"

INT8_QMAX = 127.0


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


def set_enabled_int8(flag: bool) -> None:
    global _ENABLED_INT8
    _ENABLED_INT8 = flag


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas(q, kT) -> bool:
    if not _on_tpu():
        return False
    if not (_ENABLED_INT8 if kT.dtype == jnp.int8 else _ENABLED):
        return False
    b, h, dh = q.shape
    t = kT.shape[-1]
    # lane/sublane-friendly shapes; VMEM budget ~ 2*H*Dh*T*2 + slack
    return (dh % 8 == 0 and t % 128 == 0 and h % 8 == 0
            and 2 * h * dh * t * 2 < 12 * 1024 * 1024)


def _row_tile(b: int, h: int, dh: int, t: int, itemsize: int) -> int:
    """Rows per grid step: largest power-of-2 divisor of b whose double-
    buffered K/V blocks + fp32 temporaries stay well under VMEM (~16 MB)."""
    budget = 10 * 1024 * 1024
    temps = 3 * h * dh * t * 4  # fp32 convert + product + weighted-V temps
    bt = 8
    while bt > 1 and (b % bt or 2 * 2 * bt * h * dh * t * itemsize + temps > budget):
        bt //= 2
    return bt


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
            h: int, dh: int, t: int):
    """One batch row: q (H, Dh), kT/vT (H, Dh, T), bias (1, T) -> o (H, Dh).

    Heads are unrolled as 2-D dots (Mosaic does not lower batched
    dot_general); K/V stay resident in VMEM across the head loop.
    """
    bias = bias_ref[...].reshape(1, t)
    q_all = q_ref[...].reshape(h, dh).astype(jnp.float32)
    for head in range(h):
        q = q_all[head].reshape(1, dh)
        k = k_ref[0, head].astype(jnp.float32)            # (Dh, T)
        logits = jax.lax.dot_general(                      # (1, T)
            q, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        v = v_ref[0, head].astype(jnp.float32)            # (Dh, T)
        out = jax.lax.dot_general(                         # (1, Dh): contract T
            w, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, head, :] = ((out / denom).reshape(dh)).astype(o_ref.dtype)


def _kernel_int8(q_ref, k_ref, v_ref, bias_ref, ks_ref, vs_ref, o_ref, *,
                 scale: float, bt: int, h: int, dh: int, t: int):
    """int8 variant: K/V stay int8 through HBM and VMEM (half the traffic of
    bf16) and are dequantized via the (H, T) scale planes. The contractions
    run on the VPU as broadcast-multiply + axis reductions over the whole
    (H, Dh, T) row — no per-head dot unrolling, which Mosaic schedules poorly
    for int8 inputs (measured ~20% slower than this formulation)."""
    for b in range(bt):
        q = q_ref[b].astype(jnp.float32)                    # (H, Dh)
        k = k_ref[b].astype(jnp.float32)                    # (H, Dh, T)
        logits = jnp.sum(q[:, :, None] * k, axis=1) * scale  # (H, T)
        logits = logits * ks_ref[b]
        logits = logits + bias_ref[b]                       # (1, T) bcast
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        w = w * vs_ref[b]
        v = v_ref[b].astype(jnp.float32)                    # (H, Dh, T)
        out = jnp.sum(w[:, None, :] * v, axis=2)            # (H, Dh)
        o_ref[b] = out.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# int8 cache append: quantize + column write inside Pallas
# ---------------------------------------------------------------------------
#
# Writing the new token's K/V into the cache with XLA dynamic_update_slice
# costs a full plane copy per layer (~50 us each, measured via dus_probe) —
# XLA only makes cache writes free by fusing them into the attention
# consumer, which a Pallas custom call prevents. This kernel does the writes
# itself: the caches are passed in ANY memory space, aliased input->output,
# and only the single (B, H, Dh, 1) column at ``pos`` is DMA'd — the rest of
# the buffer is untouched (alias semantics).

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-tile width of the cache's sequence axis; the fused kernel writes back
# exactly one such tile per grid step (the one containing ``pos``)
_SEQ_TILE = 128


def _quantize_hd(x):
    """(H, Dh) f32 -> (int8-valued f32, (H, 1) scale), keepdims throughout
    (Mosaic rejects squeeze/expand relayouts outside fused broadcasts)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / INT8_QMAX
    q = jnp.clip(jnp.round(x / scale), -INT8_QMAX, INT8_QMAX)
    return q, scale


def _self_attn_append_kernel(scalar_ref, q_ref, knew_ref, vnew_ref,
                             k_ref, v_ref, ks_ref, vs_ref,
                             o_ref, kt_ref, vt_ref, kst_ref, vst_ref, *,
                             scale: float, bt: int, t: int):
    """Fused int8 decode self-attention + cache append.

    Per grid step (bt batch rows): quantize the new token's K/V, merge the
    new column into the _SEQ_TILE-wide lane tile containing ``pos`` (written
    back via the aliased tile outputs), and compute attention over cached
    positions < pos plus the fresh token analytically — numerically the
    quantize->store->dequant path of the XLA fallback.
    """
    pos = scalar_ref[1]
    base = (pos // _SEQ_TILE) * _SEQ_TILE
    for b in range(bt):
        qv = q_ref[b].astype(jnp.float32)                     # (H, Dh)
        kq, ksc = _quantize_hd(knew_ref[b].astype(jnp.float32))
        vq, vsc = _quantize_hd(vnew_ref[b].astype(jnp.float32))

        # merge new column into the pos tile (stale elsewhere is preserved)
        h_, dh_ = qv.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (h_, dh_, _SEQ_TILE), 2) + base
        ktile = k_ref[0, b, :, :, pl.ds(base, _SEQ_TILE)].astype(jnp.float32)
        vtile = v_ref[0, b, :, :, pl.ds(base, _SEQ_TILE)].astype(jnp.float32)
        kt_ref[0, b] = jnp.where(lane == pos, kq[:, :, None], ktile).astype(jnp.int8)
        vt_ref[0, b] = jnp.where(lane == pos, vq[:, :, None], vtile).astype(jnp.int8)
        slane = jax.lax.broadcasted_iota(jnp.int32, (h_, _SEQ_TILE), 1) + base
        kstile = ks_ref[0, b, :, pl.ds(base, _SEQ_TILE)]
        vstile = vs_ref[0, b, :, pl.ds(base, _SEQ_TILE)]
        kst_ref[0, b] = jnp.where(slane == pos, ksc, kstile)
        vst_ref[0, b] = jnp.where(slane == pos, vsc, vstile)

        # attention over cached < pos, fresh token analytic (quantize+dequant
        # to match the fallback's cache round trip bit for bit)
        k = k_ref[0, b].astype(jnp.float32)                   # (H, Dh, T)
        logits = jnp.sum(qv[:, :, None] * k, axis=1) * scale  # (H, T)
        logits = logits * ks_ref[0, b]
        tlane = jax.lax.broadcasted_iota(jnp.int32, (h_, t), 1)
        logits = jnp.where(tlane < pos, logits, -jnp.inf)
        lc = jnp.sum(qv * (kq * ksc), axis=-1, keepdims=True) * scale  # (H, 1)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), lc)
        w = jnp.exp(logits - m)                               # (H, T)
        wc = jnp.exp(lc - m)                                  # (H, 1)
        denom = jnp.sum(w, axis=-1, keepdims=True) + wc
        w = w * vs_ref[0, b]
        v = v_ref[0, b].astype(jnp.float32)                   # (H, Dh, T)
        out = jnp.sum(w[:, None, :] * v, axis=2)              # (H, Dh)
        out = (out + wc * (vq * vsc)) / denom
        o_ref[b] = out.astype(o_ref.dtype)


def self_attention_append_int8(q, k_new, v_new, k_cache, v_cache,
                               k_scale, v_scale, layer: int, pos,
                               compute_dtype=jnp.bfloat16):
    """Fused decode self-attention + int8 cache append for one layer.

    q/k_new/v_new: (B, H, Dh); k_cache/v_cache: (L, B, H, Dh, T) int8;
    k_scale/v_scale: (L, B, H, T) f32. Returns
    (attn (B, H, Dh), k_cache', v_cache', k_scale', v_scale') with the new
    token's column written in place (aliased buffers; only the lane tile
    containing ``pos`` is written back). Replaces the XLA
    dynamic_update_slice cache writes, which cost a full plane copy per
    layer per step.
    """
    L, b, h, dh, t = k_cache.shape
    sm_scale = 1.0 / math.sqrt(dh)
    bt = _row_tile(b, h, dh, t, 1)
    scalars = jnp.stack([jnp.int32(layer), jnp.int32(pos)])

    def cache_in(i, s):
        return (s[0], i, 0, 0, 0)

    def tile_out(i, s):
        return (s[0], i, 0, 0, s[1] // _SEQ_TILE)

    def scale_in(i, s):
        return (s[0], i, 0, 0)

    def scale_tile_out(i, s):
        return (s[0], i, 0, s[1] // _SEQ_TILE)

    small = pl.BlockSpec((bt, h, dh), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt,),
        in_specs=[
            small, small, small,
            pl.BlockSpec((1, bt, h, dh, t), cache_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h, dh, t), cache_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h, t), scale_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h, t), scale_in, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            small,
            pl.BlockSpec((1, bt, h, dh, _SEQ_TILE), tile_out,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h, dh, _SEQ_TILE), tile_out,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h, _SEQ_TILE), scale_tile_out,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h, _SEQ_TILE), scale_tile_out,
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_self_attn_append_kernel, scale=sm_scale, bt=bt, t=t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, dh), compute_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
    )(scalars, q, k_new, v_new, k_cache, v_cache,
      k_scale.astype(jnp.float32), v_scale.astype(jnp.float32))


def _kernel_int8_stacked(scalar_ref, q_ref, k_ref, v_ref, bias_ref,
                         ks_ref, vs_ref, o_ref, *, scale: float, bt: int):
    """Same math as :func:`_kernel_int8`; the layer axis is selected by the
    BlockSpec index maps from the scalar-prefetched layer id, so one compiled
    kernel serves all layers and XLA never materializes per-layer slices."""
    del scalar_ref
    for b in range(bt):
        q = q_ref[b].astype(jnp.float32)                       # (H, Dh)
        k = k_ref[0, b].astype(jnp.float32)                    # (H, Dh, T)
        logits = jnp.sum(q[:, :, None] * k, axis=1) * scale    # (H, T)
        logits = logits * ks_ref[0, b]
        logits = logits + bias_ref[b]
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        w = w * vs_ref[0, b]
        v = v_ref[0, b].astype(jnp.float32)
        out = jnp.sum(w[:, None, :] * v, axis=2)               # (H, Dh)
        o_ref[b] = out.astype(o_ref.dtype)


def decode_attention_stacked(q, kT, vT, layer: int, bias,
                             compute_dtype=jnp.bfloat16,
                             k_scale=None, v_scale=None):
    """Single-token attention against layer ``layer`` of stacked caches.

    q: (B, H, Dh); kT/vT: (L, B, H, Dh, T); k_scale/v_scale: (L, B, H, T)
    (int8 mode). Passing the stacked cache with the layer chosen inside the
    kernel's index maps avoids the per-step XLA slice of the full cache for
    the custom-call operand (measured ~0.5 ms/step each for the stacked
    memory K and V at GRPO/bench shapes).
    """
    _, b, h, dh, t = kT.shape
    sm_scale = 1.0 / math.sqrt(dh)
    if bias is None:
        bias = jnp.zeros((b, 1, t), dtype=jnp.float32)
    else:
        bias = bias.reshape(b, 1, t).astype(jnp.float32)
    bt = _row_tile(b, h, dh, t, kT.dtype.itemsize)
    scalars = jnp.asarray([layer], jnp.int32)

    kv_spec = pl.BlockSpec((1, bt, h, dh, t), lambda i, s: (s[0], i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    qo_spec = pl.BlockSpec((bt, h, dh), lambda i, s: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((bt, 1, t), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, bt, h, t), lambda i, s: (s[0], i, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt,),
        in_specs=[qo_spec, kv_spec, kv_spec, bias_spec, scale_spec, scale_spec],
        out_specs=qo_spec,
    )
    return pl.pallas_call(
        functools.partial(_kernel_int8_stacked, scale=sm_scale, bt=bt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), compute_dtype),
    )(scalars, q, kT, vT, bias, k_scale.astype(jnp.float32),
      v_scale.astype(jnp.float32))


def decode_attention(q: jnp.ndarray, kT: jnp.ndarray, vT: jnp.ndarray,
                     bias: jnp.ndarray | None,
                     compute_dtype=jnp.bfloat16,
                     k_scale: jnp.ndarray | None = None,
                     v_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """q (B, H, Dh), kT/vT (B, H, Dh, T), bias (B, T) or None -> (B, H, Dh).

    With int8 kT/vT, pass k_scale/v_scale (B, H, T) dequantization planes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, dh = q.shape
    t = kT.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    if bias is None:
        bias = jnp.zeros((b, 1, t), dtype=jnp.float32)
    else:
        bias = bias.reshape(b, 1, t).astype(jnp.float32)

    kv_spec = pl.BlockSpec((1, h, dh, t), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    qo_spec = pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    if k_scale is not None:
        bt = _row_tile(b, h, dh, t, 1)
        kv_spec = pl.BlockSpec((bt, h, dh, t), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        qo_spec = pl.BlockSpec((bt, h, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec((bt, 1, t), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        scale_spec = pl.BlockSpec((bt, h, t), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel_int8, scale=scale, bt=bt, h=h, dh=dh, t=t),
            out_shape=jax.ShapeDtypeStruct((b, h, dh), compute_dtype),
            grid=(b // bt,),
            in_specs=[qo_spec, kv_spec, kv_spec, bias_spec, scale_spec, scale_spec],
            out_specs=qo_spec,
        )(q, kT, vT, bias, k_scale.astype(jnp.float32), v_scale.astype(jnp.float32))

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, h=h, dh=dh, t=t),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), compute_dtype),
        grid=(b,),
        in_specs=[qo_spec, kv_spec, kv_spec, bias_spec],
        out_specs=qo_spec,
    )(q, kT, vT, bias)
