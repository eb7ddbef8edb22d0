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
# (both HBM-bound at the same streams) and is slower for int8 (per-head
# unrolled int8 dots don't amortize). Off by default; opt in via env or
# set_enabled() — the XLA fallback is numerically the reference path.
_ENABLED = os.environ.get("ACAI_PALLAS_DECODE", "0") == "1"


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas(q, kT) -> bool:
    if not (_ENABLED and _on_tpu()):
        return False
    if kT.dtype == jnp.int8:
        return False  # int8 path measured slower than XLA; keep fallback
    b, h, dh = q.shape
    t = kT.shape[-1]
    # lane/sublane-friendly shapes; VMEM budget ~ 2*H*Dh*T*2 + slack
    return (dh % 8 == 0 and t % 128 == 0 and h % 8 == 0
            and 2 * h * dh * t * 2 < 12 * 1024 * 1024)


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
                 scale: float, h: int, dh: int, t: int):
    """int8 variant: K/V are int8 in VMEM (half the HBM traffic), dequantized
    per head via the (H, T) scale planes after the dots."""
    bias = bias_ref[...].reshape(1, t)
    q_all = q_ref[...].reshape(h, dh).astype(jnp.float32)
    for head in range(h):
        q = q_all[head].reshape(1, dh)
        k = k_ref[0, head].astype(jnp.float32)            # (Dh, T) int8 -> f32
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = logits * ks_ref[0, head].reshape(1, t)
        logits = logits + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        w = w * vs_ref[0, head].reshape(1, t)
        v = v_ref[0, head].astype(jnp.float32)
        out = jax.lax.dot_general(
            w, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, head, :] = ((out / denom).reshape(dh)).astype(o_ref.dtype)


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
        scale_spec = pl.BlockSpec((1, h, t), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel_int8, scale=scale, h=h, dh=dh, t=t),
            out_shape=jax.ShapeDtypeStruct((b, h, dh), compute_dtype),
            grid=(b,),
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
