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

import jax
import jax.numpy as jnp

_ENABLED = True


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
    b, h, dh = q.shape
    t = kT.shape[-1]
    # lane/sublane-friendly shapes; VMEM budget ~ 2*H*Dh*T*2B + slack
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


def decode_attention(q: jnp.ndarray, kT: jnp.ndarray, vT: jnp.ndarray,
                     bias: jnp.ndarray | None,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """q (B, H, Dh), kT/vT (B, H, Dh, T), bias (B, T) or None -> (B, H, Dh)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, dh = q.shape
    t = kT.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    if bias is None:
        bias = jnp.zeros((b, 1, t), dtype=jnp.float32)
    else:
        bias = bias.reshape(b, 1, t).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, h=h, dh=dh, t=t),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), compute_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(q, kT, vT, bias)
    return out
