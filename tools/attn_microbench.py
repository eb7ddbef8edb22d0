"""Microbenchmark of decode-attention kernel variants on the real chip.

Explores the design space for the fused decode-step attention kernel
(docs/PERF.md upgrade paths 1 and 3): XLA vs per-head-MXU Pallas vs
batched/block-diagonal formulations, bf16 vs int8 caches. Not part of the
test suite; run manually on TPU.
"""

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, H, DH, T = 32, 16, 64, 512
SCALE = 1.0 / math.sqrt(DH)


def timeit(fn, *args, reps=200):
    """Chain ``reps`` dependent calls inside one jit so per-call dispatch
    amortizes away (docs/PERF.md measurement discipline)."""

    @jax.jit
    def chained(q, *rest):
        def body(_, q):
            out = fn(q, *rest)
            # feed output back into q so iterations are data-dependent
            return (q + 1e-6 * out.astype(q.dtype)).astype(q.dtype)
        return jax.lax.fori_loop(0, reps, body, q)

    # NB: block_until_ready lies through the axon tunnel (CLAUDE.md); force a
    # real device->host sync by pulling a scalar.
    out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1e6  # us


def make_inputs(cache_dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, DH)), dtype=jnp.bfloat16)
    k = rng.standard_normal((B, H, DH, T))
    v = rng.standard_normal((B, H, DH, T))
    bias = jnp.zeros((B, T), jnp.float32)
    if cache_dtype == jnp.int8:
        ks = np.abs(k).max(axis=2) / 127.0
        vs = np.abs(v).max(axis=2) / 127.0
        kq = np.clip(np.round(k / ks[:, :, None, :]), -127, 127).astype(np.int8)
        vq = np.clip(np.round(v / vs[:, :, None, :]), -127, 127).astype(np.int8)
        return (q, jnp.asarray(kq), jnp.asarray(vq), bias,
                jnp.asarray(ks, jnp.float32), jnp.asarray(vs, jnp.float32))
    return (q, jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16),
            bias, None, None)


# --- reference XLA path ----------------------------------------------------

@jax.jit
def xla_attn(q, kT, vT, bias, ks, vs):
    logits = jnp.einsum("bhd,bhdt->bht", q.astype(jnp.bfloat16),
                        kT.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) * SCALE
    if ks is not None:
        logits = logits * ks
    logits = logits + bias[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    if vs is not None:
        w = w * vs
    out = jnp.einsum("bht,bhdt->bhd", w.astype(jnp.bfloat16),
                     vT.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.bfloat16)


# --- pallas variants ---------------------------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blockdiag_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, bt, int8,
                      ks_ref=None, vs_ref=None):
    """Bt rows per grid step; block-diagonal MXU formulation over all heads.

    k/v refs are (Bt, H, Dh, T) viewed as (Bt, H*Dh, T); q block-diag
    (H, H*Dh) x K2 (H*Dh, T) -> logits (H, T) in one dot per row.
    """
    e = H * DH
    for b in range(bt):
        q = q_ref[b].astype(jnp.float32).reshape(H, DH)          # (H, Dh)
        qrep = jnp.broadcast_to(q.reshape(H, 1, DH), (H, H, DH)).reshape(H, e)
        col_h = jax.lax.broadcasted_iota(jnp.int32, (H, e), 1) // DH
        row_h = jax.lax.broadcasted_iota(jnp.int32, (H, e), 0)
        qbd = jnp.where(col_h == row_h, qrep, 0.0)                # (H, H*Dh)
        k2 = k_ref[b].reshape(e, T)
        logits = jax.lax.dot_general(
            qbd.astype(jnp.bfloat16), k2.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE           # (H, T)
        if int8:
            logits = logits * ks_ref[b]
        logits = logits + bias_ref[b].reshape(1, T)
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        w = w / denom
        if int8:
            w = w * vs_ref[b]
        v2 = v_ref[b].reshape(e, T)
        # (H*Dh, T) x (T, H) -> (H*Dh, H); take block-diagonal columns
        mfull = jax.lax.dot_general(
            v2.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (E, H)
        rows_h = jax.lax.broadcasted_iota(jnp.int32, (e, H), 0) // DH
        cols = jax.lax.broadcasted_iota(jnp.int32, (e, H), 1)
        out = jnp.sum(jnp.where(rows_h == cols, mfull, 0.0), axis=1)  # (E,)
        o_ref[b] = out.reshape(H, DH).astype(o_ref.dtype)


def blockdiag_attn(q, kT, vT, bias, ks, vs, bt=4):
    int8 = kT.dtype == jnp.int8
    grid = (B // bt,)
    kv_spec = pl.BlockSpec((bt, H, DH, T), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    qo_spec = pl.BlockSpec((bt, H, DH), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((bt, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((bt, H, T), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    args = [q, kT, vT, bias.reshape(B, 1, T)]
    in_specs = [qo_spec, kv_spec, kv_spec, bias_spec]
    kw = {}
    if int8:
        args += [ks, vs]
        in_specs += [scale_spec, scale_spec]
        kernel = lambda q_, k_, v_, b_, ks_, vs_, o_: _blockdiag_kernel(
            q_, k_, v_, b_, o_, bt=bt, int8=True, ks_ref=ks_, vs_ref=vs_)
    else:
        kernel = lambda q_, k_, v_, b_, o_: _blockdiag_kernel(
            q_, k_, v_, b_, o_, bt=bt, int8=False)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, DH), jnp.bfloat16),
        grid=grid, in_specs=in_specs, out_specs=qo_spec)(*args)


def _batcheddot_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, bt):
    """Probe: does Mosaic lower batched dot_general now?"""
    q = q_ref[...].astype(jnp.bfloat16).reshape(bt * H, 1, DH)
    k = k_ref[...].astype(jnp.bfloat16).reshape(bt * H, DH, T)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * SCALE               # (BH, 1, T)
    logits = logits.reshape(bt, H, T) + bias_ref[...]
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    v = v_ref[...].astype(jnp.bfloat16).reshape(bt * H, DH, T)
    out = jax.lax.dot_general(
        w.astype(jnp.bfloat16).reshape(bt * H, 1, T), v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = out.reshape(bt, H, DH).astype(o_ref.dtype)


def batcheddot_attn(q, kT, vT, bias, ks, vs, bt=4):
    grid = (B // bt,)
    kv_spec = pl.BlockSpec((bt, H, DH, T), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    qo_spec = pl.BlockSpec((bt, H, DH), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((bt, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_batcheddot_kernel, bt=bt),
        out_shape=jax.ShapeDtypeStruct((B, H, DH), jnp.bfloat16),
        grid=grid, in_specs=[qo_spec, kv_spec, kv_spec, bias_spec],
        out_specs=qo_spec)(q, kT, vT, bias.reshape(B, 1, T))


def main():
    print("device:", jax.devices()[0])
    # correctness oracle in f32
    qb, kb, vb, bias, _, _ = make_inputs(jnp.bfloat16)
    ref = xla_attn(qb, kb, vb, bias, None, None)

    t = timeit(xla_attn, qb, kb, vb, bias, None, None)
    print(f"xla bf16:            {t:8.1f} us")

    qi, ki, vi, bias_i, ks, vs = make_inputs(jnp.int8)
    t = timeit(xla_attn, qi, ki, vi, bias_i, ks, vs)
    print(f"xla int8:            {t:8.1f} us")

    from acai_omr_tpu.ops import pallas_decode
    f = jax.jit(lambda *a: pallas_decode.decode_attention(*a))
    out = f(qb, kb, vb, bias)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    t = timeit(f, qb, kb, vb, bias)
    print(f"pallas perhead bf16: {t:8.1f} us  (maxerr {err:.2e})")

    fi = jax.jit(lambda q_, k_, v_, b_, ks_, vs_: pallas_decode.decode_attention(
        q_, k_, v_, b_, jnp.bfloat16, ks_, vs_))
    t = timeit(fi, qi, ki, vi, bias_i, ks, vs)
    print(f"pallas perhead int8: {t:8.1f} us")

    for bt in (2, 4, 8):
        try:
            f = jax.jit(functools.partial(blockdiag_attn, bt=bt))
            out = f(qb, kb, vb, bias, None, None)
            err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            t = timeit(f, qb, kb, vb, bias, None, None)
            print(f"blockdiag bf16 bt={bt}: {t:8.1f} us  (maxerr {err:.2e})")
        except Exception as exc:
            print(f"blockdiag bf16 bt={bt}: FAILED {type(exc).__name__}: {str(exc)[:200]}")

    for bt in (4, 8):
        try:
            f = jax.jit(functools.partial(blockdiag_attn, bt=bt))
            out = f(qi, ki, vi, bias_i, ks, vs)
            err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            t = timeit(f, qi, ki, vi, bias_i, ks, vs)
            print(f"blockdiag int8 bt={bt}: {t:8.1f} us  (maxerr-vs-bf16 {err:.2e})")
        except Exception as exc:
            print(f"blockdiag int8 bt={bt}: FAILED {type(exc).__name__}: {str(exc)[:200]}")

    try:
        f = jax.jit(functools.partial(batcheddot_attn, bt=4))
        out = f(qb, kb, vb, bias, None, None)
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        t = timeit(f, qb, kb, vb, bias, None, None)
        print(f"batcheddot bf16 bt=4: {t:7.1f} us  (maxerr {err:.2e})")
    except Exception as exc:
        print(f"batcheddot bf16: FAILED {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
