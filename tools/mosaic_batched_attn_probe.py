"""Probe: Mosaic constructs needed by the batched-attention monolith rewrite.

Validates on the real TPU (small shapes, fast compile):
  1. in-kernel reshape (bt, T, E) -> (bt*T, E) of a VMEM ref read (bf16+int8)
  2. dot_general((bt*T, E), (nl, E)) contracting lanes of both operands
  3. pltpu.repeat(x, bt, axis=0) tile-concat on (T, nl)
  4. eye-dot row->column vector conversion
  5. static sublane slices at b*T offsets + lane-mask extraction
  6. int8 round/astype + int8 x int8 dot with int32 accumulation

Each construct is exercised inside one kernel computing batched block-diagonal
attention logits; the result is checked against a numpy oracle.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, T, E, H = 8, 128, 1024, 16
DH = E // H
NL = BT * H


def kernel(k_ref, q_ref, out_ref, outc_ref, col_ref):
    # constants
    lane = jax.lax.broadcasted_iota(jnp.int32, (NL, E), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (NL, E), 0)
    sel_rep = ((lane // DH) == (row % H)).astype(jnp.float32)   # (NL, E)
    r_row = jax.lax.broadcasted_iota(jnp.int32, (NL, BT), 0)
    r_col = jax.lax.broadcasted_iota(jnp.int32, (NL, BT), 1)
    R = ((r_row // H) == r_col).astype(jnp.float32)             # (NL, BT)

    # 1. reshape collapse of a ref read
    k_stack = k_ref[:].reshape(BT * T, E)                       # (BT*T, E)

    # q broadcast via R-dot, per-head select via iota mask
    qd = jax.lax.dot_general(R, q_ref[:].astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    qd = (qd * sel_rep).astype(k_stack.dtype)                   # (NL, E)

    # 2. big block-diagonal logits dot, contracting lanes of both
    big = jax.lax.dot_general(k_stack, qd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # 5. extraction: compact (T, NL) from diagonal (b*T) blocks
    lane_nl = jax.lax.broadcasted_iota(jnp.int32, (T, NL), 1)
    compact = jnp.zeros((T, NL), jnp.float32)
    for b in range(BT):
        m = (lane_nl // H == b).astype(jnp.float32)
        compact = compact + big[b * T:(b + 1) * T, :] * m
    out_ref[:] = compact

    # 3. tile-concat expansion back to (BT*T, NL) and a reduction to check it
    sub_big = jax.lax.broadcasted_iota(jnp.int32, (BT * T, NL), 0)
    lane_big = jax.lax.broadcasted_iota(jnp.int32, (BT * T, NL), 1)
    wmask = ((sub_big // T) == (lane_big // H)).astype(jnp.float32)
    w_big = pltpu.repeat(compact, BT, axis=0) * wmask
    outc_ref[:] = jnp.sum(w_big, axis=0, keepdims=True)         # (1, NL)

    # 4. eye-dot row -> column
    eye = (jax.lax.broadcasted_iota(jnp.int32, (NL, NL), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (NL, NL), 1)
           ).astype(jnp.float32)
    col_ref[:] = jax.lax.dot_general(eye, outc_ref[:],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def run(dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        k = rng.integers(-127, 128, (BT, T, E)).astype(np.int8)
        q = rng.integers(-127, 128, (BT, E)).astype(np.float32)
    else:
        k = rng.standard_normal((BT, T, E)).astype(np.float32)
        q = rng.standard_normal((BT, E)).astype(np.float32)

    def kern(k_ref, q_ref, out_ref, outc_ref, col_ref):
        if dtype == jnp.int8:
            # 6. int8 x int8 dot with int32 accum, via int-valued f32 rounding
            lane = jax.lax.broadcasted_iota(jnp.int32, (NL, E), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (NL, E), 0)
            sel_rep = ((lane // DH) == (row % H)).astype(jnp.float32)
            r_row = jax.lax.broadcasted_iota(jnp.int32, (NL, BT), 0)
            r_col = jax.lax.broadcasted_iota(jnp.int32, (NL, BT), 1)
            R = ((r_row // H) == r_col).astype(jnp.float32)
            k_stack = k_ref[:].reshape(BT * T, E)
            qd = jax.lax.dot_general(R, q_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            qd8 = jnp.round(qd * sel_rep).astype(jnp.int8)
            big = jax.lax.dot_general(k_stack, qd8, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            lane_nl = jax.lax.broadcasted_iota(jnp.int32, (T, NL), 1)
            compact = jnp.zeros((T, NL), jnp.int32)
            for b in range(BT):
                m = jnp.where(lane_nl // H == b, 1, 0)
                compact = compact + big[b * T:(b + 1) * T, :] * m
            out_ref[:] = compact.astype(jnp.float32)
            outc_ref[:] = jnp.sum(out_ref[:], axis=0, keepdims=True)
            eye = (jax.lax.broadcasted_iota(jnp.int32, (NL, NL), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (NL, NL), 1)
                   ).astype(jnp.float32)
            col_ref[:] = jax.lax.dot_general(eye, outc_ref[:],
                                             (((1,), (1,)), ((), ())),
                                             preferred_element_type=jnp.float32)
        else:
            kernel(k_ref, q_ref, out_ref, outc_ref, col_ref)

    out, outc, col = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((T, NL), jnp.float32),
                   jax.ShapeDtypeStruct((1, NL), jnp.float32),
                   jax.ShapeDtypeStruct((NL, 1), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(k, dtype), jnp.asarray(q))

    # numpy oracle
    kf = k.astype(np.float32)
    qf = q.astype(np.float32)
    want = np.zeros((T, NL), np.float32)
    for b in range(BT):
        for h in range(H):
            qsel = np.zeros(E, np.float32)
            qsel[h * DH:(h + 1) * DH] = np.round(qf[b, h * DH:(h + 1) * DH]) \
                if dtype == jnp.int8 else qf[b, h * DH:(h + 1) * DH]
            want[:, b * H + h] = kf[b] @ qsel
    got = np.asarray(out)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"{np.dtype(np.int8).name if dtype == jnp.int8 else 'f32'}: "
          f"compact rel err {err:.2e}")
    wantc = want.sum(axis=0, keepdims=True)
    errc = np.abs(np.asarray(outc) - wantc).max() / (np.abs(wantc).max() + 1e-9)
    print(f"  colsum rel err {errc:.2e}")
    errt = np.abs(np.asarray(col)[:, 0] - np.asarray(outc)[0, :]).max()
    print(f"  eye-dot transpose abs err {errt:.2e}")
    # f32 dots on TPU run at bf16 MXU precision by default -> ~3e-3
    tol = 1e-6 if dtype == jnp.int8 else 1e-2
    assert err < tol and errc < tol and errt == 0.0


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(jnp.float32)
    run(jnp.int8)
    print("all constructs OK")
