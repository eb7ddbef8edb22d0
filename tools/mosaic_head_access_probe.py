"""Probe: per-head attention access patterns Mosaic accepts on v5e.

The fused training-layer kernel computes multi-head attention from a fused
(T, E) qkv block with H=16 heads of dh=64 lanes. Candidate in-kernel forms:
  1. static 64-lane slices  q[:, h*64:(h+1)*64]
  2. reshape (T, E) -> (T, H, dh) + batched dot 'thd,shd->hts'
  3. 3D batched dot_general on pre-shaped (H, T, dh) refs
Each is checked for lowering + numerics vs XLA.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, E, H = 256, 1024, 16
DH = E // H


def check(name, fn, *args, ref=None):
    try:
        out = fn(*args)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        print(f"{name}: OK  max_abs_err={err:.3e}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL  {str(e).splitlines()[0][:160]}")


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((T, E)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((T, E)), jnp.bfloat16)
    qh = np.asarray(q, np.float32).reshape(T, H, DH).transpose(1, 0, 2)
    kh = np.asarray(k, np.float32).reshape(T, H, DH).transpose(1, 0, 2)
    ref = jnp.einsum("htd,hsd->hts", jnp.asarray(qh), jnp.asarray(kh))

    # 1: static 64-lane slices, one dot per head, stacked on sublanes
    def k1(q_ref, k_ref, o_ref):
        for h in range(H):
            qs = q_ref[:, h * DH:(h + 1) * DH]
            ks = k_ref[:, h * DH:(h + 1) * DH]
            o_ref[h, :, :] = jax.lax.dot_general(
                qs, ks, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.float32)

    check("1 lane-slice per head", lambda a, b: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((H, T, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))(a, b), q, k, ref=ref)

    # 2: in-kernel reshape + batched dot
    def k2(q_ref, k_ref, o_ref):
        q3 = q_ref[...].reshape(T, H, DH)
        k3 = k_ref[...].reshape(T, H, DH)
        o_ref[...] = jax.lax.dot_general(
            q3, k3, ((((2,), (2,))), (((1,), (1,)))),
            preferred_element_type=jnp.float32).transpose(0, 1, 2)

    def run2(a, b):
        out = pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((H, T, T), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(a, b)
        return out

    check("2 reshape+batched dot", run2, q, k, ref=ref)

    # 3: pre-shaped (H, T, DH) inputs, batched dot_general
    qh_b = jnp.asarray(qh, jnp.bfloat16)
    kh_b = jnp.asarray(kh, jnp.bfloat16)

    def k3(q_ref, k_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            q_ref[...], k_ref[...], ((((2,), (2,))), (((0,), (0,)))),
            preferred_element_type=jnp.float32)

    check("3 pre-shaped batched dot", lambda a, b: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((H, T, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))(a, b), qh_b, kh_b, ref=ref)


if __name__ == "__main__":
    main()
