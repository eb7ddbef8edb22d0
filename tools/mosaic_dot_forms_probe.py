"""Probe: which dot_general dimension-number forms Mosaic lowers on v5e.

The fused training-layer kernel's backward needs all three GEMM forms:
  * A @ B        — contract (1,0)  (forward)
  * A @ B^T      — contract (1,1)  (dx = g W^T, attention logits)
  * A^T @ B      — contract (0,0)  (dW = x^T g, dK = S^T q)
This probes each form in a minimal kernel on the real device and checks
numerics vs XLA.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(dims):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (dims, ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


def run(form, dims, a_shape, b_shape, out_shape):
    a = jnp.asarray(np.random.default_rng(0).standard_normal(a_shape),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(b_shape),
                    jnp.bfloat16)
    try:
        out = pl.pallas_call(
            make_kernel(dims),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)
        ref = jax.lax.dot_general(a, b, (dims, ((), ())),
                                  preferred_element_type=jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{form}: OK  max_abs_err={err:.3e}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"{form}: FAIL  {msg}")


if __name__ == "__main__":
    m, k, n = 256, 1024, 512
    run("A@B   ((1,),(0,))", (((1,), (0,))), (m, k), (k, n), (m, n))
    run("A@B^T ((1,),(1,))", (((1,), (1,))), (m, k), (n, k), (m, n))
    run("A^T@B ((0,),(0,))", (((0,), (0,))), (k, m), (k, n), (m, n))
    # the attention-backward shape: dK = S^T q over T=256 rows
    run("S^T@q ((0,),(0,)) T-contract", (((0,), (0,))), (256, 256), (256, 64),
        (256, 64))
