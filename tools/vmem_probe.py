"""Probe usable VMEM on the attached TPU: compile trivial Pallas kernels with
increasing VMEM scratch until compilation fails. Informs the monolithic
decode-kernel design (how many weight/cache blocks can stay resident)."""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(mb: int) -> bool:
    n = mb * 1024 * 1024 // (128 * 2)  # rows of (128,) bf16

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[...] = scratch[0:8, :] * 2.0

    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, 128), jnp.bfloat16)],
        )
        x = jnp.ones((8, 128), jnp.bfloat16)
        jax.block_until_ready(jax.jit(f)(x))
        return True
    except Exception as e:
        print(f"  {mb} MB failed: {str(e)[:200]}", file=sys.stderr)
        return False


if __name__ == "__main__":
    sizes = [int(s) for s in (sys.argv[1:] or ["16", "32", "64", "96", "110", "120"])]
    for mb in sizes:
        ok = probe(mb)
        print(f"VMEM scratch {mb} MB: {'OK' if ok else 'FAIL'}")
        if not ok:
            break
