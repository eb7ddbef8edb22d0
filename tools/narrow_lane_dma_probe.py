"""Probe: DMA efficiency of narrow-lane (16-lane) vs full-lane (128-lane)
blocks streamed from HBM through a Pallas grid.

Hypothesis: the int8 monolith's (T, H=16) fp32 scale-plane blocks stream at
~1/8 of peak HBM bandwidth (sub-128-lane transfers), explaining the int8
decode mode sitting at ~62% of its HBM floor while bf16 reaches ~87%.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLOCKS = 256
T = 512


def stream_sum(lanes: int, iters: int = 2048):
    """Sum N_BLOCKS of (T, lanes) f32 blocks via a 1-D pallas grid."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N_BLOCKS, T, lanes)), jnp.float32)

    def kernel(x_ref, c_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = c_ref[...]
        o_ref[...] += jnp.sum(x_ref[...], axis=(0, 1), keepdims=True)[0]

    f = pl.pallas_call(
        kernel,
        grid=(N_BLOCKS,),
        in_specs=[pl.BlockSpec((1, T, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.float32),
    )

    @jax.jit
    def many(x):
        acc = jnp.zeros((1, lanes), jnp.float32)
        def body(_, acc):
            # carry feeds the kernel so the call is not loop-invariant
            return f(x, acc)
        return jax.lax.fori_loop(0, iters, body, acc)

    # one real device->host pull at the end (block_until_ready does not
    # actually block through the axon tunnel; docs/PERF.md)
    float(jnp.sum(many(x)))
    t0 = time.perf_counter()
    float(jnp.sum(many(x)))
    el = time.perf_counter() - t0 - 0.029  # subtract the ~29 ms pull RTT
    real_bytes = N_BLOCKS * T * lanes * 4 * iters
    gbps = real_bytes / el / 1e9
    print(f"lanes={lanes:4d}: {gbps:7.1f} GB/s effective "
          f"({el*1e3:.1f} ms for {real_bytes/1e9:.2f} GB)")
    return gbps


if __name__ == "__main__":
    print("devices:", jax.devices())
    g128 = stream_sum(128)
    g16 = stream_sum(16)
    print(f"narrow/full efficiency: {g16/g128:.3f}")
