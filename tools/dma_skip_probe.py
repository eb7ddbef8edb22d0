"""Probe: does the Pallas TPU pipeline skip the fetch when an input's block
index equals the previous grid step's index *computed at runtime* from a
scalar-prefetch value?

If yes, a grid dimension over KV-cache chunks with a clamped index map
(min(chunk, pos // CHUNK)) gives decode *dynamic-length* cache reads — HBM
traffic proportional to the live sequence length — without manual DMA.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CHUNKS = 64
CH = 4096          # sublanes per chunk
E = 1024
# one chunk = 8 MB bf16; full array = 512 MB


def kernel(s_ref, x_ref, o_ref, acc):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(k <= s_ref[0])
    def _():
        acc[...] += jnp.sum(x_ref[0], axis=0, keepdims=True).astype(jnp.float32)

    @pl.when(k == N_CHUNKS - 1)
    def _():
        o_ref[...] = acc[...]


def run(clamp: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_CHUNKS,),
        in_specs=[pl.BlockSpec((1, CH, E),
                               lambda k, s: (jnp.minimum(k, s[0]), 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, E), lambda k, s: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, E), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
    )
    x = jnp.ones((N_CHUNKS, CH, E), jnp.bfloat16)
    s = jnp.asarray([clamp], jnp.int32)

    @jax.jit
    def many(x, s):
        def body(_, acc):
            return acc + f(s, x)
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((1, E), jnp.float32))

    r = many(x, s)
    float(jnp.sum(r))  # sync
    t0 = time.perf_counter()
    r = many(x, s)
    float(jnp.sum(r))
    el = (time.perf_counter() - t0) / 20
    bytes_full = N_CHUNKS * CH * E * 2
    print(f"clamp={clamp:3d}: {el * 1e3:7.3f} ms/call "
          f"(full-read floor ~{bytes_full / 819e9 * 1e3:.3f} ms, "
          f"clamped floor ~{(clamp + 1) * CH * E * 2 / 819e9 * 1e3:.3f} ms)")
    return el


if __name__ == "__main__":
    t_small = run(1)
    t_half = run(N_CHUNKS // 2 - 1)
    t_full = run(N_CHUNKS - 1)
    print(f"ratio full/small = {t_full / t_small:.2f} "
          f"(>> 1 means runtime same-index fetches are skipped)")
