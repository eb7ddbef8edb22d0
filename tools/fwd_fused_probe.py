"""Time the fused decoder-stack FORWARD kernel alone vs the XLA scan stack.

Flagship stage-2 shapes, deterministic, chained timing with one pull.
Usage: python tools/fwd_fused_probe.py [--steps N] [--row-tile N]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.ops import nn, transformer
from acai_omr_tpu.ops import pallas_train_layer as ptl

B, T, M, E, H, F, L = 8, 256, 1024, 1024, 16, 4096, 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--row-tile", type=int, default=None)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    stacked = transformer.stack_init(transformer.decoder_layer_init, key, L,
                                     E, F)
    stacked = jax.tree.map(jnp.asarray, stacked)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, T, E), jnp.bfloat16)
    memory = jax.random.normal(ks[1], (B, M, E), jnp.bfloat16)
    lens_t = np.full(B, T); lens_t[1] = T - 17
    lens_m = np.full(B, M); lens_m[2] = M - 200
    self_valid = jnp.arange(T)[None, :] < jnp.asarray(lens_t)[:, None]
    mem_valid = jnp.arange(M)[None, :] < jnp.asarray(lens_m)[:, None]

    mkv = jax.jit(transformer.precompute_memory_kv)(stacked, memory)

    @jax.jit
    def f_ref(st, x_, mk):
        out = transformer.decoder_stack(
            st, x_, memory, nn.MaskSpec(key_valid=self_valid, causal=True),
            nn.MaskSpec(key_valid=mem_valid), H, 0.0, None, True,
            remat=None, mem_kv=mk)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def f_fused(st, x_, mk):
        out = ptl.decoder_stack_fused(st, x_, mk, self_valid, mem_valid, H,
                                      deterministic=True,
                                      row_tile=args.row_tile)
        return jnp.sum(out.astype(jnp.float32))

    def bench(fn, label):
        def run(n):
            tot = jnp.float32(0)
            for _ in range(n):
                tot += fn(stacked, x, mkv)
            return float(tot)

        t0 = time.perf_counter()
        v = run(2)
        print(f"{label} compile+2: {time.perf_counter() - t0:.1f}s val={v:.3f}",
              flush=True)
        t0 = time.perf_counter()
        run(args.steps)
        el = (time.perf_counter() - t0) / args.steps
        print(f"{label}: {el * 1e3:.2f} ms/fwd", flush=True)
        return el

    e_f = bench(f_fused, "fused fwd")
    e_r = bench(f_ref, "xla   fwd")
    print(f"fwd speedup: {e_r / e_f:.2f}x")


if __name__ == "__main__":
    main()
