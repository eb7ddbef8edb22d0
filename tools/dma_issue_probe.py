"""Quantify per-DMA-issue overhead in a monolith-shaped kernel.

The int8 monolith step sits ~0.6 ms above its measured-achieved-bandwidth
floor (cache-length scaling puts the streams themselves at ~810 GB/s ~= HBM
peak; tools/monolith_step_bench.py cache 128/256/512 = 1.466/1.568/1.838 ms).
Candidate residual: per-grid-step fixed costs — DMA issue + semaphore wait
instructions (8 copies x 48 grid steps = 384 issues/step) and scalar index
math. This probe streams the SAME total bytes per grid step in F fragments
(F = 1..16) through an S-slot rotation with no compute, mimicking the
monolith's manual-CDMA schedule. d(ms)/d(F) isolates the per-issue cost;
the F -> 0 extrapolation gives the pure-bandwidth floor.

    python tools/dma_issue_probe.py [--steps 48] [--mb 21] [--slots 3]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import acai_omr_tpu  # noqa: F401  (compilation cache)

LANES = 1024


def _kernel(src_ref, out_ref, *bufs_and_sem, frags: int, steps: int,
            slots: int, rows: int):
    *bufs, sem = bufs_and_sem
    g = pl.program_id(0)
    slot = jax.lax.rem(g, slots)

    def copies(gi, s):
        return [pltpu.make_async_copy(
            src_ref.at[gi, pl.ds(f * rows, rows)], bufs[f].at[s],
            sem.at[f, s]) for f in range(frags)]

    @pl.when(g == 0)
    def _():
        for k in range(min(slots - 1, steps)):
            for c in copies(k, k):
                c.start()

    @pl.when(g + slots - 1 < steps)
    def _():
        nxt = g + slots - 1
        for c in copies(nxt, jax.lax.rem(nxt, slots)):
            c.start()

    for c in copies(g, slot):
        c.wait()

    @pl.when(g == steps - 1)
    def _():
        # touch one tile so nothing is DCE'd
        out_ref[...] = bufs[0][slot, :8, :128]


def build(frags: int, steps: int, slots: int, mb: float):
    total_rows = int(mb * 1024 * 1024) // (LANES * 2)
    total_rows = (total_rows // (frags * 8)) * (frags * 8)
    rows = total_rows // frags
    src = jnp.ones((steps, total_rows, LANES), jnp.bfloat16)

    kernel = functools.partial(_kernel, frags=frags, steps=steps,
                               slots=slots, rows=rows)
    scratch = [pltpu.VMEM((slots, rows, LANES), jnp.bfloat16)
               for _ in range(frags)]
    scratch.append(pltpu.SemaphoreType.DMA((frags, slots)))
    fn = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(119.5 * 1024 * 1024),
            dimension_semantics=("arbitrary",)),
    )
    return jax.jit(lambda s: fn(s)), src, total_rows * LANES * 2 * steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--mb", type=float, default=21.0,
                    help="bytes per grid step, MB (monolith int8 ~21)")
    ap.add_argument("--slots", type=int, default=3)
    ap.add_argument("--frags", type=int, nargs="*", default=[1, 2, 4, 8, 16])
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()

    for frags in args.frags:
        fn, src, nbytes = build(frags, args.steps, args.slots, args.mb)

        def run():
            x = src
            o = None
            for _ in range(args.reps):
                o = fn(x)
            return float(jnp.sum(o))  # ONE pull for the chain

        run()  # compile + warm
        best = min(_timed(run) for _ in range(3))
        ms = best / args.reps * 1e3
        bw = nbytes / (best / args.reps) / 1e9
        print(f"frags={frags:2d}  issues/step={frags * args.steps:4d}  "
              f"{ms:7.3f} ms  {bw:6.1f} GB/s")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
