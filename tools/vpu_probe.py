"""v5e VPU throughput probe on VMEM-resident data (VERDICT r4 #3).

The training-floor model (tools/train_floor_model.py) left VPU work unpriced
because an XLA chained-LN probe measures HBM streaming, not VPU throughput
(each op round-trips HBM). This probe runs the elementwise workloads INSIDE
one Pallas kernel over a VMEM-resident block with a carried dependency, so
the measured rate is the VPU's on the backward's actual recompute shapes:

  softmax — rowmax, sub, exp, rowsum, divide over (rows, S) logits (the
            (T, S) attention-prob recompute in the fused backward,
            ops/pallas_train_layer.py)
  ln      — mean, center, var, rsqrt, scale+bias over (rows, E)
  gelu    — exact-form GELU via the A&S rational erf (the fused kernels'
            activation, ~12 elementwise ops incl. one exp)

Reports ns/element-pass and effective element-throughput per workload.
Method: two chained runs (N and 2N in-kernel iterations), rate from the
difference — kernel-entry/DMA fixed costs cancel. One host pull per run
(CLAUDE.md tunnel rules).

Usage: python tools/vpu_probe.py [--iters 2000]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = int(119.5 * 1024 * 1024)


# the kernels' own erf implementations — imported, not duplicated, so the
# probe prices exactly the arithmetic the kernels run (round-5 review)
from acai_omr_tpu.ops.pallas_monolith import (_erf_poly,  # noqa: E402
                                              _erf_rational as _erf)


def _work_softmax(x):
    m = jnp.max(x, axis=1, keepdims=True)
    w = jnp.exp(x - m)
    return w / jnp.sum(w, axis=1, keepdims=True)


def _work_ln(x):
    mean = jnp.mean(x, axis=1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    return c * jax.lax.rsqrt(var + 1e-5)


def _work_gelu(x):
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def _work_gelu_poly(x):
    return 0.5 * x * (1.0 + _erf_poly(x / math.sqrt(2.0)))


WORK = {"softmax": _work_softmax, "ln": _work_ln, "gelu": _work_gelu,
        "gelu_poly": _work_gelu_poly}


def _kernel(x_ref, o_ref, *, iters: int, work: str):
    def body(i, x):
        y = WORK[work](x)
        # feedback keeps the chain live and values bounded; the i-dependent
        # term prevents a fixed-point the compiler could in principle fold
        return y + x * 0.5 + (i & 1).astype(jnp.float32) * 1e-6
    o_ref[...] = jax.lax.fori_loop(0, iters, body, x_ref[...])


def run(work: str, rows: int, cols: int, iters: int) -> float:
    """Seconds per in-kernel iteration at (rows, cols), fixed cost removed."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, cols)) * 0.1, jnp.float32)

    def make(n):
        return pl.pallas_call(
            functools.partial(_kernel, iters=n, work=work),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )

    def timed(n):
        call = jax.jit(make(n))
        float(jnp.sum(call(x)))  # compile + warm
        t0 = time.perf_counter()
        float(jnp.sum(call(x)))
        return time.perf_counter() - t0

    t1, t2 = timed(iters), timed(2 * iters)
    return (t2 - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()

    shapes = {
        "softmax": [(256, 256), (256, 1024), (1024, 1024)],
        "ln": [(256, 1024), (1024, 768)],
        "gelu": [(256, 4096), (1024, 3072)],
        "gelu_poly": [(256, 4096), (1024, 3072)],
    }
    out = {"device": str(jax.devices()[0]), "iters": args.iters}
    for work, shps in shapes.items():
        for rows, cols in shps:
            dt = run(work, rows, cols, args.iters)
            elems = rows * cols
            key = f"{work}_{rows}x{cols}"
            out[key] = {
                "ns_per_iter": round(dt * 1e9, 1),
                "elems_per_s": round(elems / dt / 1e9, 2),  # Gelem/s
            }
            print(f"[{key}] {dt * 1e6:.2f} us/iter, "
                  f"{elems / dt / 1e9:.1f} Gelem/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
