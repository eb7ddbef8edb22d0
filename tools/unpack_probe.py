"""Mosaic int4-unpack scheme shootout (W4A8 cost attribution, round 5).

The W4A8 monolith measured its entire +1.58 ms/step regression in the
nibble unpack (tools/monolith_step_bench.py --ablate w4unpack): the
int8->f32 cast of the packed bytes and the f32->int8 store are layout
changes ((32,128) <-> (8,128) tiling). This probe times candidate unpack
schemes on one flagship-layer-sized packed block, checking exactness
against the f32 reference:

  f32      — current: astype(f32), floor-div, astype(i8) back
  i32      — astype(i32), i32 shifts/mask math, astype(i8)
  i16      — astype(i16), i16 shift math, astype(i8)
  i8div    — jnp.floor_divide on int8 directly (no conversions at all)
  i8mul    — int8 multiply/add reconstruction: hi from floor_divide, lo
             from b - 16*hi (tests whether i8 mul/sub lower natively)
  eyedot   — MXU identity-dot converts packed i8 -> i32 (relayout rides
             the MXU), f32 math, store i8

Each kernel reads a packed (IN/2, OUT) int8 block and writes the unpacked
(IN, OUT) int8 (lo rows then hi rows). Timed with an in-kernel fori_loop
(feedback via += of a 1-element perturbation to prevent folding).

Usage: python tools/unpack_probe.py [--reps 50]
"""

from __future__ import annotations

import argparse
import functools
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
HALF, OUT = 512, 4096  # ff1-sized: the largest per-matrix block


def pack(lo, hi):
    return ((hi.astype(np.int32) << 4) | ((lo.astype(np.int32) + 8) & 0xF)) \
        .astype(np.int8)


def _store(o_ref, lo, hi):
    o_ref[0:HALF] = lo
    o_ref[HALF:] = hi


def _k_f32(w_ref, o_ref, *, reps):
    def body(i, carry):
        b = (w_ref[...] + carry).astype(jnp.float32)
        hi = jnp.floor(b * (1.0 / 16.0))
        lo = b - 16.0 * hi - 8.0
        _store(o_ref, lo.astype(jnp.int8), hi.astype(jnp.int8))
        return (o_ref[0, 0] & 0).astype(jnp.int8)
    jax.lax.fori_loop(0, reps, body, jnp.int8(0))


def _k_i32(w_ref, o_ref, *, reps):
    def body(i, carry):
        b = (w_ref[...] + carry).astype(jnp.int32)
        hi = jax.lax.shift_right_arithmetic(b, 4)
        lo = (b - jax.lax.shift_left(hi, 4)) - 8
        _store(o_ref, lo.astype(jnp.int8), hi.astype(jnp.int8))
        return (o_ref[0, 0] & 0).astype(jnp.int8)
    jax.lax.fori_loop(0, reps, body, jnp.int8(0))


def _k_i16(w_ref, o_ref, *, reps):
    def body(i, carry):
        b = (w_ref[...] + carry).astype(jnp.int16)
        hi = jax.lax.shift_right_arithmetic(b, jnp.int16(4))
        lo = (b - jax.lax.shift_left(hi, jnp.int16(4))) - jnp.int16(8)
        _store(o_ref, lo.astype(jnp.int8), hi.astype(jnp.int8))
        return (o_ref[0, 0] & 0).astype(jnp.int8)
    jax.lax.fori_loop(0, reps, body, jnp.int8(0))


def _k_i8div(w_ref, o_ref, *, reps):
    def body(i, carry):
        b = w_ref[...] + carry
        hi = jnp.floor_divide(b, jnp.int8(16))
        lo = (b - jnp.int8(16) * hi) - jnp.int8(8)
        _store(o_ref, lo, hi)
        return (o_ref[0, 0] & 0).astype(jnp.int8)
    jax.lax.fori_loop(0, reps, body, jnp.int8(0))


def _k_eyedot(w_ref, eye_ref, o_ref, *, reps):
    def body(i, carry):
        b = jax.lax.dot_general(
            eye_ref[...], w_ref[...] + carry, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        hi = jnp.floor(b * (1.0 / 16.0))
        lo = b - 16.0 * hi - 8.0
        _store(o_ref, lo.astype(jnp.int8), hi.astype(jnp.int8))
        return (o_ref[0, 0] & 0).astype(jnp.int8)
    jax.lax.fori_loop(0, reps, body, jnp.int8(0))


KERNELS = {"f32": _k_f32, "i32": _k_i32, "i16": _k_i16, "i8div": _k_i8div,
           "eyedot": _k_eyedot}


def run(name, reps):
    rng = np.random.default_rng(0)
    lo = rng.integers(-8, 8, (HALF, OUT), np.int32)
    hi = rng.integers(-8, 8, (HALF, OUT), np.int32)
    wp = jnp.asarray(pack(lo, hi))
    want = np.concatenate([lo, hi], 0).astype(np.int8)

    args = [wp]
    if name == "eyedot":
        args.append(jnp.asarray(np.eye(HALF, dtype=np.int8)))

    def make(n):
        return pl.pallas_call(
            functools.partial(KERNELS[name], reps=n),
            out_shape=jax.ShapeDtypeStruct((2 * HALF, OUT), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )

    out = np.asarray(jax.jit(make(1))(*args))
    ok = np.array_equal(out, want)
    if not ok:
        return f"WRONG (diff {np.abs(out.astype(int) - want.astype(int)).max()})"

    def timed(n):
        call = jax.jit(make(n))
        float(jnp.sum(call(*args).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(call(*args).astype(jnp.float32)))
        return time.perf_counter() - t0

    dt = (timed(2 * reps) - timed(reps)) / reps
    gbps = (HALF * OUT) / dt / 1e9
    return f"EXACT  {dt * 1e6:8.1f} us/unpack ({gbps:6.1f} GB/s packed)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--variants", default="f32,i32,i16,i8div,eyedot")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  block: ({HALF}x{OUT}) packed",
          flush=True)
    for name in args.variants.split(","):
        try:
            print(f"[{name:7s}] {run(name, args.reps)}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")
            key = msg
            for marker in ("Mosaic", "Unsupported", "unsupported", "error:"):
                if marker in msg:
                    key = msg[msg.index(marker):][:200]
                    break
            print(f"[{name:7s}] FAIL {key[:220]}", flush=True)


if __name__ == "__main__":
    main()
