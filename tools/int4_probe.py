"""Mosaic int4 mechanics probe (W4A8 groundwork, VERDICT r4 #1).

Settles, on the real chip, which int4 weight-delivery scheme the monolith's
W4A8 arm should use. Variants (each a tiny standalone pallas kernel doing
``x_lo @ W_lo + x_hi @ W_hi`` with int8 activations):

  s4dot    — native jnp.int4 VMEM operand, dot directly (int8 accum path)
  s4conv   — jnp.int4 operand, convert to int8 in-kernel, then dot
  i8shift  — (IN/2, OUT) int8 packed bytes (hi<<4 | lo+8), unpack with int8
             arithmetic (>>4 and low-nibble reconstruct), then two dots
  f32unpack— same bytes, unpack via f32 floor-divide (the always-lowers
             fallback), then two dots

Each is checked exact against the XLA int reference first (tiny shape), then
timed at the flagship per-layer shape with a chained fori_loop (one
device->host pull; CLAUDE.md round-trip rules).

Usage: python tools/int4_probe.py [--legality-only] [--reps 100]
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


def pack_bytes(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """int4 values in [-8, 7] -> bytes (hi << 4) | (lo + 8). The +8 offset
    keeps the low nibble unsigned so the byte's arithmetic value is
    16*hi + (lo + 8); the -8 correction folds into a row-sum term."""
    lou = (lo.astype(np.int32) + 8) & 0xF
    return ((hi.astype(np.int32) << 4) | lou).astype(np.int8)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _k_s4dot(x_ref, w_ref, o_ref):
    # native s4 dot: Mosaic may or may not lower this
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _k_s4conv(x_ref, w_ref, o_ref):
    w8 = w_ref[...].astype(jnp.int8)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _k_i8shift(x_ref, wp_ref, o_ref):
    b = wp_ref[...]                                    # (IN/2, OUT) int8
    hi = jax.lax.shift_right_arithmetic(b, jnp.int8(4))
    lou = b - jax.lax.shift_left(hi, jnp.int8(4))      # unsigned low nibble
    lo = lou - jnp.int8(8)
    half = b.shape[0]
    x = x_ref[...]
    acc = jax.lax.dot_general(x[:, :half], lo, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(x[:, half:], hi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o_ref[...] = acc


def _k_f32unpack(x_ref, wp_ref, o_ref):
    b = wp_ref[...].astype(jnp.float32)                # (IN/2, OUT)
    # byte value = 16*hi + lou with lou in [0,15]; signed byte in [-128,127]
    hi = jnp.floor(b / 16.0)
    lo = (b - 16.0 * hi) - 8.0
    half = wp_ref.shape[0]
    x = x_ref[...]
    acc = jax.lax.dot_general(x[:, :half], lo.astype(jnp.int8),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(x[:, half:], hi.astype(jnp.int8),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o_ref[...] = acc


def run_variant(name, bt, cin, cout, interpret=False):
    rng = np.random.default_rng(0)
    lo = rng.integers(-8, 8, (cin // 2, cout), np.int32)
    hi = rng.integers(-8, 8, (cin // 2, cout), np.int32)
    x = rng.integers(-127, 128, (bt, cin), np.int32)
    w_full = np.concatenate([lo, hi], 0)               # rows 0..IN/2 = lo
    want = x.astype(np.int64) @ w_full.astype(np.int64)

    x8 = jnp.asarray(x, jnp.int8)
    if name in ("s4dot", "s4conv"):
        w_in = jnp.asarray(w_full, jnp.int4)
        kern = _k_s4dot if name == "s4dot" else _k_s4conv
    else:
        w_in = jnp.asarray(pack_bytes(lo, hi))
        kern = _k_i8shift if name == "i8shift" else _k_f32unpack

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bt, cout), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x8, w_in)
    ok = np.array_equal(np.asarray(out, np.int64), want)
    return ok


def _k_i8ref(x_ref, w_ref, o_ref):
    # W8A8-style baseline: one full-width int8 dot (the per-matrix compute
    # the monolith's _qdot issues today, minus the activation-quant pass)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def time_variant(name, bt, cin, cout, reps):
    """Chained timing: reps iterations inside one jit, one host pull."""
    rng = np.random.default_rng(0)
    lo = rng.integers(-8, 8, (cin // 2, cout), np.int32)
    hi = rng.integers(-8, 8, (cin // 2, cout), np.int32)
    w_full = np.concatenate([lo, hi], 0)

    if name in ("s4dot", "s4conv"):
        w_in = jnp.asarray(w_full, jnp.int4)
        kern = _k_s4dot if name == "s4dot" else _k_s4conv
    elif name == "i8ref":
        w_in = jnp.asarray(w_full, jnp.int8)
        kern = _k_i8ref
    else:
        w_in = jnp.asarray(pack_bytes(lo, hi))
        kern = _k_i8shift if name == "i8shift" else _k_f32unpack

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bt, cout), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )

    @jax.jit
    def chain(x0):
        def body(_, x):
            y = call(x, w_in)
            # fold output back into int8 input so iterations chain (no LICM);
            # OUT >= IN at these shapes, slice the first IN lanes
            return (y[:, :cin] & 0x7F).astype(jnp.int8) - x
        return jax.lax.fori_loop(0, reps, body, x0)

    x0 = jnp.asarray(rng.integers(-127, 128, (bt, cin), np.int32), jnp.int8)
    _ = float(jnp.sum(chain(x0).astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    _ = float(jnp.sum(chain(x0).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legality-only", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--variants", default="s4dot,s4conv,i8shift,f32unpack")
    args = ap.parse_args()

    variants = args.variants.split(",")
    print(f"backend: {jax.default_backend()}", flush=True)
    for name in variants:
        try:
            ok = run_variant(name, 8, 256, 512, interpret=args.interpret)
            print(f"[legality] {name:10s}: {'EXACT' if ok else 'WRONG'}",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"[legality] {name:10s}: FAIL {msg}", flush=True)
            continue
        if args.legality_only or not ok:
            continue
        try:
            # flagship-ish per-layer matrix (ff1: 1024 -> 4096), bt=8 rows
            dt = time_variant(name, 8, 1024, 4096, args.reps)
            print(f"[timing]   {name:10s}: {dt * 1e6:8.1f} us/iter "
                  f"(bt=8, 1024x4096)", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"[timing]   {name:10s}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
