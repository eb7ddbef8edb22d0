"""Monolith decode-step attribution: time kernel stages by ablating them.

Runs the bench-shape decode segment with named kernel stages skipped
(``pallas_monolith.set_ablate`` — NUMERICALLY WRONG, timing only) and
reports each stage's cost as baseline minus ablated ms/step. Feeds the
"int8 at ~75% of its HBM floor" breakdown in docs/PERF.md: how much of
the residual is quantization VPU work (quantrows/qdotquant/packscale)
vs. everything else.

    python tools/monolith_step_bench.py int8 [--batch 32] [--cache-len 512]
    python tools/monolith_step_bench.py bf16 --ablate gelu
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def build_state(args, cache_dtype):
    import bench
    from acai_omr_tpu.models import decode as dlib
    from acai_omr_tpu.ops import pallas_monolith

    cfg, params, mem, mem_valid = bench.build()
    mem, mem_valid = mem[: args.batch], mem_valid[: args.batch]
    memkv = dlib.precompute_memory_kv(params, cfg, mem, mem_valid,
                                      jnp.bfloat16, cache_dtype, layout="te")
    group = None
    if cache_dtype == jnp.int8:
        group = pallas_monolith.scale_pack_group(
            args.batch, args.cache_len, mem.shape[1], cfg.hidden_dim,
            cfg.num_heads)
        memkv = memkv._replace(
            k_scale=pallas_monolith.pack_scales(
                memkv.k_scale.astype(jnp.bfloat16), group),
            v_scale=pallas_monolith.pack_scales(
                memkv.v_scale.astype(jnp.bfloat16), group))
    state = dlib.init_decode_state(cfg, args.batch, args.cache_len,
                                   args.cache_len, cache_dtype=cache_dtype,
                                   monolith=True, scale_group=group)
    return cfg, params, memkv, state


def time_config(params, cfg, state, memkv, steps, repeats):
    from acai_omr_tpu.models import decode as dlib

    def run():
        s = dlib.decode_segment(params, cfg, state, memkv, steps, None,
                                jnp.bfloat16)
        return float(jnp.sum(s.seqs))  # one real sync (tunnel-safe)

    run()  # compile
    best = min(_timed(run) for _ in range(repeats))
    return best / (steps - 1) * 1e3


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    from acai_omr_tpu.ops import pallas_monolith

    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["bf16", "int8"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cache-len", type=int, default=512)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--ablate", nargs="*", default=None,
                    help="stages to test (default: all quant stages for "
                         "int8, gelu for bf16), plus the combined set")
    args = ap.parse_args()

    cache_dtype = jnp.int8 if args.mode == "int8" else jnp.bfloat16
    stages = args.ablate
    if stages is None:
        stages = (["quantrows", "packscale", "qdotquant", "gelu"]
                  if args.mode == "int8" else ["gelu"])

    cfg, params, memkv, state = build_state(args, cache_dtype)

    pallas_monolith.set_ablate(())
    base = time_config(params, cfg, state, memkv, args.steps, args.repeats)
    print(f"baseline        {base:8.3f} ms/step  "
          f"(B={args.batch}, cache {args.cache_len}, {args.mode})")

    results = {}
    for name in stages:
        pallas_monolith.set_ablate({name})
        jax.clear_caches()
        ms = time_config(params, cfg, state, memkv, args.steps, args.repeats)
        results[name] = ms
        print(f"-{name:14s} {ms:8.3f} ms/step  "
              f"(stage cost {base - ms:+7.3f} ms, "
              f"{(base - ms) / base * 100:+5.1f}%)")

    if len(stages) > 1:
        pallas_monolith.set_ablate(set(stages))
        jax.clear_caches()
        ms = time_config(params, cfg, state, memkv, args.steps, args.repeats)
        print(f"-ALL            {ms:8.3f} ms/step  "
              f"(combined {base - ms:+7.3f} ms, "
              f"{(base - ms) / base * 100:+5.1f}%)")

    pallas_monolith.set_ablate(())
    jax.clear_caches()


if __name__ == "__main__":
    main()
