"""Decode-loop profiler: per-op time breakdown of a compiled decode segment.

Promotes the workflow behind docs/PERF.md's tables: runs a 64-step decode
segment at bench shapes under ``jax.profiler``, parses the perfetto trace,
and prints the top ops with per-step costs. Usage:

    python tools/profile_decode.py bf16|int8 [--cache-len 512] [--batch 32]
"""

import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["bf16", "int8", "mono", "mono8"])
    ap.add_argument("--cache-len", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    import bench
    from acai_omr_tpu.models import decode as dlib

    cache_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8,
                   "mono": jnp.bfloat16, "mono8": jnp.int8}[args.mode]
    mono = args.mode in ("mono", "mono8")
    cfg, params, mem, mem_valid = bench.build()
    mem, mem_valid = mem[: args.batch], mem_valid[: args.batch]

    memkv = dlib.precompute_memory_kv(params, cfg, mem, mem_valid,
                                      jnp.bfloat16, cache_dtype,
                                      layout="te" if mono else "hd")
    group = None
    if mono and cache_dtype == jnp.int8:
        from acai_omr_tpu.ops import pallas_monolith
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
                                   monolith=mono, scale_group=group)

    def run():
        s = dlib.decode_segment(params, cfg, state, memkv, args.steps, None,
                                jnp.bfloat16)
        # real sync — block_until_ready lies through the axon tunnel
        return float(jnp.sum(s.seqs))

    run()  # compile
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    n = args.steps - 1
    print(f"{args.steps} steps: {wall * 1e3:.1f} ms -> "
          f"{wall / n * 1e3:.3f} ms/step "
          f"(B={args.batch}, cache {args.cache_len}, {args.mode})")

    outdir = tempfile.mkdtemp(prefix="acai_trace_")
    with jax.profiler.trace(outdir):
        run()

    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file produced", file=sys.stderr)
        return
    data = json.load(gzip.open(files[0]))
    agg = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            agg[e["name"]] += e["dur"]
    print(f"\ntop ops (total us over the segment; /{n} for per step):")
    for name, dur in agg.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {dur / n:7.1f} us/step  {name[:90]}")


if __name__ == "__main__":
    main()
