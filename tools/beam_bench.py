"""Beam-search decode throughput: bf16 vs int8 monolith beams.

Measures `decode.beam_generate` at serving shapes (B images x beam K,
256-token systems, 512-patch memories) for bf16 lane-packed monolith beams
and the int8 composition (lane-packed SELF planes reordered by
unpack->gather->repack, MEMORY planes in the grouped shared narrow layout).
Chained reps, one device sync per variant (docs/PERF.md "round trip").

Usage: python tools/beam_bench.py [--batch 8] [--beam 4] [--len 256]
       [--mem 512] [--reps 3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--len", type=int, default=256, dest="max_len")
    ap.add_argument("--mem", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.models import decode as decode_lib
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.train.omr_teacher_force_train import set_up_vitomr

    tok = LmxTokenizer(str(Path(__file__).parent.parent / "lmx_vocab.txt"))
    cfg = set_up_vitomr(tok)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.standard_normal(
        (args.batch, args.mem, cfg.decoder.hidden_dim)), dtype=jnp.bfloat16)
    mem_valid = jnp.ones((args.batch, args.mem), dtype=bool)

    def run(cache_dtype):
        s = decode_lib.beam_generate(
            params["decoder"], cfg.decoder, mem, mem_valid,
            beam_size=args.beam, max_len=args.max_len,
            compute_dtype=jnp.bfloat16, cache_dtype=cache_dtype)
        jax.block_until_ready(s[0])

    for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        run(dt)  # compile warm-up
        t0 = time.perf_counter()
        for _ in range(args.reps):
            run(dt)
        dtv = (time.perf_counter() - t0) / args.reps
        print(f"beam-{args.beam} {name}: {args.batch / dtv:.2f} systems/s "
              f"({dtv:.3f} s / {args.batch} systems, {args.max_len} tok, "
              f"mem {args.mem})")


if __name__ == "__main__":
    main()
