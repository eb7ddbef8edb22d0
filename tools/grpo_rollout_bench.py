"""GRPO rollout-decode benchmark: grouped vs replicated cross-attention memory.

The rollout pass samples group_size rollouts per image through the KV-cached
decoder (reference: GRPOViTOMR.cached_forward_rollout_policy,
models.py:988-1049, after expand_img_latent_for_rollout replicates each
image's latent G times, models.py:883-891). With the replicated layout every
decode step streams G identical copies of each layer's cross K/V
(~6.4 GB/step at reference scale: 128 rollouts x 1024-patch memories x 12
layers, bf16); grouped memory (decode mem_group) streams each unique image's
K/V once per group (~0.8 GB/step) and projects it once instead of G times.

Workload: reference scale (16 images x group 8 = 128 rollouts), eos disabled
so every rollout runs the full max_actions — deterministic, worst-case.

Usage: python tools/grpo_rollout_bench.py [--t 512] [--mem 1024]
       [--images 16] [--group 8] [--reps 3] [--expanded]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.models import decode as decode_lib
from acai_omr_tpu.models.omr_decoder import DecoderConfig, init_decoder_params


def run(params, cfg, latent, valid, g, t, rng, cache_dtype=jnp.bfloat16):
    seqs, lps, mask = decode_lib.generate(
        params, cfg, latent, valid, max_len=t, mem_group=g,
        sampling=decode_lib.SamplingConfig(top_k=50, temperature=1.1),
        rng=rng, compute_dtype=jnp.bfloat16, cache_dtype=cache_dtype)
    jax.block_until_ready(seqs)
    return seqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=512, help="max_actions")
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--mem", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--expanded", action="store_true",
                    help="replicated-memory baseline (pre-grouped layout)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 KV caches (grouped int8 shares the memory "
                         "block AND halves the self-cache stream)")
    args = ap.parse_args()

    bu, g, t, mlen = args.images, args.group, args.t, args.mem
    # eos_idx=-1 -> no early exit (deterministic worst case)
    cfg = DecoderConfig(max_lmx_seq_len=max(t, 256), eos_idx=-1)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng_np = np.random.default_rng(0)
    latent = jnp.asarray(rng_np.standard_normal((bu, mlen, cfg.hidden_dim)),
                         jnp.bfloat16)
    valid = jnp.ones((bu, mlen), bool)

    if args.expanded:
        latent = jnp.repeat(latent, g, axis=0)
        valid = jnp.repeat(valid, g, axis=0)
        g_arg = 1
    else:
        g_arg = g

    cache_dtype = jnp.int8 if args.int8 else jnp.bfloat16
    rollouts = bu * g
    run(params, cfg, latent, valid, g_arg, t, jax.random.PRNGKey(1),
        cache_dtype)  # compile
    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        run(params, cfg, latent, valid, g_arg, t, jax.random.PRNGKey(2 + i),
            cache_dtype)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"mode={'expanded' if args.expanded else 'grouped'}"
          f"{'+int8' if args.int8 else ''} "
          f"images={bu} group={g} rollouts={rollouts} actions={t} mem={mlen}")
    print(f"wall={best:.3f}s  rollouts/s={rollouts / best:.2f}  "
          f"tok/s={rollouts * (t - 1) / best:.0f}  (reps: "
          + ", ".join(f"{x:.3f}" for x in times) + ")")


if __name__ == "__main__":
    main()
