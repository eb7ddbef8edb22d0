"""End-to-end GRPO inner-update benchmark at reference scale.

One `make_grpo_update_step` call = rollout-microbatched grad accumulation +
CE anchor + optimizer apply (reference: omr_grpo_train.py:345-370, 2 update
epochs per outer step run this twice). Reference scale: 16 images x
group_size 8 = 128 rollouts, 1024-patch latents, E=1024 decoder.

Compares the fused-training-kernel path (grouped-cross dispatch,
16 microbatches) against the rematerializing XLA path (the previous
default: ACAI_FUSED_TRAIN_LAYER=0, 4 microbatches).

Usage: python tools/grpo_update_bench.py [--t 512] [--steps 5] [--xla]
       [--microbatches N]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()

from acai_omr_tpu.models import vitomr as vitomr_lib
from acai_omr_tpu.models.omr_decoder import DecoderConfig, init_decoder_params
from acai_omr_tpu.train import omr_grpo_train as grpo
from acai_omr_tpu.parallel import trainer
from acai_omr_tpu.ops import pallas_train_layer as ptl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=512, help="max_actions bucket")
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--mem", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--microbatches", type=int, default=None)
    ap.add_argument("--xla", action="store_true",
                    help="force the XLA fallback (previous default: m=4)")
    ap.add_argument("--profile", action="store_true",
                    help="dump a per-op device-time breakdown of one step")
    args = ap.parse_args()
    if args.xla:
        ptl.set_enabled(False)
    m = args.microbatches or (4 if args.xla else 16)

    bu, g, t, mlen = args.images, args.group, args.t, args.mem
    r = bu * g
    dcfg = DecoderConfig(max_lmx_seq_len=1536)
    cfg = vitomr_lib.ViTOMRConfig(
        encoder=vitomr_lib.EncoderConfig(), decoder=dcfg)

    params = {"decoder": init_decoder_params(jax.random.PRNGKey(0), dcfg)}
    rng = np.random.default_rng(0)
    e = dcfg.hidden_dim
    batch = {
        "rollouts": jnp.asarray(rng.integers(3, 200, (r, t + 1)), jnp.int32),
        "rollout_inputs": jnp.asarray(rng.integers(3, 200, (r, t)), jnp.int32),
        "rollout_input_valid": jnp.asarray(
            np.arange(t)[None, :] < rng.integers(t // 2, t, (r, 1))),
        "old_log_probs": jnp.asarray(
            -rng.random((r, t + 1), np.float32)),
        "advantages": jnp.asarray(rng.standard_normal(r), jnp.float32),
        "img_latent": jnp.asarray(
            rng.standard_normal((bu, mlen, e)), jnp.bfloat16),
        "latent_valid": jnp.ones((bu, mlen), bool),
        "entropy_beta": jnp.float32(0.03),
        "lambda_ce": jnp.float32(0.1),
        # CE anchor on gold sequences (reference omr_grpo_train.py:284-287)
        "gold_inputs": jnp.asarray(rng.integers(3, 200, (bu, 256)), jnp.int32),
        "gold_targets": jnp.asarray(rng.integers(3, 200, (bu, 256)), jnp.int32),
        "gold_input_valid": jnp.ones((bu, 256), bool),
        "unexpanded_img_latent": jnp.asarray(
            rng.standard_normal((bu, mlen, e)), jnp.bfloat16),
        "unexpanded_latent_valid": jnp.ones((bu, mlen), bool),
    }

    tx = optax.adamw(1e-5)
    state = trainer.create_train_state(params, tx)
    step = grpo.make_grpo_update_step(cfg, tx, num_groups=bu, epsilon=0.2,
                                      rollout_microbatches=m)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+run: {time.perf_counter() - t0:.1f}s "
          f"(fused={'off' if args.xla else 'on'}, microbatches={m})",
          flush=True)

    # block_until_ready does NOT block through the axon tunnel (CLAUDE.md):
    # chain steps and end each rep with ONE device->host pull. Reps expose
    # run-to-run variance (host CPU contention starves the tunnel client —
    # don't run CPU pytest concurrently with TPU benches).
    def rep(n):
        nonlocal state
        tot = jnp.float32(0)
        for _ in range(n):
            state, metrics = step(state, batch, key)
            tot = tot + metrics["loss"]
        return float(tot)  # the pull
    rep(4)  # warm-up: the first executions pay one-time layout/transfer work
    times = []
    for _ in range(max(2, args.steps // 4)):
        t0 = time.perf_counter()
        rep(4)
        times.append((time.perf_counter() - t0) / 4)
    el = float(np.median(times))
    print("per-rep ms/step: " + " ".join(f"{x * 1e3:.0f}" for x in times))
    print(f"update step ({r} rollouts x {t} actions, mem {mlen}): "
          f"median {el * 1e3:.0f} ms  -> {r / el:.1f} rollouts/s", flush=True)

    if args.profile:
        import collections
        import glob as globlib
        import gzip
        import json
        import tempfile
        outdir = tempfile.mkdtemp(prefix="acai_grpo_trace_")
        with jax.profiler.trace(outdir):
            state, metrics = step(state, batch, key)
            jax.block_until_ready(metrics["loss"])
        f = globlib.glob(outdir + "/**/*.trace.json.gz", recursive=True)[0]
        data = json.load(gzip.open(f))
        agg = collections.Counter()
        meta = {}
        for ev in data["traceEvents"]:
            if (ev.get("ph") == "X" and ev.get("dur", 0) > 0
                    and ev.get("pid") == 3 and ev.get("tid") == 3):
                agg[ev["name"]] += ev["dur"]
                a = ev.get("args") or {}
                if ev["name"] not in meta and a:
                    meta[ev["name"]] = a
        print(f"\ntotal device-op time {sum(agg.values()) / 1e3:.0f} ms; top ops:")
        for name, dur in agg.most_common(25):
            src = (meta.get(name, {}).get("tf_op")
                   or meta.get(name, {}).get("long_name") or "")
            print(f"{dur / 1e3:9.2f} ms  {name[:40]:40s} {str(src)[:90]}")


if __name__ == "__main__":
    main()
