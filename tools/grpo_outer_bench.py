"""Reference-scale GRPO OUTER-step benchmark: rollout + rewards + updates.

One outer step = encode 16 images -> 128 sampled rollouts (grouped-memory
KV-cached decode) -> host rewards (native TEDn thread pool) -> 2 clipped
update epochs on the fused training kernels (reference: grpo_update,
omr_grpo_train.py:308-376 + epoch_train_loop:404-453). This is the
end-to-end training-throughput number; tools/grpo_rollout_bench.py and
tools/grpo_update_bench.py isolate the two device phases.

Uses real LMX targets (tests/data samples) and synthetic 1024-patch images;
rollouts come from an untrained policy, so the reward phase sees realistic
early-training garbage (the reference calls TEDn its bottleneck,
docs/training.md:71).

Usage: python tools/grpo_outer_bench.py [--steps 3] [--actions 512]
       [--images 16] [--group 8] [--workers 16]
"""

import argparse
import copy
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--actions", type=int, default=512)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--int8", action="store_true",
                    help="int8 KV caches for the rollout decode (grouped "
                         "int8 monolith)")
    args = ap.parse_args()

    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.lmx.delinearizer import delinearize
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.train import grpo_rewards as R
    from acai_omr_tpu.train import omr_grpo_train as G
    from acai_omr_tpu.train.omr_teacher_force_train import set_up_vitomr
    from acai_omr_tpu.parallel import trainer

    tok = LmxTokenizer(str(Path(__file__).parent.parent / "lmx_vocab.txt"))
    cfg = set_up_vitomr(tok)
    cfg_grpo, params = G.set_up_grpo(
        cfg, vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    samples = sorted((Path(__file__).parent.parent / "tests/data").glob(
        "sample_lmx_*.txt"))
    lmx_strs = [p.read_text().strip() for p in samples]
    rng_np = np.random.default_rng(0)
    examples = []
    for i in range(args.images):
        lmx = lmx_strs[i % len(lmx_strs)]
        xml, _ = delinearize(lmx)
        # 256x1024 px grayscale -> 16x64 = 1024 patches (the OMR budget)
        img = rng_np.random((1, 256, 1024), dtype=np.float32)
        examples.append((img, tok.encode(lmx), xml))

    grpo_config = R.GRPOConfig(
        rollout_config=R.RolloutConfig(group_size=args.group,
                                       max_actions=args.actions,
                                       top_k=50, temperature=1.1,
                                       cache_dtype="int8" if args.int8
                                       else "bf16"),
        reward_config=copy.deepcopy(G.INITIAL_REWARD_CONFIG),
        loss_config=copy.deepcopy(G.INITIAL_LOSS_CONFIG),
        update_config=R.UpdateConfig(epsilon=0.2, update_epochs=2,
                                     max_grad_norm=1.0),
        mini_validation_freq=10 ** 9, checkpoint_freq=10 ** 9)

    tx = trainer.adamw(1e-5, weight_decay=0.0, max_grad_norm=1.0,
                       scale_tree_fn=G.grpo_frozen_scales)
    state = trainer.create_train_state(params, tx)
    update_step = G.make_grpo_update_step(
        cfg_grpo, tx, args.images, 0.2, jnp.bfloat16)

    rollouts = args.images * args.group
    rng = jax.random.PRNGKey(1)
    times, phases = [], []
    preencoded = None  # encode-ahead chain, as in grpo_train's epoch loop
    for i in range(args.steps + 1):  # rep 0 = compile warm-up
        rng, step_rng = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = G.grpo_update(
            state.params, state, update_step, cfg_grpo, grpo_config,
            examples, tok, step_rng, compute_dtype=jnp.bfloat16,
            reward_workers=args.workers,
            next_examples=examples if i < args.steps else None,
            preencoded=preencoded)
        preencoded = metrics.pop("preencoded_next")
        dt = time.perf_counter() - t0
        if i:
            times.append(dt)
            phases.append(metrics["phase_times"])
        pt = metrics["phase_times"]
        print(f"rep {i}{' (compile)' if i == 0 else ''}: {dt:.2f}s "
              f"loss={float(metrics['loss']):.4f} "
              f"reward={float(metrics['reward']):.3f}  "
              + "  ".join(f"{k}={v:.2f}s" for k, v in pt.items()))
    best = min(times)
    print(f"outer step ({rollouts} rollouts x {args.actions} actions, "
          f"2 update epochs, native TEDn x{args.workers}): "
          f"median {np.median(times):.2f}s best {best:.2f}s "
          f"-> {rollouts / np.median(times):.1f} rollouts/s end-to-end")
    med = {k: float(np.median([p[k] for p in phases])) for k in phases[0]}
    tot = sum(med.values())
    print("phase breakdown (median): "
          + "  ".join(f"{k}={v:.2f}s ({v / tot * 100:.0f}%)"
                      for k, v in med.items()))


if __name__ == "__main__":
    main()
