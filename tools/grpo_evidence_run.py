"""GRPO evidence run: >= 20 outer steps on the synthetic task, with curves.

VERDICT r2 item 7: the 4-step e2e smoke showed GRPO *runs* but not that the
objective behaves over a real span. This runs MAE -> TF pretraining on the
synthetic OMR task (tools/e2e_pipeline_run.py machinery), then ``--steps``
GRPO outer steps with per-step reward/loss/component logging and periodic
mini-validation (reward is TEDn-based — train/grpo_rewards.py), and writes:

* ``grpo_evidence.json`` — per-step rows (reward, loss, ce_loss, reward
  components, phase times) + mini-val rows,
* a markdown reward-curve table on stdout (for docs/PERF.md),
* asserts: all rewards finite, no policy collapse (final-quarter mean
  reward >= 0.5x first-quarter mean), mini-val reward finite.

Reference methodology anchor: the reference's GRPO run documents its
(null) outcome over a real span (reference omr_grpo_train.py:404-501,
docs/training.md:69); this provides the same evidence class for this stack.

Usage:
  python tools/grpo_evidence_run.py [--steps 24] [--workdir DIR]
      [--tf-params CKPT]   # skip stages 1+2, reuse a prior run's weights
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from tools.e2e_pipeline_run import SyntheticOmrDataset, decode_eval


def train_policy(workdir, tok, enc, bucket_boundaries, tf_epochs=60):
    """Stages 1+2 of the e2e pipeline.

    ``tf_epochs`` defaults to a DELIBERATELY under-trained stage 2 (60 vs the
    e2e pipeline's 160): VERDICT r3 "what's weak" #6 — a near-converged
    policy (val token acc ~0.76) compresses reward against its ~10 ceiling
    and hides any GRPO trend. A weaker starting policy leaves the reward
    curve room to show lift (or a clean, readable null result)."""
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.mae import MaeConfig
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.train import pre_train

    mae_cfg = MaeConfig(encoder=enc, mask_ratio=0.75, decoder_num_layers=2,
                        decoder_hidden_dim=64, decoder_num_heads=4,
                        decoder_mlp_dim=128)
    mae_params, _ = pre_train.pre_train(
        mae_cfg, SyntheticOmrDataset(tok, 384, "mae"),
        SyntheticOmrDataset(tok, 16, "mae", seed=1), epochs=20, batch_size=16,
        warmup_epochs=1, checkpoint_freq=10, model_dir=workdir / "mae",
        num_workers=2, bucket_boundaries=bucket_boundaries,
        compute_dtype=jnp.bfloat16)

    cfg = ViTOMRConfig(
        encoder=enc,
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=128,
                                             num_layers=4, hidden_dim=256,
                                             num_heads=4, mlp_dim=1024,
                                             dropout=0.0),
        transition_head_dim=256, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    params = vitomr_lib.vitomr_params_from_mae(params, mae_params)
    params, _ = tf_train.omr_teacher_force_train(
        cfg, params, SyntheticOmrDataset(tok, 384, "omr"),
        SyntheticOmrDataset(tok, 16, "omr", seed=1), tok, epochs=tf_epochs,
        batch_size=16, warmup_epochs=2, checkpoint_freq=tf_epochs,
        model_dir=workdir / "tf", num_workers=2, base_lr=3e-4,
        fine_tune_base_lr=3e-4, tf_anneal_epochs=640, soft_epochs=tf_epochs,
        bucket_boundaries=bucket_boundaries, compute_dtype=jnp.bfloat16)
    return cfg, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--tf-params", default=None,
                    help="orbax pytree of stage-2 weights (skips training)")
    ap.add_argument("--tf-epochs", type=int, default=60,
                    help="stage-2 epochs; default under-trains the policy so "
                         "reward is not compressed at its ceiling")
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--seed", type=int, default=0,
                    help="GRPO training seed (rollout sampling / data order) "
                         "- evidence v3 runs >=3 seeds for noise bars")
    ap.add_argument("--control", action="store_true",
                    help="control arm: shuffle advantages across the batch "
                         "(UpdateConfig.shuffle_advantages) - identical "
                         "update magnitude, destroyed credit assignment")
    args = ap.parse_args()

    import copy

    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.models.vit_encoder import EncoderConfig
    from acai_omr_tpu.models.vitomr import ViTOMRConfig
    from acai_omr_tpu.train import omr_grpo_train as grpo
    from acai_omr_tpu.train.grpo_rewards import (GRPOConfig, LossConfig,
                                                 RolloutConfig, UpdateConfig)
    from acai_omr_tpu.utils import checkpoint as ckpt_lib
    from acai_omr_tpu.utils import fast_prng

    fast_prng.enable()
    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="acai_grpo_ev_"))
    print(f"workdir: {workdir}  device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()

    tok = LmxTokenizer()
    enc = EncoderConfig(patch_size=16, pe_max_height=4, pe_max_width=32,
                        num_layers=4, hidden_dim=128, num_heads=4,
                        mlp_dim=256, dropout=0.0, fine_tune_depth=4)
    bucket_boundaries = [(64, 256), (64, 352), (64, 464)]

    if args.tf_params:
        cfg = ViTOMRConfig(
            encoder=enc,
            decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=128,
                                                 num_layers=4, hidden_dim=256,
                                                 num_heads=4, mlp_dim=1024,
                                                 dropout=0.0),
            transition_head_dim=256, transition_head_dropout=0.0)
        params = jax.tree.map(jnp.asarray, ckpt_lib.load_params(args.tf_params))
    else:
        cfg, params = train_policy(workdir, tok, enc, bucket_boundaries,
                                   tf_epochs=args.tf_epochs)

    val_tok_acc, val_seq_acc, _ = decode_eval(
        params, cfg, SyntheticOmrDataset(tok, 16, "omr", seed=1), tok)
    print(f"[policy] val token acc {val_tok_acc:.3f} seq {val_seq_acc:.3f}",
          flush=True)

    gcfg, gparams = grpo.set_up_grpo(cfg, params)
    grpo_config = GRPOConfig(
        rollout_config=RolloutConfig(group_size=4, max_actions=48, top_k=10,
                                     temperature=1.0),
        reward_config=copy.deepcopy(grpo.INITIAL_REWARD_CONFIG),
        loss_config=LossConfig(entropy_beta=0.02, lambda_ce=0.1),
        update_config=UpdateConfig(epsilon=0.2, update_epochs=2,
                                   max_grad_norm=1.0,
                                   shuffle_advantages=args.control),
        mini_validation_freq=4, checkpoint_freq=10 ** 6)
    batch_size = 4
    n_train = args.steps * batch_size  # one epoch of `steps` outer steps
    grpo_ds = SyntheticOmrDataset(tok, n_train, "grpo", seed=2)
    val_ds = SyntheticOmrDataset(tok, 16, "grpo", seed=3)

    # pre-GRPO mini-val: same metric the in-loop mini-vals report, so the
    # before -> after delta is one consistent series in the artifact
    rng0 = jax.random.PRNGKey(123)
    mv_before = grpo.mini_validate(gparams, gcfg, grpo_config, val_ds, tok,
                                   rng0, compute_dtype=jnp.bfloat16,
                                   reward_workers=8)
    mv_before = {"reward": mv_before["reward"], "ce_loss": mv_before["ce_loss"],
                 "components": (mv_before["components"].to_dict()
                                if mv_before["components"] is not None
                                else None)}
    print(f"[policy] mini-val reward {mv_before['reward']:.3f} "
          f"ce {mv_before['ce_loss']:.4f}", flush=True)

    gparams_after, gstats = grpo.grpo_train(
        gcfg, gparams, grpo_ds, tok, grpo_config=grpo_config, epochs=1,
        batch_size=batch_size, lr=args.lr, model_dir=workdir / "grpo",
        seed=args.seed, compute_dtype=jnp.bfloat16, reward_workers=8,
        exploration_steps=10 ** 6, val_dataset=val_ds)

    rows, mini_val_rows = [], []
    for i, s in enumerate(gstats):
        comp = s.get("reward_components")
        rows.append({
            "step": i + 1, "reward": s["reward"], "loss": s["loss"],
            "ce_loss": s["ce_loss"], "seconds": s.get("seconds"),
            "components": comp.to_dict() if comp is not None else None,
            "phase_times": s.get("phase_times"),
        })
        if s.get("mini_val") is not None:
            mini_val_rows.append(s["mini_val"])

    # post-GRPO evals: mini-val (reward/CE series endpoint) + decode-quality
    # eval on the SAME split and metric as the pre-GRPO one
    mv_after = grpo.mini_validate(gparams_after, gcfg, grpo_config, val_ds,
                                  tok, rng0, compute_dtype=jnp.bfloat16,
                                  reward_workers=8)
    mv_after = {"reward": mv_after["reward"], "ce_loss": mv_after["ce_loss"],
                "components": (mv_after["components"].to_dict()
                               if mv_after["components"] is not None
                               else None)}
    val_tok_after, val_seq_after, _ = decode_eval(
        gparams_after, gcfg, SyntheticOmrDataset(tok, 16, "omr", seed=1), tok)

    rewards = np.array([r["reward"] for r in rows])
    q = max(len(rewards) // 4, 1)
    first_q, last_q = float(rewards[:q].mean()), float(rewards[-q:].mean())
    (workdir / "grpo_evidence.json").write_text(json.dumps({
        "steps": rows,
        "mini_val": mini_val_rows,
        "mini_val_before": mv_before,
        "mini_val_after": mv_after,
        "val_token_acc_before": val_tok_acc,
        "val_seq_acc_before": val_seq_acc,
        "val_token_acc_after": val_tok_after,
        "val_seq_acc_after": val_seq_after,
        "train_reward_first_quarter_mean": first_q,
        "train_reward_last_quarter_mean": last_q,
        "config": {"steps": args.steps, "batch_size": batch_size,
                   "lr": args.lr, "tf_epochs": args.tf_epochs,
                   "seed": args.seed, "control_shuffled_adv": args.control,
                   "group_size": 4, "max_actions": 48},
    }, indent=1))

    print("\n| step | reward | loss | ce_loss |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['step']} | {r['reward']:.3f} | {r['loss']:.4f} "
              f"| {r['ce_loss']:.4f} |")
    if mini_val_rows:
        print("\n| mini-val step | reward | ce_loss |")
        print("|---|---|---|")
        for m in mini_val_rows:
            print(f"| {m['step']} | {m['reward']:.3f} | {m['ce_loss']:.4f} |")
    print(f"\nmini-val reward {mv_before['reward']:.3f} -> "
          f"{mv_after['reward']:.3f}, ce {mv_before['ce_loss']:.4f} -> "
          f"{mv_after['ce_loss']:.4f}")
    print(f"decode eval token acc {val_tok_acc:.3f} -> {val_tok_after:.3f}, "
          f"seq acc {val_seq_acc:.3f} -> {val_seq_after:.3f}")
    print(f"train reward first-quarter mean {first_q:.3f} -> "
          f"last-quarter mean {last_q:.3f}  "
          f"({len(rewards)} outer steps, {time.perf_counter()-t0:.0f}s total)",
          flush=True)
    assert np.isfinite(rewards).all(), "non-finite reward"
    assert len(rewards) >= args.steps
    # collapse guard (VERDICT r3: 0.5x would pass a 2x reward crash)
    assert last_q >= 0.95 * first_q, \
        f"policy collapse: reward {first_q:.3f} -> {last_q:.3f}"
    assert np.isfinite(mv_after["reward"]), "non-finite mini-val reward"
    print("GRPO EVIDENCE RUN OK")


if __name__ == "__main__":
    main()
