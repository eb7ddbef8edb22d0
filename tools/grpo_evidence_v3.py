"""GRPO evidence v3: multi-seed lift + shuffled-advantage control (VERDICT r4 #2).

Runs the 32-step GRPO evidence recipe (tools/grpo_evidence_run.py) from the
SAME under-trained stage-2 checkpoint across ``--seeds`` policy seeds, plus
one control arm with shuffled advantages (UpdateConfig.shuffle_advantages:
identical update magnitude / lr schedule / data flow, destroyed
rollout<->advantage credit assignment), and aggregates:

* per-arm before/after mini-val reward + ce + decode token acc,
* mean +/- sample-std of the reward delta across seeds,
* the control arm's delta (the run-noise/null reference the lift must beat).

Writes docs/grpo_evidence_r5.json. Reference methodology anchor: the
reference documents its own GRPO outcome over a real span
(omr_grpo_train.py:404-501, docs/training.md:69).

Usage:
  python tools/grpo_evidence_v3.py [--seeds 3] [--steps 32]
      [--tf-params .evidence/grpo_r4/tf/vitomr] [--workdir .evidence/grpo_r5]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent


def run_arm(name, workdir, tf_params, steps, lr, seed, control=False):
    arm_dir = workdir / name
    out_json = arm_dir / "grpo_evidence.json"
    if out_json.exists():
        print(f"[{name}] reusing existing {out_json}", flush=True)
        return json.loads(out_json.read_text())
    cmd = [sys.executable, "tools/grpo_evidence_run.py",
           "--steps", str(steps),
           "--lr", str(lr), "--seed", str(seed),
           "--workdir", str(arm_dir)]
    if tf_params is not None:
        # shared stage-2 checkpoint; with None the arm trains stages 1+2
        # itself into <arm_dir>/tf/vitomr (one-time cost, reused by the rest)
        cmd += ["--tf-params", str(tf_params)]
    if control:
        cmd.append("--control")
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    print(r.stdout[-3000:], flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)
        raise RuntimeError(f"arm {name} failed rc={r.returncode}")
    print(f"[{name}] done in {time.perf_counter() - t0:.0f}s", flush=True)
    return json.loads(out_json.read_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--control-seeds", type=int, default=1,
                    help="number of shuffled-advantage control arms (paired "
                         "seeds 0..N-1); >1 puts noise bars on the control "
                         "side of the comparison too")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--tf-params", default=".evidence/grpo_r4/tf/vitomr")
    ap.add_argument("--workdir", default=".evidence/grpo_r5")
    ap.add_argument("--out", default="docs/grpo_evidence_r5.json")
    args = ap.parse_args()
    if args.seeds < 1:
        ap.error("--seeds must be >= 1")
    if args.control_seeds < 0:
        ap.error("--control-seeds must be >= 0")

    # arms run with cwd=REPO — resolve repo-relative paths the same way
    # regardless of the invoking directory
    workdir = Path(args.workdir)
    if not workdir.is_absolute():
        workdir = REPO / workdir
    workdir.mkdir(parents=True, exist_ok=True)

    tf_params = Path(args.tf_params)
    if not tf_params.is_absolute():
        tf_params = REPO / tf_params
    arms = {}
    if not tf_params.exists():
        # checkpoint binaries are kept out of git (advisor r4) — retrain
        # stages 1+2 once inside the first arm and share the result
        print(f"[setup] {tf_params} missing - seed0 arm trains stages 1+2",
              flush=True)
        arms["seed0"] = run_arm("seed0", workdir, None, args.steps,
                                args.lr, seed=0)
        tf_params = (workdir / "seed0" / "tf" / "vitomr").resolve()
        if not tf_params.exists():
            # run_arm reuses a cached arm JSON without training — a kept
            # JSON with cleaned-out checkpoint binaries can't seed the
            # other arms
            raise RuntimeError(
                f"seed0 arm produced no checkpoint at {tf_params} (its "
                f"grpo_evidence.json was reused from a previous run whose "
                f"tf/ binaries were cleaned). Delete "
                f"{workdir / 'seed0'} to retrain, or pass --tf-params.")
    for s in range(args.seeds):
        if f"seed{s}" in arms:
            continue
        arms[f"seed{s}"] = run_arm(f"seed{s}", workdir, tf_params,
                                   args.steps, args.lr, seed=s)
    ctrl_names = []
    for s in range(args.control_seeds):
        # paired rollout/data seed with treatment arm s; only the
        # advantage<->rollout credit assignment differs
        name = "control" if s == 0 and args.control_seeds == 1 else \
            f"control{s}"
        ctrl_names.append(name)
        arms[name] = run_arm(name, workdir, tf_params, args.steps,
                             args.lr, seed=s, control=True)

    def delta(a):
        return a["mini_val_after"]["reward"] - a["mini_val_before"]["reward"]

    import numpy as np
    seed_deltas = [delta(arms[f"seed{s}"]) for s in range(args.seeds)]
    ctrl_deltas = [delta(arms[n]) for n in ctrl_names]
    summary = {
        "recipe": {"steps": args.steps, "lr": args.lr, "seeds": args.seeds,
                   "control_seeds": args.control_seeds,
                   "tf_params": str(tf_params),
                   "control": "shuffled advantages (UpdateConfig"
                              ".shuffle_advantages; fixed permutation/step)"},
        "per_arm": {
            name: {
                "mini_val_reward_before": a["mini_val_before"]["reward"],
                "mini_val_reward_after": a["mini_val_after"]["reward"],
                "reward_delta": delta(a),
                "mini_val_ce_before": a["mini_val_before"]["ce_loss"],
                "mini_val_ce_after": a["mini_val_after"]["ce_loss"],
                "val_token_acc_before": a["val_token_acc_before"],
                "val_token_acc_after": a["val_token_acc_after"],
                "train_reward_first_q": a["train_reward_first_quarter_mean"],
                "train_reward_last_q": a["train_reward_last_quarter_mean"],
            } for name, a in arms.items()
        },
        "seed_delta_mean": float(np.mean(seed_deltas)),
        "seed_delta_std": float(np.std(seed_deltas, ddof=1))
        if len(seed_deltas) > 1 else None,
        "seed_deltas": seed_deltas,
        "control_delta": ctrl_deltas[0] if len(ctrl_deltas) == 1 else None,
        "control_deltas": ctrl_deltas,
        "control_delta_mean": float(np.mean(ctrl_deltas))
        if ctrl_deltas else None,
        "control_delta_std": float(np.std(ctrl_deltas, ddof=1))
        if len(ctrl_deltas) > 1 else None,
        "lift_exceeds_control": bool(
            np.mean(seed_deltas) > np.mean(ctrl_deltas))
        if ctrl_deltas else None,
        "arm_jsons": {n: str(workdir / n / "grpo_evidence.json")
                      for n in arms},
    }
    # two-sample effect: GRPO-specific component = treatment mean - control
    # mean; SE combines both arms' sample variance (Welch). Honest caveat:
    # with 3-5 runs/arm this bounds run noise, it does not power a
    # publication-grade test.
    if len(seed_deltas) > 1 and len(ctrl_deltas) > 1:
        diff = float(np.mean(seed_deltas) - np.mean(ctrl_deltas))
        se = float(np.sqrt(
            np.var(seed_deltas, ddof=1) / len(seed_deltas)
            + np.var(ctrl_deltas, ddof=1) / len(ctrl_deltas)))
        summary["grpo_specific_lift"] = {
            "treatment_minus_control": diff, "welch_se": se,
            "z": diff / se if se > 0 else None}
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
