"""Fused-train-layer training-quality check at flagship shapes.

Runs the real scheduled-sampling optimizer loop twice on one fixed batch
(overfit regime) — fused kernel ON vs OFF — from identical init/PRNG, and
prints both loss trajectories. The fused backward accumulates weight grads
in bf16 (worst grad rel-err ~1.7e-2 vs the fp32 XLA stack), so the curves
will drift apart; the check is that the fused run optimizes comparably.

Usage: python tools/fused_convergence_check.py [--optim-steps N] [--accum N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def run_trajectory(optim_steps: int, accum: int, fused: bool):
    from acai_omr_tpu.ops import pallas_train_layer as ptl
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer
    import optax

    ptl.set_enabled(fused)

    tok = LmxTokenizer("lmx_vocab.txt")
    cfg = tf_train.set_up_vitomr(tok)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(jnp.array, params)

    rng = np.random.default_rng(0)
    examples = [(rng.random((1, 256, 1024), dtype=np.float32),
                 " ".join(tok.decode(rng.integers(3, 200, 254)).split()))
                for _ in range(8)]
    arrays = loader.pack_omr_batch(examples, cfg.encoder, tok)
    db = {k: jnp.asarray(v) for k, v in arrays.items()
          if isinstance(v, np.ndarray)}
    db["tf_prob"] = jnp.float32(0.5)
    db["tau"] = jnp.float32(2.0)

    tx = optax.adamw(3e-4)
    state = trainer.create_train_state(params, tx)
    grad_fn = trainer.make_grad_fn(
        tf_train.make_loss_fn(cfg, {"use_hard_sampling": False}))
    apply_fn = trainer.make_apply_fn(tx)

    key = jax.random.PRNGKey(1)
    window_losses = []
    for _ in range(optim_steps):
        grads_acc = None
        acc_loss = jnp.float32(0)
        for _ in range(accum):
            key, sk = jax.random.split(key)
            loss, grads = grad_fn(state.params, db, sk)
            grads_acc = trainer.accumulate_grads(grads_acc, grads)
            acc_loss = acc_loss + loss
        state = apply_fn(state, grads_acc, jnp.float32(1.0))
        window_losses.append(acc_loss / accum)
    return [float(x) for x in jnp.stack(window_losses)]  # ONE pull


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--optim-steps", type=int, default=8)
    ap.add_argument("--accum", type=int, default=4)
    args = ap.parse_args()

    tr_fused = run_trajectory(args.optim_steps, args.accum, fused=True)
    tr_xla = run_trajectory(args.optim_steps, args.accum, fused=False)
    print("step  fused     xla       rel-diff")
    for i, (a, b) in enumerate(zip(tr_fused, tr_xla)):
        print(f"{i:4d}  {a:8.5f}  {b:8.5f}  {abs(a - b) / max(abs(b), 1e-9):.3e}")
    drop_f = tr_fused[0] - tr_fused[-1]
    drop_x = tr_xla[0] - tr_xla[-1]
    print(f"loss drop: fused {drop_f:.4f} vs xla {drop_x:.4f} "
          f"(ratio {drop_f / max(drop_x, 1e-9):.3f})")
    ok = drop_f > 0.8 * drop_x and drop_f > 0
    print("CONVERGENCE OK" if ok else "CONVERGENCE DEGRADED")


if __name__ == "__main__":
    main()
