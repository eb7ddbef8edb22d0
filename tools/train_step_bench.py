"""Corrected training-step timing: chained steps, ONE device->host sync.

Every device->host pull costs ~29 ms through the axon tunnel (probed:
dispatch 0.8 ms, pull 29 ms), so the earlier per-step `float(loss)` timings
overstate step cost and understate throughput. This chains N identical steps
back-to-back (async dispatch queues them) and syncs once.

Usage: python tools/train_step_bench.py [ss|mae] [--batch N] [--steps N]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def bench_ss(batch: int, n_steps: int, img_hw=(256, 1024), lmx_len=256,
             accum: int = 1, window: bool = False):
    """Scheduled-sampling seq2seq step at flagship size (the docs/PERF.md
    training-study config: img budget 1024 patches, lmx 256).

    ``accum > 1`` measures the real stage-2 regime (reference: 8 microbatches
    per optimizer step, omr_teacher_force_train.py:40,126): grads accumulate
    on device and the ~13 ms optimizer application amortizes over the window.
    """
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer
    import optax

    tok = LmxTokenizer("lmx_vocab.txt")
    cfg = tf_train.set_up_vitomr(tok)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(jnp.array, params)

    rng = np.random.default_rng(0)
    h, w = img_hw
    examples = [(rng.random((1, h, w), dtype=np.float32),
                 " ".join(tok.decode(rng.integers(3, 200, lmx_len - 2))
                          .split()))
                for _ in range(batch)]
    batch_arrays = loader.pack_omr_batch(examples, cfg.encoder, tok)
    db = {k: jnp.asarray(v) for k, v in batch_arrays.items()
          if isinstance(v, np.ndarray)}
    db["tf_prob"] = jnp.float32(0.5)
    db["tau"] = jnp.float32(2.0)

    tx = optax.adamw(1e-4)
    state = trainer.create_train_state(params, tx)
    loss_fn = tf_train.make_loss_fn(cfg, {"use_hard_sampling": False})
    grad_fn = trainer.make_grad_fn(loss_fn)
    grad_acc_fn = trainer.make_grad_acc_fn(loss_fn)
    apply_fn = trainer.make_apply_fn(tx)

    key = jax.random.PRNGKey(1)

    if window and accum == 1:
        print("NOTE: --window has no effect with --accum 1 "
              "(the fused window is a scan over microbatches); "
              "running the host-driven path.")
    if window and accum > 1:
        # fused whole-window step: scan over the microbatches in ONE jit
        window_fn = trainer.make_window_step_fn(loss_fn, tx, accum)
        stacked = trainer.stack_microbatches([db] * accum)

        def run(n):
            nonlocal state, key
            losses = []
            for i in range(n // accum):
                key, sk = jax.random.split(key)
                state, window_losses = window_fn(state, stacked, sk,
                                                 jnp.float32(1.0))
                losses.append(jnp.sum(window_losses))
                if (i + 1) % 4 == 0 and (i + 1) * accum < n:
                    float(losses[-1])  # bound in-flight buffers
            return float(sum(losses))  # ONE pull

        run(2 * accum)
        t0 = time.perf_counter()
        run(n_steps)
        el = (time.perf_counter() - t0) / (n_steps // accum * accum)
        h, w = img_hw
        print(f"scheduled-sampling step B={batch} img {h}x{w} lmx {lmx_len} "
              f"(fused window, accum {accum}): {el * 1e3:.1f} ms/microbatch "
              f"-> {batch / el:.1f} img/s", flush=True)
        return

    def run(n):
        nonlocal state, key
        losses = []
        grads_acc, in_window = None, 0
        for i in range(n):
            key, sk = jax.random.split(key)
            if grads_acc is None:
                loss, grads_acc = grad_fn(state.params, db, sk)
            else:
                # fused accumulate: summed grads land in the donated acc
                loss, grads_acc = grad_acc_fn(state.params, db, sk,
                                              grads_acc)
            in_window += 1
            if in_window >= accum:
                state = apply_fn(state, grads_acc, jnp.float32(1.0))
                grads_acc, in_window = None, 0
            losses.append(loss)
            if (i + 1) % 10 == 0 and i + 1 < n:
                float(loss)  # bound in-flight buffers
        if grads_acc is not None:
            state = apply_fn(state, grads_acc, jnp.float32(1.0))
        return float(sum(losses))  # ONE pull

    run(2)  # compile + warm
    t0 = time.perf_counter()
    run(n_steps)
    el = (time.perf_counter() - t0) / n_steps
    label = f" (accum {accum})" if accum > 1 else ""
    print(f"scheduled-sampling step B={batch} img {h}x{w} lmx {lmx_len}{label}: "
          f"{el * 1e3:.1f} ms/microbatch -> {batch / el:.1f} img/s "
          f"({n_steps} chained steps, one sync)", flush=True)


def bench_mae(batch: int, n_steps: int, seq_len=512):
    from acai_omr_tpu.train import pre_train as pt
    from acai_omr_tpu.models import mae as mae_lib
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer
    import optax

    cfg = pt.set_up_mae()
    params = mae_lib.init_mae_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(jnp.array, params)

    rng = np.random.default_rng(0)
    examples = [(rng.random((1, 128, 1024), dtype=np.float32),) * 2
                for _ in range(batch)]
    arrays = loader.pack_mae_batch([(a, b) for a, b in examples], cfg.encoder)
    db = {k: jnp.asarray(v) for k, v in arrays.items()
          if isinstance(v, np.ndarray)}

    tx = optax.adamw(1.5e-4)
    state = trainer.create_train_state(params, tx)
    step_fn = trainer.make_train_step(pt.make_loss_fn(cfg, jnp.bfloat16), tx)

    key = jax.random.PRNGKey(1)

    def run(n):
        nonlocal state, key
        losses = []
        for _ in range(n):
            key, sk = jax.random.split(key)
            state, metrics = step_fn(state, db, sk)
            losses.append(metrics["loss"])
        return float(sum(losses))

    run(2)
    t0 = time.perf_counter()
    run(n_steps)
    el = (time.perf_counter() - t0) / n_steps
    print(f"MAE pretrain step B={batch} L<={seq_len}: {el * 1e3:.1f} ms/step "
          f"-> {batch / el:.1f} img/s ({n_steps} chained, one sync)",
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ss", "mae"], nargs="?", default="ss")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--window", action="store_true",
                    help="fuse the whole accumulation window into one jit "
                         "(lax.scan over microbatches + apply)")
    ap.add_argument("--accum", type=int, default=1,
                    help="microbatches per optimizer step (reference: 8)")
    args = ap.parse_args()
    if args.mode == "ss":
        bench_ss(args.batch or 8, args.steps, accum=args.accum,
                 window=args.window)
    else:
        bench_mae(args.batch or 64, args.steps)
