"""In-process A/B: XLA fused-bias attention vs Pallas flash attention on a
training step — scheduled-sampling (the docs/PERF.md config: B=8, img budget
1024 patches, lmx 256) or MAE pretrain (B=64, L<=512).

Interleaved in one process (cleared jit caches between flips) so machine
drift cannot masquerade as a kernel difference.

Usage: python tools/flash_ab.py [ss|mae]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def build():
    import optax
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer

    tok = LmxTokenizer("lmx_vocab.txt")
    cfg = tf_train.set_up_vitomr(tok)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = 8
    examples = [(rng.random((1, 256, 1024), dtype=np.float32),
                 " ".join(tok.decode(rng.integers(3, 200, 254)).split()))
                for _ in range(batch)]
    arrays = loader.pack_omr_batch(examples, cfg.encoder, tok)
    db = {k: jnp.asarray(v) for k, v in arrays.items()
          if isinstance(v, np.ndarray)}
    db["tf_prob"] = jnp.float32(0.5)
    db["tau"] = jnp.float32(2.0)
    tx = optax.adamw(1e-4)
    state = trainer.create_train_state(params, tx)
    grad_fn = trainer.make_grad_fn(
        tf_train.make_loss_fn(cfg, {"use_hard_sampling": False}))
    apply_fn = trainer.make_apply_fn(tx)
    return state, db, grad_fn, apply_fn, batch


def build_mae():
    import optax
    from acai_omr_tpu.train import pre_train as pt
    from acai_omr_tpu.models import mae as mae_lib
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer

    cfg = pt.set_up_mae()
    params = jax.tree.map(jnp.array,
                          mae_lib.init_mae_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    batch = 64
    examples = [(rng.random((1, 128, 1024), dtype=np.float32),) * 2
                for _ in range(batch)]
    arrays = loader.pack_mae_batch(list(examples), cfg.encoder)
    db = {k: jnp.asarray(v) for k, v in arrays.items()
          if isinstance(v, np.ndarray)}
    tx = optax.adamw(1.5e-4)
    state = trainer.create_train_state(params, tx)
    grad_fn = trainer.make_grad_fn(pt.make_loss_fn(cfg, jnp.bfloat16))
    apply_fn = trainer.make_apply_fn(tx)
    return state, db, grad_fn, apply_fn, batch


def measure(tag, state, db, grad_fn, apply_fn, batch, n_steps=20):
    key = jax.random.PRNGKey(1)
    # fresh state per measure: apply_fn donates its inputs, so the shared
    # initial state must not be passed in directly; the copy also gives every
    # variant an identical starting point
    state = jax.tree.map(jnp.array, state)

    def run(n, state, key, sync_every=5):
        losses = []
        for i in range(n):
            key, sk = jax.random.split(key)
            loss, grads = grad_fn(state.params, db, sk)
            state = apply_fn(state, grads, jnp.float32(1.0))
            losses.append(loss)
            if (i + 1) % sync_every == 0 and i + 1 < n:
                # bound in-flight buffers (donation keeps the state chain
                # in place, but each queued step still holds grads+residuals)
                float(loss)
        float(sum(losses))  # final pull
        return state, key

    t0 = time.perf_counter()
    state, key = run(2, state, key)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n_steps, state, key)
    el = (time.perf_counter() - t0) / n_steps
    print(f"{tag}: {el*1e3:6.1f} ms/step -> {batch/el:5.1f} img/s "
          f"(compile+warm {compile_s:.0f}s)", flush=True)
    return batch / el


mode = sys.argv[1] if len(sys.argv) > 1 else "ss"
state, db, grad_fn, apply_fn, batch = build_mae() if mode == "mae" else build()
results = {}
for rnd in range(2):
    for flash in (False, True):
        os.environ["ACAI_FLASH_ATTENTION"] = "1" if flash else "0"
        jax.clear_caches()
        tag = f"r{rnd} flash={int(flash)}"
        results.setdefault(flash, []).append(
            measure(tag, state, db, grad_fn, apply_fn, batch))

print()
for k, v in results.items():
    print(f"flash={int(k)}: best {max(v):.1f} img/s of "
          f"{['%.1f' % x for x in v]}")
