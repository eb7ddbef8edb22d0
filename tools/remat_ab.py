"""In-process A/B of per-layer remat policies on the scheduled-sampling step.

Variants: "dots" (current default: save matmul outputs, recompute attention
internals), False (no remat — backward reuses saved activations; candidate
win if B=8 fits HBM), True (full per-layer recompute — reference
checkpoint_sequential semantics, minimum memory).

Interleaved in one process (cleared jit caches between flips) so machine
drift cannot masquerade as a policy difference. Usage:
    python tools/remat_ab.py [batch] [n_steps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def build(batch):
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
    return cfg, state, db, tx


def measure(tag, cfg, state, db, tx, remat, batch, n_steps=20):
    import optax  # noqa: F401
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.parallel import trainer

    grad_fn = trainer.make_grad_fn(
        tf_train.make_loss_fn(cfg, {"use_hard_sampling": False}, remat=remat))
    apply_fn = trainer.make_apply_fn(tx)
    key = jax.random.PRNGKey(1)
    state = jax.tree.map(jnp.array, state)  # apply_fn donates its inputs

    def run(n, state, key, sync_every=5):
        losses = []
        for i in range(n):
            key, sk = jax.random.split(key)
            loss, grads = grad_fn(state.params, db, sk)
            state = apply_fn(state, grads, jnp.float32(1.0))
            losses.append(loss)
            if (i + 1) % sync_every == 0 and i + 1 < n:
                float(loss)  # bound in-flight buffers
        float(sum(losses))
        return state, key

    t0 = time.perf_counter()
    try:
        state, key = run(2, state, key)
    except Exception as e:  # OOM for remat=False is a legitimate outcome
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n_steps, state, key)
    el = (time.perf_counter() - t0) / n_steps
    print(f"{tag}: {el*1e3:6.1f} ms/step -> {batch/el:5.1f} img/s "
          f"(compile+warm {compile_s:.0f}s)", flush=True)
    return batch / el


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg, state, db, tx = build(batch)
    variants = [("dots", "dots"), ("none", False), ("full", True)]
    results = {}
    for rnd in range(2):
        for name, remat in variants:
            jax.clear_caches()
            r = measure(f"r{rnd} remat={name}", cfg, state, db, tx, remat,
                        batch, n_steps)
            if r is not None:
                results.setdefault(name, []).append(r)
    print()
    for k, v in results.items():
        print(f"remat={k}: best {max(v):.1f} img/s of "
              f"{['%.1f' % x for x in v]}")


if __name__ == "__main__":
    main()
