"""Per-op profile of the scheduled-sampling training step (flagship shapes).

Chained-step timing says ~253 ms/step; a pure-GEMM floor at the measured
157 TF/s is ~70 ms — this breaks down where the rest goes.
"""

import collections
import glob
import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer
    import optax

    tok = LmxTokenizer("lmx_vocab.txt")
    cfg = tf_train.set_up_vitomr(tok)
    params = jax.tree.map(jnp.array,
                          vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg))
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
    grad_fn = trainer.make_grad_fn(
        tf_train.make_loss_fn(cfg, {"use_hard_sampling": False}))
    apply_fn = trainer.make_apply_fn(tx)
    key = jax.random.PRNGKey(1)

    def run(n):
        nonlocal state, key
        losses = []
        for _ in range(n):
            key, sk = jax.random.split(key)
            loss, grads = grad_fn(state.params, db, sk)
            state = apply_fn(state, grads, jnp.float32(1.0))
            losses.append(loss)
        return float(sum(losses))

    run(2)
    t0 = time.perf_counter()
    run(10)
    wall = (time.perf_counter() - t0) / 10
    print(f"step: {wall * 1e3:.1f} ms (B={batch})", flush=True)

    outdir = tempfile.mkdtemp(prefix="acai_train_trace_")
    with jax.profiler.trace(outdir):
        run(4)

    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced", file=sys.stderr)
        return
    data = json.load(gzip.open(files[0]))
    agg = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            name = e["name"]
            if name.startswith("$") or "profiler" in name or name.startswith("np."):
                continue
            agg[name] += e["dur"]
    print("\ntop device ops (us over 4 steps; /4 per step):")
    for name, dur in agg.most_common(40):
        print(f"{dur / 1e3:9.2f} ms  {dur / 4:8.0f} us/step  {name[:100]}")


if __name__ == "__main__":
    main()
