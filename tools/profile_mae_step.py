"""Per-op profile of the MAE pretrain step (flagship shapes, B=64)."""

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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from acai_omr_tpu.train import pre_train as pt
    from acai_omr_tpu.models import mae as mae_lib
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer
    import optax

    cfg = pt.set_up_mae()
    params = jax.tree.map(jnp.array,
                          mae_lib.init_mae_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    examples = [(rng.random((1, 128, 1024), dtype=np.float32),) * 2
                for _ in range(batch)]
    arrays = loader.pack_mae_batch(list(examples), cfg.encoder)
    db = {k: jnp.asarray(v) for k, v in arrays.items()
          if isinstance(v, np.ndarray)}
    tx = optax.adamw(1.5e-4)
    state = trainer.create_train_state(params, tx)
    step_fn = trainer.make_train_step(pt.make_loss_fn(cfg, jnp.bfloat16), tx)
    key = jax.random.PRNGKey(1)

    def run(n):
        nonlocal state, key
        tot = None
        for _ in range(n):
            key, sk = jax.random.split(key)
            state, metrics = step_fn(state, db, sk)
            tot = metrics["loss"]
        return float(tot)

    run(2)
    t0 = time.perf_counter()
    run(10)
    print(f"step: {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms (B={batch})",
          flush=True)

    outdir = tempfile.mkdtemp(prefix="acai_mae_trace_")
    with jax.profiler.trace(outdir):
        run(4)

    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced", file=sys.stderr)
        return
    agg = collections.Counter()
    with gzip.open(files[0], "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        pid_name = ev.get("pid")
        agg[name] += ev.get("dur", 0)
    for name, dur in agg.most_common(30):
        if dur < 4000:
            break
        print(f"{dur / 1e3:9.2f} ms {dur / 4:9.0f} us/step  {name}")


if __name__ == "__main__":
    main()
