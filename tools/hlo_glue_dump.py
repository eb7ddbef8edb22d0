"""Dump the scheduled-sampling grad step's HLO and name the glue fusions.

The per-op trace (tools/profile_train_step.py) attributes ~19 ms/microbatch
to XLA fusions outside the fused Pallas kernels; this maps each traced
fusion name (fusion.N) back to its HLO body so we know what to attack.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.utils import fast_prng

fast_prng.enable()


def main():
    batch = 8
    from acai_omr_tpu.train import omr_teacher_force_train as tf_train
    from acai_omr_tpu.models import vitomr as vitomr_lib
    from acai_omr_tpu.data.tokenizer import LmxTokenizer
    from acai_omr_tpu.data import loader
    from acai_omr_tpu.parallel import trainer

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

    grad_fn = trainer.make_grad_fn(
        tf_train.make_loss_fn(cfg, {"use_hard_sampling": False}))
    key = jax.random.PRNGKey(1)
    lowered = jax.jit(grad_fn).lower(params, db, key)
    compiled = lowered.compile()
    text = compiled.as_text()
    Path("/tmp/ss_grad_hlo.txt").write_text(text)
    print(f"HLO: {len(text)} chars -> /tmp/ss_grad_hlo.txt")

    # summarize each top-level fusion: print the definition line of each
    # fusion instruction (optionally filtered to names given on argv)
    want = set(sys.argv[1:]) or None
    lines = text.splitlines()
    for i, ln in enumerate(lines):
        m = re.search(r"(fusion[.\d]*) = ([^ ]+) fusion\(", ln)
        if m and (want is None or m.group(1) in want):
            print(f"{m.group(1)}: out={m.group(2)}")
            mm = re.search(r"calls=([%\w.-]+)", ln)
            if mm:
                print(f"   calls {mm.group(1)}")


if __name__ == "__main__":
    main()
