"""Full-size MAE on-chip training sanity: 30 synthetic steps, loss must drop
(validated on v5e: 2.12 -> 1.00). Run on a TPU host: python tools/mae_onchip_sanity.py"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.models import mae as mae_lib
from acai_omr_tpu.train import pre_train as pt
from acai_omr_tpu.parallel import trainer

cfg = pt.set_up_mae()
params = mae_lib.init_mae_params(jax.random.PRNGKey(0), cfg)
tx = trainer.adamw(1.5e-4, weight_decay=0.05)
state = trainer.create_train_state(params, tx)
step = trainer.make_train_step(pt.make_loss_fn(cfg, jnp.bfloat16), tx)
r = np.random.default_rng(0)
B, L = 64, 512
# structured synthetic images: horizontal stripes (learnable content)
base = (np.sin(np.arange(512 * 256).reshape(512, 256) / 7.0) * 0.4 + 0.5)
batch = {
  "patches": jnp.asarray(np.stack([np.roll(base[:L], i, axis=0) for i in range(B)]), dtype=jnp.float32),
  "pe_idx": jnp.asarray(r.integers(0, 12000, (B, L, 4)), dtype=jnp.int32),
  "pe_w": jnp.asarray(r.random((B, L, 4), dtype=np.float32)),
  "valid": jnp.ones((B, L), dtype=bool),
  "lengths": jnp.full((B,), L, dtype=jnp.int32),
}
batch["target_patches"] = batch["patches"]
losses = []
for i in range(30):
    state, m = step(state, batch, jax.random.PRNGKey(i))
    losses.append(float(m["loss"]))
print(f"full-size MAE on-chip sanity: loss {losses[0]:.4f} -> {losses[-1]:.4f} over 30 steps", flush=True)
assert losses[-1] < losses[0] * 0.7, "loss did not decrease"
print("OK", flush=True)
