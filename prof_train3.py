import time, numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.models.mae import MaeConfig
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
batch = {
  "patches": jnp.asarray(r.random((B, L, 256), dtype=np.float32)),
  "pe_idx": jnp.asarray(r.integers(0, 12000, (B, L, 4)), dtype=jnp.int32),
  "pe_w": jnp.asarray(r.random((B, L, 4), dtype=np.float32)),
  "valid": jnp.ones((B, L), dtype=bool),
  "lengths": jnp.full((B,), L, dtype=jnp.int32),
  "target_patches": jnp.asarray(r.random((B, L, 256), dtype=np.float32)),
}
state, m = step(state, batch, jax.random.PRNGKey(999))
jax.block_until_ready(m["loss"]); print("warm loss:", float(m["loss"]), flush=True)
losses=[]
for i in range(3):
    t0=time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(i))
    l = float(m["loss"])   # forces sync every step
    dt = time.perf_counter()-t0
    losses.append(l)
    print(f"step {i}: {dt*1000:.1f} ms, loss {l:.5f}", flush=True)
