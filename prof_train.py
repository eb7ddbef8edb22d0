import time, numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.models.mae import MaeConfig
from acai_omr_tpu.models import mae as mae_lib
from acai_omr_tpu.train import pre_train as pt
from acai_omr_tpu.train import omr_teacher_force_train as tf_train
from acai_omr_tpu.parallel import trainer
from acai_omr_tpu.data.tokenizer import LmxTokenizer

# --- MAE pretrain step: batch 64, L=512 bucket (reference: 106 img/s on CUDA)
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
state, m = step(state, batch, jax.random.PRNGKey(1)); jax.block_until_ready(m["loss"])
t0=time.perf_counter(); N=10
for i in range(N):
    state, m = step(state, batch, jax.random.PRNGKey(i))
jax.block_until_ready(m["loss"])
el=(time.perf_counter()-t0)/N
print(f"MAE pretrain step: batch {B}, L {L}: {el*1000:.1f} ms/step = {B/el:.1f} img/s (reference CUDA: ~106 img/s)", flush=True)

# --- scheduled sampling step: batch 8, img 1024, lmx 256 (reference: ~34 img/s)
tok = LmxTokenizer()
vcfg = tf_train.set_up_vitomr(tok)
from acai_omr_tpu.models import vitomr as vitomr_lib
vparams = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), vcfg)
vtx = trainer.adamw(1e-4, weight_decay=0.01,
                    scale_tree_fn=lambda p: trainer.encoder_llrd_scales(p, vcfg, 0.1, 0.9))
vstate = trainer.create_train_state(vparams, vtx)
vstep = trainer.make_train_step(tf_train.make_loss_fn(vcfg, {"use_hard_sampling": False}, jnp.bfloat16), vtx)
B, LI, LT = 8, 1024, 256
vb = {
  "patches": jnp.asarray(r.random((B, LI, 256), dtype=np.float32)),
  "pe_idx": jnp.asarray(r.integers(0, 12000, (B, LI, 4)), dtype=jnp.int32),
  "pe_w": jnp.asarray(r.random((B, LI, 4), dtype=np.float32)),
  "valid": jnp.ones((B, LI), dtype=bool),
  "inputs": jnp.asarray(r.integers(3, 227, (B, LT)), dtype=jnp.int32),
  "targets": jnp.asarray(r.integers(3, 227, (B, LT)), dtype=jnp.int32),
  "lmx_valid": jnp.ones((B, LT), dtype=bool),
  "tf_prob": jnp.float32(0.5), "tau": jnp.float32(2.0),
}
vstate, m = vstep(vstate, vb, jax.random.PRNGKey(1)); jax.block_until_ready(m["loss"])
t0=time.perf_counter(); N=10
for i in range(N):
    vstate, m = vstep(vstate, vb, jax.random.PRNGKey(i))
jax.block_until_ready(m["loss"])
el=(time.perf_counter()-t0)/N
print(f"scheduled-sampling step: batch {B}, img {LI}, lmx {LT}: {el*1000:.1f} ms/step = {B/el:.1f} img/s (reference CUDA: ~34 img/s)", flush=True)
# larger batch
B = 32
vb2 = {k: (jnp.repeat(v, 4, axis=0) if hasattr(v, 'ndim') and v.ndim >= 1 else v) for k, v in vb.items()}
vstate2 = trainer.create_train_state(vparams, vtx)
vstate2, m = vstep(vstate2, vb2, jax.random.PRNGKey(1)); jax.block_until_ready(m["loss"])
t0=time.perf_counter(); N=5
for i in range(N):
    vstate2, m = vstep(vstate2, vb2, jax.random.PRNGKey(i))
jax.block_until_ready(m["loss"])
el=(time.perf_counter()-t0)/N
print(f"scheduled-sampling step: batch {B}, img {LI}, lmx {LT}: {el*1000:.1f} ms/step = {B/el:.1f} img/s", flush=True)
