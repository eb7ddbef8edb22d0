import os, time
os.environ["ACAI_FLASH_ATTENTION"] = "1"
import numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.train import omr_teacher_force_train as tf_train
from acai_omr_tpu.parallel import trainer
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.models import vitomr as vitomr_lib

tok = LmxTokenizer()
vcfg = tf_train.set_up_vitomr(tok)
vparams = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), vcfg)
vtx = trainer.adamw(1e-4, weight_decay=0.01,
                    scale_tree_fn=lambda p: trainer.encoder_llrd_scales(p, vcfg, 0.1, 0.9))
grad_fn = trainer.make_grad_fn(
    tf_train.make_loss_fn(vcfg, {"use_hard_sampling": False}, jnp.bfloat16))
r = np.random.default_rng(0)
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
t0 = time.perf_counter()
loss, grads = grad_fn(vparams, vb, jax.random.PRNGKey(1))
jax.block_until_ready(loss)
print(f"flash train grad compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
ts = []
for i in range(3):
    t0 = time.perf_counter()
    loss, grads = grad_fn(vparams, vb, jax.random.PRNGKey(i))
    _ = float(loss)
    ts.append(time.perf_counter() - t0)
print(f"flash SS grad step B={B}: {min(ts)*1000:.1f} ms (non-flash full step was ~361ms)", flush=True)
