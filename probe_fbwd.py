import os, time
os.environ["ACAI_FLASH_ATTENTION"] = "1"
import numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.ops import nn as jnn

for (B,H,T,DH) in [(2,4,256,64)]:
    params = jnn.mha_init(jax.random.PRNGKey(0), H*DH)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, H*DH)), dtype=jnp.bfloat16)
    spec = jnn.MaskSpec(key_valid=jnp.ones((B,T),dtype=bool), causal=False)
    def loss(p, x):
        return jnp.sum(jnn.mha(p, x, x, H, spec).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss))
    t0=time.perf_counter()
    out = g(params, x); jax.block_until_ready(out["in_kernel"])
    print(f"T={T}: flash bwd compile+run {time.perf_counter()-t0:.1f}s", flush=True)
