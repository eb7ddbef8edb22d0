import time, numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.models import omr_decoder, decode as decode_lib
from acai_omr_tpu.ops import pallas_decode
from acai_omr_tpu.models.omr_decoder import DecoderConfig

def bench(B, M, steps, seg, cache_dtype, label):
    cfg = DecoderConfig(max_lmx_seq_len=steps, eos_idx=-1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    r = np.random.default_rng(0)
    mem = jnp.asarray(r.standard_normal((B, M, cfg.hidden_dim)), dtype=jnp.bfloat16)
    mv = jnp.ones((B, M), dtype=bool)
    def run():
        s = decode_lib.generate(params, cfg, mem, mv, max_len=steps,
                                compute_dtype=jnp.bfloat16, cache_dtype=cache_dtype,
                                initial_segment=seg)
        jax.block_until_ready(s[0])
    run()
    ts=[]
    for _ in range(2):
        t0=time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
    el=min(ts)
    print(f"{label} B={B} M={M} steps={steps}: {el:.3f}s {B/el:.2f} sys/s {el/steps*1000:.2f} ms/step", flush=True)

pallas_decode.set_enabled(False)
bench(32, 512, 512, 256, jnp.int8, "int8")
bench(64, 512, 512, 256, jnp.int8, "int8")
bench(64, 512, 512, 256, jnp.bfloat16, "bf16")
bench(128, 512, 512, 256, jnp.int8, "int8")
