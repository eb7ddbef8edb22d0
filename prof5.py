import glob, gzip, json, time, numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.models import omr_decoder, decode as decode_lib
from acai_omr_tpu.ops import pallas_decode
from acai_omr_tpu.models.omr_decoder import DecoderConfig

pallas_decode.set_enabled(False)
B, M, steps = 32, 512, 512
cfg = DecoderConfig(max_lmx_seq_len=steps, eos_idx=-1)
params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
r = np.random.default_rng(0)
mem = jnp.asarray(r.standard_normal((B, M, cfg.hidden_dim)), dtype=jnp.bfloat16)
mv = jnp.ones((B, M), dtype=bool)

def run(seg=512):
    s = decode_lib.generate(params, cfg, mem, mv, max_len=steps,
                            compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
                            initial_segment=seg)
    jax.block_until_ready(s[0])
run()
jax.profiler.start_trace("/tmp/jaxtrace")
run()
jax.profiler.stop_trace()
print("trace done", flush=True)

# parse the trace for top ops
files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
ev = []
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur"):
            ev.append((e.get("name","?"), e["dur"]))
from collections import defaultdict
agg = defaultdict(float)
for name, dur in ev:
    agg[name] += dur
top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
for name, dur in top:
    print(f"{dur/1e6:8.3f}s  {name[:110]}")
