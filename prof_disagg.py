"""Disaggregate in-loop decode step costs: full vs no-attention vs no-FF."""
import time, functools, numpy as np, jax, jax.numpy as jnp
from acai_omr_tpu.ops import nn
from acai_omr_tpu.models import omr_decoder
from acai_omr_tpu.models.omr_decoder import DecoderConfig

B, M, T, STEPS = 32, 512, 512, 256
cfg = DecoderConfig(max_lmx_seq_len=T, eos_idx=-1)
params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
r = np.random.default_rng(0)
e, h, dh = cfg.hidden_dim, cfg.num_heads, cfg.head_dim

mem_k = jnp.asarray(r.standard_normal((cfg.num_layers, B, h, dh, M))*0.1, dtype=jnp.bfloat16)
mem_v = jnp.asarray(r.standard_normal((cfg.num_layers, B, h, dh, M))*0.1, dtype=jnp.bfloat16)

def make_loop(mode):
    @jax.jit
    def loop(x0, k_cache, v_cache):
        def body(carry):
            x, kc, vc, t = carry
            pos = t
            pos_idx = jnp.arange(T)
            bias = jnp.where(pos_idx[None,:] <= pos, 0.0, -1e9).astype(jnp.float32)
            bias = jnp.broadcast_to(bias, (B, T))
            blocks = params["blocks"]
            for i in range(cfg.num_layers):
                lp = jax.tree.map(lambda a: a[i], blocks)
                sa = lp["self_attn"]
                qkv = jnp.dot(x, sa["in_kernel"].astype(jnp.bfloat16)) + sa["in_bias"].astype(jnp.bfloat16)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = q.reshape(B, h, dh); k = k.reshape(B, h, dh); v = v.reshape(B, h, dh)
                kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype)[None,:,:,:,None], (i,0,0,0,pos))
                vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype)[None,:,:,:,None], (i,0,0,0,pos))
                if mode in ("full", "attn_only"):
                    logits = jnp.einsum('bhd,bhdt->bht', q, kc[i].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
                    w = jax.nn.softmax(logits + bias[:,None,:], axis=-1)
                    attn = jnp.einsum('bht,bhdt->bhd', w.astype(jnp.bfloat16), vc[i].astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                else:
                    attn = q
                x = nn.layernorm(lp["norm1"], x + nn.dense(sa["out"], attn.reshape(B, e)), eps=1e-5)
                ca = lp["cross_attn"]
                qc = (jnp.dot(x, ca["in_kernel"][:, :e].astype(jnp.bfloat16)) + ca["in_bias"][:e].astype(jnp.bfloat16)).reshape(B, h, dh)
                if mode in ("full", "attn_only"):
                    logits = jnp.einsum('bhd,bhdt->bht', qc, mem_k[i], preferred_element_type=jnp.float32)
                    w = jax.nn.softmax(logits, axis=-1)
                    cattn = jnp.einsum('bht,bhdt->bhd', w.astype(jnp.bfloat16), mem_v[i], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                else:
                    cattn = qc
                x = nn.layernorm(lp["norm2"], x + nn.dense(ca["out"], cattn.reshape(B, e)), eps=1e-5)
                if mode in ("full", "no_attn"):
                    ff = nn.dense(lp["linear2"], nn.gelu(nn.dense(lp["linear1"], x)))
                else:
                    ff = x
                x = nn.layernorm(lp["norm3"], x + ff, eps=1e-5)
            logits_out = nn.dense(params["unembed"], nn.layernorm(params["final_norm"], x, eps=1e-6)).astype(jnp.float32)
            x = params["vocab_embedding"]["table"][jnp.argmax(logits_out, -1)].astype(jnp.bfloat16)
            return (x, kc, vc, t + 1)
        def cond(c): return c[3] < STEPS
        x, kc, vc, t = jax.lax.while_loop(cond, body, (x0, k_cache, v_cache, jnp.int32(0)))
        return x
    return loop

x0 = jnp.asarray(r.standard_normal((B, e))*0.1, dtype=jnp.bfloat16)
for mode in ("full", "no_attn", "attn_only"):
    kc = jnp.zeros((cfg.num_layers, B, h, dh, T), dtype=jnp.bfloat16)
    vc = jnp.zeros_like(kc)
    f = make_loop(mode)
    out = f(x0, kc, vc); jax.block_until_ready(out)
    ts = []
    for _ in range(2):
        t0=time.perf_counter(); out = f(x0, kc, vc); jax.block_until_ready(out); ts.append(time.perf_counter()-t0)
    print(f"{mode}: {min(ts)/STEPS*1000:.2f} ms/step", flush=True)
