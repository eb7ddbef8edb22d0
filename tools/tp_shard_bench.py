"""TP-2 monolith decode: single-chip measurement of the per-shard step.

Real multi-chip hardware is not attached here, so the TP-2 monolith's
performance claim is grounded the honest way available: run the monolith
kernel at ONE SHARD's shapes (heads 16->8, attention width 1024->512, MLP
4096->2048 — exactly what each chip executes under
``sharded_generate(model_axis=)``, minus the three 32 KB ICI exchanges per
layer) on the attached chip, chained ``STEPS`` decode steps inside one jit
with a single device pull (axon-tunnel timing rule, docs/PERF.md). The
full-shape monolith step and the per-op XLA step at the same shard shapes
are measured identically for comparison, and the TP-2 step estimate adds a
modeled ICI term (3 exchanges/layer x 12 layers x ~2 us latency+wire for a
32 KB hop — v5e ICI ~45 GB/s/link).

Usage: python tools/tp_shard_bench.py [--b 1] [--steps 200] [--cache 256]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ICI_US_PER_EXCHANGE = 2.0  # ~1 us link latency + 32 KB / 45 GB/s ~ 0.7 us


def shard0_slice(params, cfg, tp: int = 2):
    """Shard 0 of the tp-shuffled decoder params (contiguous head block 0,
    first 1/tp of the MLP hidden) — the exact per-chip weight set under
    sharded_generate(model_axis=)."""
    e, h, dh, f = cfg.hidden_dim, cfg.num_heads, cfg.head_dim, cfg.mlp_dim
    hs, fs = h // tp, f // tp
    ea = hs * dh
    blocks = dict(params["blocks"])
    for name in ("self_attn", "cross_attn"):
        blk = dict(blocks[name])
        kern = blk["in_kernel"]                      # (L, E, 3E)
        l = kern.shape[0]
        k5 = kern.reshape(l, e, 3, h, dh)[:, :, :, :hs]
        blk["in_kernel"] = k5.reshape(l, e, 3 * ea)
        bias = blk["in_bias"].reshape(l, 3, h, dh)[:, :, :hs]
        blk["in_bias"] = bias.reshape(l, 3 * ea)
        out = dict(blk["out"])
        out["kernel"] = blk["out"]["kernel"][:, :ea]
        blk["out"] = out
        blocks[name] = blk
    l1 = dict(blocks["linear1"])
    l1["kernel"] = l1["kernel"][:, :, :fs]
    l1["bias"] = l1["bias"][:, :fs]
    blocks["linear1"] = l1
    l2 = dict(blocks["linear2"])
    l2["kernel"] = l2["kernel"][:, :fs]
    blocks["linear2"] = l2
    out = dict(params)
    out["blocks"] = blocks
    return out, ea


def make_chain(h_loc: int, steps: int, t0: int, int8: bool = False,
               mem_scales=None):
    from acai_omr_tpu.ops import pallas_monolith

    def chain_steps(mono, x, caches, mem_k, mem_v, bias_col):
        def body(i, carry):
            # cycle pos inside a 64-slot window at mid-cache so arbitrarily
            # many steps stay in bounds (timing is pos-uniform per segment)
            pos = t0 + jax.lax.rem(i, 64)
            if int8:
                x, kc, vc, ks, vs = carry
                x_out, kc, vc, ks, vs = pallas_monolith.decode_layers(
                    mono, x, pos, kc, vc, mem_k, mem_v, bias_col,
                    num_heads=h_loc, k_scale=ks, v_scale=vs,
                    mem_k_scale=mem_scales[0], mem_v_scale=mem_scales[1])
                return (x_out.astype(x.dtype), kc, vc, ks, vs)
            x, kc, vc = carry
            x_out, kc, vc = pallas_monolith.decode_layers(
                mono, x, pos, kc, vc, mem_k, mem_v,
                bias_col, num_heads=h_loc)
            return (x_out.astype(x.dtype), kc, vc)

        return jax.lax.fori_loop(0, steps, body, (x, *caches))

    return chain_steps


def measure(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))  # sync through the tunnel
    t0 = time.perf_counter()
    out = f(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--cache", type=int, default=256)
    ap.add_argument("--mem", type=int, default=512)
    ap.add_argument("--tp", type=int, default=2, choices=(2, 4),
                    help="model-parallel factor for the shard arm (tp=4 "
                         "shard: heads 16->4, attn width 256, MLP 1024; "
                         "ICI term doubles — 2 recursive-doubling rounds)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 KV caches (+ packed scale planes) at both "
                         "shapes; weights stay bf16, as the tp monolith "
                         "path runs them (W8A8 off under tp)")
    ap.add_argument("--shard-w8a8", action="store_true",
                    help="with --int8: ALSO quantize the shard arm's "
                         "weights (per-shard W8A8 scales) — the "
                         "hypothetical tp x W8A8 composition")
    args = ap.parse_args()

    from acai_omr_tpu.models import decode as decode_lib
    from acai_omr_tpu.models import omr_decoder
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    from acai_omr_tpu.ops import pallas_monolith

    cfg = DecoderConfig(max_lmx_seq_len=args.cache, eos_idx=-1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    b, t_len, m_len = args.b, args.cache, args.mem
    e, h = cfg.hidden_dim, cfg.num_heads
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.standard_normal((b, m_len, e)), jnp.bfloat16)
    valid = jnp.ones((b, m_len), bool)
    x = jnp.asarray(rng.standard_normal((b, e)), jnp.bfloat16)
    t0 = t_len // 2  # mid-segment position
    results = {}

    cache_dt = jnp.int8 if args.int8 else jnp.bfloat16

    def setup(p, cfg_eff, ea, h_loc, w8a8=False):
        # the FULL arm runs the production single-chip int8 config (W8A8 int8
        # weights, env-default on); the SHARD arm mirrors the tp monolith
        # semantics (weights stay bf16 — see decode_segment)
        mono = pallas_monolith.prepack(p, cfg, jnp.bfloat16, e_attn=ea,
                                       quantize_weights=w8a8)
        # memory K/V always project from the FULL weights (sharded_generate
        # does the same — the tp shard then takes its contiguous head lanes)
        mem = decode_lib.precompute_memory_kv(params, cfg, latent, valid,
                                              jnp.bfloat16, cache_dt,
                                              layout="te")
        mem_k, mem_v = mem.k[..., :ea], mem.v[..., :ea]
        kc = jnp.zeros((cfg.num_layers, b, t_len, ea), cache_dt)
        vc = jnp.zeros_like(kc)
        bias_col = jnp.zeros((b, m_len, 1), jnp.float32)
        if not args.int8:
            return mono, (kc, vc), mem_k, mem_v, bias_col, None
        group = pallas_monolith.scale_pack_group(b, t_len, m_len, ea, h_loc,
                                                 w8a8=w8a8)
        ones = jnp.ones((cfg.num_layers, b, t_len, h_loc), jnp.bfloat16)
        ks = pallas_monolith.pack_scales(ones, group)
        # distinct array for the v plane: ks/vs are donated/aliased kernel
        # inputs, so seeding both from one buffer aliases them on step 1
        vs = pallas_monolith.pack_scales(ones, group)
        mem_sc = tuple(
            pallas_monolith.pack_scales(
                sc.astype(jnp.bfloat16)[..., :h_loc], group)
            for sc in (mem.k_scale, mem.v_scale))
        return mono, (kc, vc, ks, vs), mem_k, mem_v, bias_col, mem_sc

    # --- full-shape monolith -------------------------------------------------
    mono, caches, mk, mv, bc, msc = setup(
        params, cfg, e, h, w8a8=args.int8 and pallas_monolith.want_w8a8(cache_dt))
    wall = measure(make_chain(h, args.steps, t0, args.int8, msc),
                   mono, x, caches, mk, mv, bc)
    results["full_step_us"] = wall / args.steps * 1e6

    # --- shard-shape monolith (the per-chip TP-2 work) -----------------------
    tp = args.tp
    sparams, ea = shard0_slice(params, cfg, tp)
    mono_s, caches_s, mk_s, mv_s, bc_s, msc_s = setup(
        sparams, cfg, ea, h // tp, w8a8=args.int8 and args.shard_w8a8)
    wall_s = measure(make_chain(h // tp, args.steps, t0, args.int8, msc_s),
                     mono_s, x, caches_s, mk_s, mv_s, bc_s)
    results["shard_step_us"] = wall_s / args.steps * 1e6

    # recursive doubling: log2(tp) rounds of 3 exchanges per layer
    nrounds = tp.bit_length() - 1
    comm = 3 * cfg.num_layers * ICI_US_PER_EXCHANGE * nrounds
    results["modeled_ici_us"] = comm
    results["tp"] = tp
    results[f"tp{tp}_step_estimate_us"] = results["shard_step_us"] + comm
    results["speedup_vs_full"] = results["full_step_us"] / \
        results[f"tp{tp}_step_estimate_us"]
    results = {k: round(v, 2) for k, v in results.items()}
    results.update(b=b, steps=args.steps, cache=t_len, mem=m_len,
                   int8=bool(args.int8), device=str(jax.devices()[0]))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
