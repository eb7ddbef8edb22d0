"""A/B the fused training-layer kernel on GRPO-update shapes (grouped cross).

GRPO's inner update runs teacher-forced grad passes over rollout microbatches
where G rollouts share each unique image latent (reference:
acai_omr/models/models.py:883-891 latent expansion). The XLA path folds the
group into the cross query axis (transformer.decoder_layer cross_group); the
fused kernel instead consumes per-rollout mem_kv rows (jnp.repeat on the
batch axis — the K/V are still PROJECTED once, only their DMA replicates).

This measures grad-pass time per rollout row for both, at curriculum-scale
sequence lengths. The fused path's saved activations cost
L*R*T*(4E+2F)*2 bytes of HBM, so it runs smaller microbatches — the
comparison is throughput-normalized.

Usage: python tools/fused_grpo_ab.py [--t 512] [--rollouts-xla 32]
                                     [--rollouts-fused 8] [--group 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.ops import nn, transformer
from acai_omr_tpu.ops import pallas_train_layer as ptl
from acai_omr_tpu.utils import fast_prng

fast_prng.enable()

M, E, H, F = 1024, 1024, 16, 4096


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--rollouts-xla", type=int, default=32)
    ap.add_argument("--rollouts-fused", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    L, T, G = args.layers, args.t, args.group

    key = jax.random.PRNGKey(0)
    stacked = transformer.stack_init(transformer.decoder_layer_init, key, L,
                                     E, F)
    stacked = jax.tree.map(jnp.asarray, stacked)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)

    def build(r):
        bu = r // G
        x = jax.random.normal(ks[0], (r, T, E), jnp.bfloat16)
        memory = jax.random.normal(ks[1], (bu, M, E), jnp.bfloat16)
        lens_t = np.full(r, T); lens_t[::3] = max(8, T - 100)
        lens_m = np.full(bu, M)
        if bu > 1:
            lens_m[1] = M - 128
        self_valid = jnp.arange(T)[None, :] < jnp.asarray(lens_t)[:, None]
        mem_valid = jnp.arange(M)[None, :] < jnp.asarray(lens_m)[:, None]
        w = jax.random.normal(ks[2], (r, T, E), jnp.bfloat16)
        return x, memory, self_valid, mem_valid, w

    # ---- XLA grouped path (current GRPO update) ----------------------------
    # decoder_stack dispatches to the fused kernel by default; pin the XLA
    # arms to XLA (the fused arm calls ptl.decoder_stack_fused directly)
    ptl.set_enabled(False)
    r_x = args.rollouts_xla
    x, memory, self_valid, mem_valid, w = build(r_x)

    def loss_xla(st, x_):
        mkv = transformer.precompute_memory_kv(st, memory)
        out = transformer.decoder_stack(
            st, x_, memory, nn.MaskSpec(key_valid=self_valid, causal=True),
            nn.MaskSpec(key_valid=mem_valid), H, 0.0, None, True,
            remat=True, mem_kv=mkv, cross_group=G)
        return jnp.sum((out * w).astype(jnp.float32))

    g_xla = jax.jit(jax.value_and_grad(loss_xla, argnums=(0,)))

    # ---- fused path: per-rollout mem_kv rows -------------------------------
    r_f = args.rollouts_fused
    xf, memf, self_validf, mem_validf, wf = build(r_f)

    def loss_fused(st, x_):
        mkv = transformer.precompute_memory_kv(st, memf)   # (L, Bu, M, 2E)
        mkv = jnp.repeat(mkv, G, axis=1)                    # (L, R, M, 2E)
        mv = jnp.repeat(mem_validf, G, axis=0)
        out = ptl.decoder_stack_fused(st, x_, mkv, self_validf, mv, H)
        return jnp.sum((out * wf).astype(jnp.float32))

    g_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=(0,)))

    # ---- parity: fused vs XLA on the SAME small batch ----------------------
    def loss_xla_small(st, x_):
        mkv = transformer.precompute_memory_kv(st, memf)
        out = transformer.decoder_stack(
            st, x_, memf, nn.MaskSpec(key_valid=self_validf, causal=True),
            nn.MaskSpec(key_valid=mem_validf), H, 0.0, None, True,
            remat=True, mem_kv=mkv, cross_group=G)
        return jnp.sum((out * wf).astype(jnp.float32))

    t0 = time.perf_counter()
    lf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0,)))(stacked, xf)
    lf = float(lf)
    print(f"fused compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    lr_, gr = jax.jit(jax.value_and_grad(loss_xla_small, argnums=(0,)))(stacked, xf)
    lr_ = float(lr_)
    print(f"xla-small compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"loss fused={lf:.4f} ref={lr_:.4f} "
          f"rel={abs(lf - lr_) / (abs(lr_) + 1e-9):.2e}")
    worst = 0.0
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        worst = max(worst, float(np.abs(a32 - b32).max() / (np.abs(a32).max() + 1e-6)))
    print(f"worst grad rel-err: {worst:.3e}")

    # ---- timing -------------------------------------------------------------
    def bench(fn, xin, rows, label):
        def run(n):
            tot = jnp.float32(0)
            for _ in range(n):
                lv, _ = fn(stacked, xin)
                tot += lv
            return float(tot)
        run(2)
        t0 = time.perf_counter()
        run(args.steps)
        el = (time.perf_counter() - t0) / args.steps
        print(f"{label}: {el * 1e3:.1f} ms/grad-step "
              f"({el / rows * 1e3:.2f} ms/rollout-row)", flush=True)
        return el / rows

    per_xla = bench(g_xla, x, r_x, f"xla grouped R={r_x}")
    per_fused = bench(g_fused, xf, r_f, f"fused repeat R={r_f}")
    print(f"per-rollout speedup: {per_xla / per_fused:.2f}x")


if __name__ == "__main__":
    main()
