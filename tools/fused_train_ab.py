"""A/B the fused training-layer kernel vs the XLA decoder stack on TPU.

Flagship stage-2 shapes (L=12, E=1024, H=16, F=4096; B=8 images, T=256 lmx
tokens, M=1024 memory patches), bf16 compute. Checks forward parity, dropout
determinism (the interpret-mode-unsupported test), then chained fwd+bwd
timing with ONE device->host pull (docs/PERF.md measurement discipline).

Usage: python tools/fused_train_ab.py [--layers N] [--steps N] [--dropout]
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

B, T, M, E, H, F = 8, 256, 1024, 1024, 16, 4096


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dropout", action="store_true")
    ap.add_argument("--row-tile", type=int, default=None)
    args = ap.parse_args()
    L = args.layers
    rate = 0.1 if args.dropout else 0.0

    key = jax.random.PRNGKey(0)
    stacked = transformer.stack_init(transformer.decoder_layer_init, key, L,
                                     E, F)
    stacked = jax.tree.map(jnp.asarray, stacked)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, T, E), jnp.bfloat16)
    memory = jax.random.normal(ks[1], (B, M, E), jnp.bfloat16)
    lens_t = np.full(B, T); lens_t[1] = T - 17; lens_t[5] = 40
    lens_m = np.full(B, M); lens_m[2] = M - 200; lens_m[6] = 513
    self_valid = jnp.arange(T)[None, :] < jnp.asarray(lens_t)[:, None]
    mem_valid = jnp.arange(M)[None, :] < jnp.asarray(lens_m)[:, None]
    w = jax.random.normal(ks[2], (B, T, E), jnp.bfloat16)

    # transformer.decoder_stack dispatches to the fused kernel BY DEFAULT
    # (default-on since round 2) — without this the "xla" arm silently runs
    # the fused kernel too and the A/B compares fused vs fused (bit-identical
    # losses/grads gave it away). The fused arm calls ptl directly, so the
    # global disable only pins the ref.
    ptl.set_enabled(False)

    def mem_kv_of(st):
        return transformer.precompute_memory_kv(st, memory)

    def loss_ref(st, x_, rng):
        mkv = mem_kv_of(st)
        out = transformer.decoder_stack(
            st, x_, memory, nn.MaskSpec(key_valid=self_valid, causal=True),
            nn.MaskSpec(key_valid=mem_valid), H, rate, rng,
            rate == 0.0, remat="dots", mem_kv=mkv)
        return jnp.sum((out * w).astype(jnp.float32))

    def loss_fused(st, x_, rng):
        mkv = mem_kv_of(st)
        out = ptl.decoder_stack_fused(st, x_, mkv, self_valid, mem_valid, H,
                                      dropout_rate=rate, rng=rng,
                                      deterministic=rate == 0.0,
                                      row_tile=args.row_tile)
        return jnp.sum((out * w).astype(jnp.float32))

    g_ref = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))
    g_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1)))

    rng = jax.random.PRNGKey(9)

    # ---- parity (deterministic only) --------------------------------------
    if rate == 0.0:
        t0 = time.perf_counter()
        lf, gf = g_fused(stacked, x, rng)
        lf = float(lf)
        print(f"fused compile+run: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        lr_, gr = g_ref(stacked, x, rng)
        lr_ = float(lr_)
        print(f"xla compile+run:   {time.perf_counter() - t0:.1f}s")
        print(f"loss fused={lf:.4f} ref={lr_:.4f} "
              f"rel={abs(lf - lr_) / (abs(lr_) + 1e-9):.2e}")
        rels = []
        for (pa, a), b in zip(
                jax.tree_util.tree_flatten_with_path(gr)[0][:9999],
                jax.tree_util.tree_leaves(gf)):
            a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
            denom = np.abs(a32).max() + 1e-6
            rels.append((float(np.abs(a32 - b32).max() / denom),
                         jax.tree_util.keystr(pa)))
        rels.sort(reverse=True)
        print("worst grad rel-errs:")
        for r, name in rels[:5]:
            print(f"  {r:.3e}  {name}")
    else:
        # dropout determinism: same seed -> identical, diff seed -> differs
        l1, _ = g_fused(stacked, x, rng)
        l2, _ = g_fused(stacked, x, rng)
        l3, _ = g_fused(stacked, x, jax.random.PRNGKey(10))
        print(f"dropout determinism: same-seed {float(l1):.5f}=={float(l2):.5f}"
              f" diff-seed {float(l3):.5f}")
        assert float(l1) == float(l2) and float(l1) != float(l3)

    # ---- timing -----------------------------------------------------------
    def bench(fn, label):
        def run(n):
            tot = jnp.float32(0)
            r = rng
            for i in range(n):
                r, sk = jax.random.split(r)
                lv, grads = fn(stacked, x, sk)
                tot += lv
            return float(tot)  # ONE pull

        run(2)
        t0 = time.perf_counter()
        run(args.steps)
        el = (time.perf_counter() - t0) / args.steps
        print(f"{label}: {el * 1e3:.1f} ms/grad-step", flush=True)
        return el

    e_ref = bench(g_ref, "xla   fwd+bwd")
    e_fused = bench(g_fused, "fused fwd+bwd")
    print(f"speedup: {e_ref / e_fused:.2f}x")


if __name__ == "__main__":
    main()
