"""A/B the fused ENCODER-layer kernel vs the XLA encoder stack on TPU.

Stage-2 encoder shapes by default (L=12, E=768, H=12, F=3072; B=8 images,
T=1024 patch tokens), bf16. Forward+grad parity then chained timing with one
pull. --mae flags the MAE regime (B=64, T=128 kept tokens).

Usage: python tools/fused_enc_ab.py [--steps N] [--mae]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mae", action="store_true")
    ap.add_argument("--mae-dec", action="store_true",
                    help="MAE decoder regime: dh=32 grouped heads")
    ap.add_argument("--row-tile", type=int, default=None)
    args = ap.parse_args()
    if args.mae:
        B, T, E, H, F, L = 64, 128, 768, 12, 3072, 12
    elif args.mae_dec:
        B, T, E, H, F, L = 64, 512, 512, 16, 2048, 8
    else:
        B, T, E, H, F, L = 8, 1024, 768, 12, 3072, 12

    key = jax.random.PRNGKey(0)
    stacked = transformer.stack_init(transformer.encoder_layer_init, key, L,
                                     E, F)
    stacked = jax.tree.map(jnp.asarray, stacked)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (B, T, E), jnp.bfloat16)
    lens = np.full(B, T); lens[1] = T - 17; lens[min(5, B - 1)] = T // 4
    valid = jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None]
    w = jax.random.normal(ks[1], (B, T, E), jnp.bfloat16)

    def loss_ref(st, x_):
        out = transformer.encoder_stack(
            st, x_, nn.MaskSpec(key_valid=valid), H, 0.0, None, True,
            remat="dots")
        return jnp.sum((out * w).astype(jnp.float32))

    def loss_fused(st, x_):
        out = ptl.encoder_stack_fused(st, x_, valid, H,
                                      row_tile=args.row_tile)
        return jnp.sum((out * w).astype(jnp.float32))

    ptl.set_enabled(False)  # keep the ref on the XLA path
    g_ref = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))
    g_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1)))

    t0 = time.perf_counter()
    lf, gf = g_fused(stacked, x)
    lf = float(lf)
    print(f"fused compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    lr_, gr = g_ref(stacked, x)
    lr_ = float(lr_)
    print(f"xla compile+run:   {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"loss fused={lf:.4f} ref={lr_:.4f} "
          f"rel={abs(lf - lr_) / (abs(lr_) + 1e-9):.2e}")
    rels = []
    for (pa, a), b in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                          jax.tree_util.tree_leaves(gf)):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(a32).max() + 1e-6
        rels.append((float(np.abs(a32 - b32).max() / denom),
                     jax.tree_util.keystr(pa)))
    rels.sort(reverse=True)
    print("worst grad rel-errs:")
    for r, name in rels[:4]:
        print(f"  {r:.3e}  {name}")

    def bench(fn, label):
        def run(n):
            tot = jnp.float32(0)
            for _ in range(n):
                lv, _ = fn(stacked, x)
                tot += lv
            return float(tot)

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
