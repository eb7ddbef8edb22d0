"""Localize the fused-train-layer BACKWARD kernel's VMEM spill by ablation.

Compiles only the backward pallas_call (flagship shapes, bt=1) with selected
stages stubbed out, and reports compile success or the VMEM overage. The
register-allocator spill-slot line in the failure message is the signal.

Usage: python tools/bwd_vmem_probe.py {full|nocross|noself|noffn|attnonly}
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

import jax
import jax.numpy as jnp

from acai_omr_tpu.ops import transformer
from acai_omr_tpu.ops import pallas_train_layer as ptl

B = int(os.environ.get("PB", 8))
T = int(os.environ.get("PT", 256))
M = int(os.environ.get("PM", 1024))
E = int(os.environ.get("PE", 1024))
H = int(os.environ.get("PH", 16))
F = int(os.environ.get("PF", 4096))
L = int(os.environ.get("PL", 12))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    ptl.set_ablate(mode)

    key = jax.random.PRNGKey(0)
    stacked = transformer.stack_init(transformer.decoder_layer_init, key, L,
                                     E, F)
    flat_w = ptl.pack_weights(jax.tree.map(jnp.asarray, stacked), jnp.bfloat16)
    x = jnp.zeros((B * T, E), jnp.bfloat16)
    mem_kv = jnp.zeros((L, B, M, 2 * E), jnp.bfloat16)
    sbias = jnp.zeros((B, 1, T), jnp.float32)
    mbias = jnp.zeros((B, 1, M), jnp.float32)
    saved = tuple(jnp.zeros((L, B * T, E), jnp.bfloat16) for _ in range(4)) \
        + tuple(jnp.zeros((L, B * T, F), jnp.bfloat16) for _ in range(2))
    g = jnp.zeros((B * T, E), jnp.bfloat16)
    seeds = jnp.zeros((2,), jnp.int32)

    def run(xx, mkv, fw, sv, gg):
        return ptl._bwd_call(xx, mkv, sbias, mbias, fw, sv, gg,
                             seeds, num_heads=H, rate=0.0, det=True,
                             causal=True, bt=1, bt_bwd=1, interpret=False)

    try:
        jax.jit(run).lower(x, mem_kv, flat_w, saved, g).compile()
        print(f"{mode}: COMPILED OK")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        for line in msg.splitlines():
            if "Ran out of memory" in line or "spill" in line:
                print(f"{mode}: {line.strip()}")
        if "Ran out of memory" not in msg:
            print(f"{mode}: FAIL {msg.splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
