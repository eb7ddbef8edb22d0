"""Measure the per-microbatch cost of the fused kernels' weight packing.

The grad step re-casts the fp32 master params to bf16 kernel operands
(pack_weights / pack_weights_enc) on EVERY microbatch; under 8x gradient
accumulation the packs are loop-invariant. This times one pack of both
stacks at flagship shapes to bound the hoisting win.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from acai_omr_tpu.train import omr_teacher_force_train as tf_train
from acai_omr_tpu.models import vitomr as vitomr_lib
from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.ops import pallas_train_layer as ptl


def main():
    tok = LmxTokenizer("lmx_vocab.txt")
    cfg = tf_train.set_up_vitomr(tok)
    params = jax.tree.map(jnp.array,
                          vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg))

    dec = params["decoder"]["blocks"]
    enc = params["encoder"]["blocks"]
    n_dec = sum(x.size for x in jax.tree.leaves(dec))
    n_enc = sum(x.size for x in jax.tree.leaves(enc))
    print(f"decoder stack params: {n_dec/1e6:.1f}M  encoder stack: {n_enc/1e6:.1f}M")

    @jax.jit
    def pack_once(dec, enc):
        a = ptl.pack_weights(dec, jnp.bfloat16)
        b = ptl.pack_weights_enc(enc, jnp.bfloat16)
        return a, b

    # chain N packs -> one device pull (tunnel rule: never sync per step).
    # The carry perturbs one weight leaf before packing so each iteration
    # does fresh work (loop-invariant packs would be hoisted/DCE'd by the
    # very simplifier this probe is bounding), and the reduction feeds the
    # carry for real so nothing is dead.
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def pack_n(dec, enc, n):
        leaf_path = next(iter(sorted(dec)))  # any dense kernel subtree

        def body(c, _):
            d2 = dict(dec)
            d2[leaf_path] = jax.tree.map(
                lambda x: x + c.astype(x.dtype) * 1e-30, dec[leaf_path])
            a = ptl.pack_weights(d2, jnp.bfloat16)
            b = ptl.pack_weights_enc(enc, jnp.bfloat16)
            s = sum(jnp.sum(t[-1].astype(jnp.float32)) for t in (a, b))
            return c + s * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    r = pack_n(dec, enc, 20)
    r.block_until_ready()
    float(r)
    t0 = time.perf_counter()
    float(pack_n(dec, enc, 200))
    wall = time.perf_counter() - t0
    print(f"pack (dec+enc): {wall / 200 * 1e3:.3f} ms/pack")


if __name__ == "__main__":
    main()
