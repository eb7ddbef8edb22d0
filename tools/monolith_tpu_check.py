"""On-TPU validation + timing for the monolithic decode kernel.

1. Token agreement vs the per-op XLA path at flagship shapes (bf16).
2. Per-step timing at cache 256/512 vs the XLA path.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from acai_omr_tpu.models import decode
from acai_omr_tpu.models.omr_decoder import DecoderConfig, init_decoder_params
from acai_omr_tpu.ops import pallas_monolith

BATCH, MEM_LEN, DECODE_LEN = 32, 512, 256


def main():
    cfg = DecoderConfig(max_lmx_seq_len=DECODE_LEN, eos_idx=-1)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.standard_normal((BATCH, MEM_LEN, cfg.hidden_dim)),
                      dtype=jnp.bfloat16)
    valid = jnp.ones((BATCH, MEM_LEN), dtype=bool)

    def run(tag, cache_dtype=jnp.bfloat16):
        t0 = time.perf_counter()
        out = decode.generate(params, cfg, mem, valid, max_len=DECODE_LEN,
                              compute_dtype=jnp.bfloat16,
                              cache_dtype=cache_dtype)
        jax.block_until_ready(out[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = decode.generate(params, cfg, mem, valid, max_len=DECODE_LEN,
                                  compute_dtype=jnp.bfloat16,
                                  cache_dtype=cache_dtype)
            jax.block_until_ready(out[0])
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(f"{tag}: wall={el:.3f}s  sys/s={BATCH/el:.2f}  "
              f"(first incl. compile {compile_s:.1f}s)", flush=True)
        return out

    pallas_monolith.set_enabled(False)
    ref = run("xla     ")
    pallas_monolith.set_enabled(True)
    mono = run("mono    ")
    mono8 = run("mono-i8 ", jnp.int8)

    a8, b8 = np.asarray(mono[0]), np.asarray(mono8[0])
    n8 = min(a8.shape[1], b8.shape[1])
    print(f"int8-vs-bf16 monolith token agreement (random weights): "
          f"{float((a8[:, :n8] == b8[:, :n8]).mean()):.4f}")

    a, b = np.asarray(ref[0]), np.asarray(mono[0])
    n = min(a.shape[1], b.shape[1])
    agree = float((a[:, :n] == b[:, :n]).mean())
    print(f"token agreement (random weights, bf16): {agree:.4f}")
    lp_a, lp_b = np.asarray(ref[1]), np.asarray(mono[1])
    print(f"logprob max|diff| on agreeing prefix rows: "
          f"{np.max(np.abs(lp_a[:, :16] - lp_b[:, :16])):.4f}")


if __name__ == "__main__":
    main()
