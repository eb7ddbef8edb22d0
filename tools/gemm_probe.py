"""GEMM throughput probe at the model's training shapes: XLA vs peak.

docs/PERF.md records 34-46 TFLOP/s at (8192, 768, N) shapes vs 153 on square
giants — this re-measures with proper chaining (amortized dispatch, no
operand reuse pattern XLA could fold) to decide whether a custom matmul
kernel is worth building for the training path.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30


def bench(m, k, n, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    w = jnp.asarray(rng.standard_normal((k, n)), dtype)

    @jax.jit
    def chain(x, w):
        def body(_, acc):
            y = jnp.dot(acc, w, preferred_element_type=jnp.float32)
            # fold a reduction of ALL of y back into the carry: iterations
            # depend on each other and no output column is dead code
            return acc + (jnp.sum(y, axis=1, keepdims=True) * 1e-9).astype(dtype)
        return jax.lax.fori_loop(0, REPS, body, x)

    r = chain(x, w)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = chain(x, w)
    float(jnp.sum(r.astype(jnp.float32)))
    el = (time.perf_counter() - t0) / REPS
    tf = 2 * m * k * n / el / 1e12
    print(f"({m:5d},{k:5d},{n:5d}) {jnp.dtype(dtype).name}: "
          f"{el * 1e3:7.2f} ms -> {tf:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    for shape in [(8192, 768, 3072), (8192, 768, 768), (8192, 1024, 4096),
                  (8192, 3072, 768), (4096, 4096, 4096), (8192, 8192, 8192)]:
        bench(*shape)
