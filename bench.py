"""Benchmark: KV-cached LMX decode throughput (systems/sec/chip).

The north-star metric (BASELINE.json): batched KV-cached greedy decode on the
flagship 12x1024 LMX decoder with cross-attention to a 512-patch encoder
latent — the hot loop of acai-omr inference (reference:
acai_omr/models/kv_caching.py + models.py:600-615).

Workload: B systems decoded for a full ``DECODE_LEN`` tokens each with early
exit disabled (eos never matches), i.e. worst-case sequence length — a
conservative lower bound on real-workload throughput, and deterministic
across runs/weights.

``vs_baseline`` compares against the CPU reference point stored in
``bench_baseline.json`` (same program, jax CPU backend, measured once; see
that file for provenance). Prints exactly one JSON line.
"""

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 32
MEM_LEN = 512
DECODE_LEN = 512
BASELINE_PATH = Path(__file__).parent / "bench_baseline.json"
BEST_KNOWN_PATH = Path(__file__).parent / "bench_best_known.json"
# regression tripwire threshold: the axon tunnel's run-to-run variance is
# ~±5%, so a single sub-threshold reading is noise; a flagged metric that
# repeats across runs is a real regression (VERDICT r4 #6 — the bf16
# headline drifted 22.947 → 22.687 over four rounds, each step hidden
# inside the band)
REGRESSION_TOLERANCE = 0.05


def check_regressions(result: dict) -> list:
    """Names of metrics >5% below the checked-in best-known values."""
    if not BEST_KNOWN_PATH.exists():
        return []
    best = json.loads(BEST_KNOWN_PATH.read_text())
    flagged = []
    for key, best_val in best.items():
        if not isinstance(best_val, (int, float)):
            continue
        got = result.get("value") if key == "systems_per_sec" else \
            result.get(key)
        if isinstance(got, (int, float)) and \
                got < best_val * (1.0 - REGRESSION_TOLERANCE):
            flagged.append(f"{key}: {got} < best {best_val} "
                           f"(-{100 * (1 - got / best_val):.1f}%)")
    return flagged


def time_best(fn, reps: int = 2, warmups: int = 2) -> float:
    """min wall-clock of ``reps`` runs after ``warmups`` untimed runs.

    Cold-session robustness (VERDICT r3 "what's weak" #1): a fresh process
    pays persistent-compile-cache deserialization and first-dispatch setup on
    the first call, and the axon tunnel adds ±5% run-to-run variance, so a
    single once-warmed timing can read >15% low (BENCH_r03 recorded int8
    B=32 at 31.8 vs the 37.9-38.4 it re-measures warm). Two untimed warm-ups
    flush compile + setup; best-of-N keeps the headline at the kernel's real
    rate rather than the tunnel's worst draw.
    """
    for _ in range(warmups):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def build():
    from acai_omr_tpu.models import omr_decoder
    from acai_omr_tpu.models.omr_decoder import DecoderConfig

    # eos_idx=-1 never matches a generated token -> no early exit
    cfg = DecoderConfig(max_lmx_seq_len=DECODE_LEN, eos_idx=-1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.standard_normal((BATCH, MEM_LEN, cfg.hidden_dim)),
                      dtype=jnp.bfloat16)
    mem_valid = jnp.ones((BATCH, MEM_LEN), dtype=bool)
    return cfg, params, mem, mem_valid


def run_decode(cfg, params, mem, mem_valid):
    from acai_omr_tpu.models import decode as decode_lib
    seqs, lps, mask = decode_lib.generate(
        params, cfg, mem, mem_valid, max_len=DECODE_LEN,
        compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16)
    jax.block_until_ready(seqs)
    return seqs


def measure_p50_latency(cfg, params, mem, mem_valid, tokens: int = 256,
                        reps: int = 5, cache_dtype=jnp.bfloat16) -> float:
    """Single-system decode latency for a typical-length (~256 token) sequence."""
    from acai_omr_tpu.models import decode as decode_lib

    def run_one():
        s = decode_lib.generate(params, cfg, mem[:1], mem_valid[:1],
                                max_len=tokens, compute_dtype=jnp.bfloat16,
                                cache_dtype=cache_dtype)
        jax.block_until_ready(s[0])

    run_one()  # warm-up
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_one()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def measure_dp_throughput(cfg, params):
    """Multi-chip: batch-sharded decode over all devices (systems/sec total).

    ``decode.sharded_generate`` runs each device's full decode loop —
    including the monolithic Pallas kernel, which GSPMD auto-partitioning
    cannot split — under shard_map. No cross-chip traffic in the decode
    loop, so scaling is linear; reported only when more than one device is
    attached (e.g. a v5e-8 slice).
    """
    import jax.numpy as jnp
    from acai_omr_tpu.models import decode as decode_lib
    from acai_omr_tpu.parallel import mesh as mesh_lib

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev, 1)
    b = BATCH * n_dev
    rng = np.random.default_rng(1)
    mem = jnp.asarray(rng.standard_normal((b, MEM_LEN, cfg.hidden_dim)),
                      dtype=jnp.bfloat16)
    mem_valid = jnp.ones((b, MEM_LEN), dtype=bool)

    def run():
        s = decode_lib.sharded_generate(
            params, cfg, mem, mem_valid, mesh, axis=mesh_lib.DATA_AXIS,
            max_len=DECODE_LEN, compute_dtype=jnp.bfloat16,
            cache_dtype=jnp.bfloat16)
        jax.block_until_ready(s[0])

    return b / time_best(run, warmups=1)


def main():
    cfg, params, mem, mem_valid = build()
    elapsed = time_best(lambda: run_decode(cfg, params, mem, mem_valid),
                        reps=3)

    systems_per_sec = BATCH / elapsed
    tokens_per_sec = BATCH * (DECODE_LEN - 1) / elapsed
    p50_latency = measure_p50_latency(cfg, params, mem, mem_valid)

    # typical workload: real LMX systems run ~230 tokens (tests/data samples),
    # staying on the short cache segment — decode 256 tokens/system
    from acai_omr_tpu.models import decode as decode_lib
    from acai_omr_tpu.models.omr_decoder import DecoderConfig
    typ_cfg = DecoderConfig(max_lmx_seq_len=256, eos_idx=-1)

    def run_typical():
        s = decode_lib.generate(params, typ_cfg, mem, mem_valid, max_len=256,
                                compute_dtype=jnp.bfloat16,
                                cache_dtype=jnp.bfloat16)
        jax.block_until_ready(s[0])

    typical_systems_per_sec = BATCH / time_best(run_typical)

    # int8 KV-cache mode (opt-in quantized inference): fused Pallas kernels
    # keep every cache stream int8 end to end — measured ~1.5x the bf16 path
    # at these shapes. Reported separately because quantized decode is not
    # token-identical to the bf16 reference numerics.
    def run_int8():
        s = decode_lib.generate(params, cfg, mem, mem_valid, max_len=DECODE_LEN,
                                compute_dtype=jnp.bfloat16,
                                cache_dtype=jnp.int8)
        jax.block_until_ready(s[0])

    int8_systems_per_sec = BATCH / time_best(run_int8, reps=3)

    int8_p50 = measure_p50_latency(cfg, params, mem, mem_valid,
                                   cache_dtype=jnp.int8)

    # large-batch rows: weights amortize over more rows (the cache streams
    # scale with B, the 336 MB of weights do not) — the throughput-oriented
    # configs. Measured curve (511 tok, mem 512, round 3): bf16
    # 22.9/26.2/28.2/28.9 (B=32..192) and int8 38.4/42.2/44.4/44.8/45.2
    # (B=32..256), asymptote ~29 / ~45.3; B=128 is the knee. bf16 at B=256 is HBM-infeasible on a 16 GB v5e
    # (per-layer cross K/V ~12.9 GB + self caches ~6.4 GB), so that row is
    # int8-only; the B=32 arrays are dropped first for the same reason.
    del mem, mem_valid
    batch_rows = {}
    for bb in (64, 128, 192, 256):
        rngb = np.random.default_rng(2)
        memb = jnp.asarray(rngb.standard_normal((bb, MEM_LEN, cfg.hidden_dim)),
                           dtype=jnp.bfloat16)
        mvb = jnp.ones((bb, MEM_LEN), dtype=bool)

        def run_bb(cache_dtype):
            s = decode_lib.generate(params, cfg, memb, mvb, max_len=DECODE_LEN,
                                    compute_dtype=jnp.bfloat16,
                                    cache_dtype=cache_dtype)
            jax.block_until_ready(s[0])

        dtypes = ((jnp.bfloat16, f"b{bb}_systems_per_sec"),
                  (jnp.int8, f"b{bb}_int8_systems_per_sec"))
        if bb >= 256:
            dtypes = dtypes[1:]
        for dt, name in dtypes:
            batch_rows[name] = round(
                bb / time_best(lambda dt=dt: run_bb(dt), warmups=1), 2)
        del memb, mvb

    vs_baseline = None
    if BASELINE_PATH.exists():
        base = json.loads(BASELINE_PATH.read_text())
        if base.get("systems_per_sec"):
            vs_baseline = systems_per_sec / base["systems_per_sec"]

    extras = {}
    if len(jax.devices()) > 1:
        extras["dp_systems_per_sec_all_chips"] = round(
            measure_dp_throughput(cfg, params), 2)
        extras["num_devices"] = len(jax.devices())

    result = {
        "metric": "systems/sec/chip (KV-cached LMX decode, B=32, 511 tok/system, mem 512)",
        "value": round(systems_per_sec, 3),
        "unit": "systems/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "tokens_per_sec": round(tokens_per_sec, 1),
        "decode_wall_s": round(elapsed, 3),
        "p50_single_system_latency_s": round(p50_latency, 3),
        "typical_systems_per_sec_256tok": round(typical_systems_per_sec, 2),
        "int8_kv_systems_per_sec": round(int8_systems_per_sec, 2),
        "int8_p50_single_system_latency_s": round(int8_p50, 3),
        **batch_rows,
        "device": str(jax.devices()[0]),
        **extras,
    }
    regressions = check_regressions(result)
    if regressions:
        result["regressions"] = regressions
    print(json.dumps(result))


if __name__ == "__main__":
    main()
