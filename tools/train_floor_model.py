"""Scheduled-sampling training-step floor model (VERDICT r2 item 2).

The decode kernels have a rigorous HBM-floor study; this is the training-step
analogue: a per-phase FLOPs + bytes ledger for the stage-2 scheduled-sampling
microbatch (B=8, img T=1024/E=768 ViT-B encoder, lmx T=256/E=1024 12-layer
decoder, reference regime — omr_teacher_force_train.py hyperparameters), a
derived floor in img/s, and the achieved fraction against the measured
128.8 ms/microbatch (62.1 img/s).

Method:
* FLOPs: analytic GEMM counts per phase (attention dots included). The
  backward is 2x the forward's GEMM FLOPs plus the dots-saveable remat
  recompute (~1x the non-dot forward work) — the EXECUTED-FLOPs multiplier
  is listed per phase, not hidden.
* ceilings: the chip's GEMM rate is SHAPE-DEPENDENT — each phase's ceiling
  is measured on-chip with a chained dot probe at that phase's dominant
  (M, K, N) (tools/gemm_probe.py method: ~157 TF/s at large square shapes,
  less at thin ones). HBM bytes use the measured streaming bandwidth
  (~690 GB/s achieved of 819 peak).
* floor_phase = max(flops / rate(shape), bytes / bw); phases are assumed
  perfectly overlapped within themselves but sequential across (they are:
  each is one fused grid or one XLA fusion chain with a data dependence on
  the previous).

Usage: python tools/train_floor_model.py [--measure] (measure = run the
on-chip shape probes; otherwise use the recorded rates). One JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# flagship stage-2 shapes (reference omr_teacher_force_train.py)
B = 8
T_IMG, E_ENC, H_ENC, F_ENC, L_ENC = 1024, 768, 12, 3072, 12
T_LMX, E_DEC, H_DEC, F_DEC, L_DEC = 256, 1024, 16, 4096, 12
M_MEM = T_IMG  # decoder cross-attends the full image latent
HBM_BW = 690e9  # achieved streaming B/s (tools/narrow_lane_dma_probe.py)

# measured GEMM ceilings (TF/s) per dominant phase shape, v5e-1, bf16 inputs
# fp32 accum — chained-dot probe (--measure refreshes these)
RECORDED_RATES = {
    # (M, K, N): TF/s
    (8192, 768, 2304): 124.0,   # encoder qkv-class GEMMs (B*T_IMG rows)
    (8192, 768, 3072): 130.0,   # encoder FF
    (2048, 1024, 3072): 93.0,   # decoder qkv (B*T_LMX rows)
    (2048, 1024, 4096): 100.0,  # decoder FF
    (2048, 4096, 1024): 100.0,  # decoder FF2 / weight-grad folds
    (1024, 1024, 1024): 60.0,   # attention-sized dots
}


def gemm_flops(m, k, n):
    return 2.0 * m * k * n


def enc_layer_fwd_flops():
    rows = B * T_IMG
    f = gemm_flops(rows, E_ENC, 3 * E_ENC)          # qkv
    f += gemm_flops(rows, E_ENC, E_ENC)             # attn out
    f += 2 * 2.0 * B * H_ENC * T_IMG * T_IMG * (E_ENC // H_ENC)  # qk^T + av
    f += gemm_flops(rows, E_ENC, F_ENC) + gemm_flops(rows, F_ENC, E_ENC)
    return f


def dec_layer_fwd_flops():
    rows = B * T_LMX
    f = gemm_flops(rows, E_DEC, 3 * E_DEC)          # self qkv
    f += gemm_flops(rows, E_DEC, E_DEC)             # self out
    f += 2 * 2.0 * B * H_DEC * T_LMX * T_LMX * (E_DEC // H_DEC)
    f += gemm_flops(rows, E_DEC, E_DEC) * 2         # cross q + cross out
    f += 2 * 2.0 * B * H_DEC * T_LMX * M_MEM * (E_DEC // H_DEC)
    f += gemm_flops(rows, E_DEC, F_DEC) + gemm_flops(rows, F_DEC, E_DEC)
    return f


def mem_kv_flops():
    # cross K/V projected once per microbatch, shared across both decoder
    # passes (transformer.precompute_memory_kv)
    return L_DEC * gemm_flops(B * M_MEM, E_DEC, 2 * E_DEC)


def phase_bytes():
    """HBM bytes per phase: weights (bf16) + saved activations (bf16,
    written fwd / read bwd) + the layer-carry traffic."""
    enc_w = L_ENC * (E_ENC * 3 * E_ENC + E_ENC * E_ENC + 2 * E_ENC * F_ENC) * 2
    dec_w = L_DEC * (E_DEC * 3 * E_DEC + 3 * E_DEC * E_DEC
                     + 2 * E_DEC * F_DEC) * 2
    # fused-kernel saves per pass: x, z1..z3, h1, gelu' (~4E + 2F per row
    # per layer — ops/pallas_train_layer.py saves_fit model)
    enc_saves = L_ENC * B * T_IMG * (4 * E_ENC + 2 * F_ENC) * 2
    dec_saves = L_DEC * B * T_LMX * (4 * E_DEC + 2 * F_DEC) * 2
    mem_kv = L_DEC * B * M_MEM * 2 * E_DEC * 2      # K+V bf16, read per pass
    return {
        "enc_fwd": enc_w + enc_saves,               # weights read + saves out
        "enc_bwd": 2 * enc_w + enc_saves,           # weights + grads + saves in
        "dec_fwd": dec_w + dec_saves + mem_kv,
        "dec_bwd": 2 * dec_w + dec_saves + mem_kv,
        "mem_kv": dec_w / 6 + B * M_MEM * E_DEC * 2,
    }


def probe_rate(m, k, n, reps=50):
    import jax
    import jax.numpy as jnp

    a = jnp.ones((m, k), jnp.bfloat16)
    b = jnp.ones((k, n), jnp.bfloat16)

    def chain(a, b):
        def body(i, acc):
            return acc + jnp.dot(a, b, preferred_element_type=jnp.float32)[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    f = jax.jit(chain)
    float(f(a, b))
    t0 = time.perf_counter()
    float(f(a, b))
    dt = time.perf_counter() - t0
    return gemm_flops(m, k, n) * reps / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="refresh the per-shape GEMM ceilings on-chip")
    args = ap.parse_args()

    rates = dict(RECORDED_RATES)
    if args.measure:
        for shape in list(rates):
            rates[shape] = round(probe_rate(*shape), 1)

    def rate_for(kind):
        if kind == "enc":
            return rates[(8192, 768, 3072)]
        if kind == "dec":
            return rates[(2048, 1024, 4096)]
        return rates[(1024, 1024, 1024)]

    enc_fwd_f = L_ENC * enc_layer_fwd_flops()
    dec_fwd_f = L_DEC * dec_layer_fwd_flops()
    by = phase_bytes()

    # Two floors per backward phase:
    # * nominal — 2x the forward's GEMM FLOPs (the textbook backward; what
    #   an infinite-memory chip would execute);
    # * practical — 2.5x: + the dots-saveable remat recompute (qkv /
    #   attention / LN redone in the backward). The recompute is FORCED by
    #   HBM capacity (the no-remat step OOMs — tools/remat_ab.py), so it
    #   belongs in the practical floor of THIS chip, not in the slack.
    phases = {
        # (fwd flops, bwd?, bytes, rate kind)
        "enc_fwd": (enc_fwd_f, False, by["enc_fwd"], "enc"),
        "enc_bwd": (enc_fwd_f, True, by["enc_bwd"], "enc"),
        "dec_fwd_pass1": (dec_fwd_f, False, by["dec_fwd"], "dec"),
        "dec_fwd_pass2": (dec_fwd_f, False, by["dec_fwd"], "dec"),
        "dec_bwd_pass1": (dec_fwd_f, True, by["dec_bwd"], "dec"),
        "dec_bwd_pass2": (dec_fwd_f, True, by["dec_bwd"], "dec"),
        "mem_kv": (mem_kv_flops(), False, by["mem_kv"], "dec"),
    }
    ledger = {}
    nominal_s = practical_s = 0.0
    for name, (fl, is_bwd, byts, kind) in phases.items():
        nom_fl = (2.0 * fl) if is_bwd else fl
        prac_fl = (2.5 * fl) if is_bwd else fl
        r = rate_for(kind) * 1e12
        t_m = byts / HBM_BW
        t_nom = max(nom_fl / r, t_m)
        t_prac = max(prac_fl / r, t_m)
        nominal_s += t_nom
        practical_s += t_prac
        ledger[name] = {"gflops_nominal": round(nom_fl / 1e9, 1),
                        "gflops_executed": round(prac_fl / 1e9, 1),
                        "mbytes": round(byts / 1e6, 1),
                        "floor_ms": round(t_prac * 1e3, 2),
                        "bound": "compute" if prac_fl / r >= t_m else "memory"}
    # measured non-floor-modeled glue (CE loss, residual stacking, key
    # splits, optimizer amortized over 8 microbatches): from the round-2
    # profile_train_step.py trace
    glue_ms = 7.0
    nominal_ms = nominal_s * 1e3 + glue_ms
    practical_ms = practical_s * 1e3 + glue_ms
    measured_ms = 128.8
    out = {
        "phases": ledger,
        "glue_ms_measured": glue_ms,
        "nominal_floor_ms": round(nominal_ms, 1),
        "nominal_floor_img_per_s": round(B / (nominal_ms / 1e3), 1),
        "practical_floor_ms": round(practical_ms, 1),
        "practical_floor_img_per_s": round(B / (practical_ms / 1e3), 1),
        "measured_ms": measured_ms,
        "measured_img_per_s": 62.1,
        "achieved_of_practical": round(practical_ms / measured_ms, 3),
        "achieved_of_nominal": round(nominal_ms / measured_ms, 3),
        "rates_tf_s": {str(k): v for k, v in rates.items()},
        "measured_rates": bool(args.measure),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
