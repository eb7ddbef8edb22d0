"""Scheduled-sampling training-step floor model (VERDICT r2 item 2).

The decode kernels have a rigorous HBM-floor study; this is the training-step
analogue: a per-phase FLOPs + bytes ledger for the stage-2 scheduled-sampling
microbatch (B=8, img T=1024/E=768 ViT-B encoder, lmx T=256/E=1024 12-layer
decoder, reference regime — omr_teacher_force_train.py hyperparameters), a
derived floor in img/s, and the achieved fraction against the measured
128.8 ms/microbatch (62.1 img/s) and the round-2 per-kernel trace
(profile_train_step.py: enc fwd 14.9 / enc bwd 34.1 / dec fwd 6.7 x2 /
dec bwd 19.8 x2 ms).

Method (the decode study's "price every resource, take the max", kept a
strict LOWER bound):
* MXU time per phase = projection FLOPs at the measured large-GEMM rate
  (~160 TF/s at the model's projection (M, K, N)s — two-dot chained probe)
  PLUS attention-dot FLOPs at the best measured rate for the K=64 dot
  family (85.9 TF/s; see the RECORDED_ATTN note). The probe's (m, k, n) +
  (m, n, k) pair IS `_attend`'s logits-dot + out-dot pair
  (ops/pallas_train_layer.py): K=64 contractions half-fill the 128x128
  MXU, so a GEMM-only floor at 160 TF/s would be dishonest about where
  attention FLOPs can actually run. Summing proj + attn MXU time is
  correct for a bound: both serialize on the one MXU.
* The backward multiplier is explicit, not a blanket 2.5x: projections pay
  dgrad + wgrad (2x fwd); attention pays a full forward RECOMPUTE (the
  dots-saveable remat saves qkv/LN/FFN-hidden but not the (T, S) probs —
  tools/remat_ab.py; no-remat OOMs) plus the 4-dot backward (`_attend_bwd`)
  = 3x the forward's attention-dot FLOPs.
* VPU work (softmax exp, LN, GELU) is PRICED from measured in-kernel
  rates (tools/vpu_probe.py, round 5 — RECORDED_VPU; an earlier chained-XLA
  probe was HBM-bound and over-priced VMEM-resident work ~40x, which is why
  rounds 3-4 left the term out). VPU overlaps the MXU in a fused grid, so
  the FLOOR is max(mxu, hbm, vpu) per phase — still a strict lower bound —
  and mxu + vpu is additionally reported as the SERIAL CEILING (zero
  overlap). Measured phase times land between the two, which bounds the
  residual: what separates 82%-of-floor from 100% is exactly the fraction
  of the (now-measured) VPU term that fails to overlap (VERDICT r4 #3).
* floor_phase = max(mxu_t, hbm_bytes / bw, vpu_t); phases are sequential
  (each is one fused grid with a data dependence on the previous).

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
DH = 64
M_MEM = T_IMG  # decoder cross-attends the full image latent
HBM_BW = 690e9  # achieved streaming B/s (tools/narrow_lane_dma_probe.py)
MEASURED_US_MS = 128.8      # measured microbatch (tools/train_step_bench.py)
MEASURED_IMG_S = 62.1

# measured rates, v5e-1 (refreshed by --measure), two-dot chained probe.
# projection GEMMs at the phase's dominant (M, K, N):
RECORDED_GEMM = {
    (8192, 768, 3072): 163.4,    # encoder projections/FF (B*T_IMG rows)
    (2048, 1024, 4096): 162.0,   # decoder projections/FF (B*T_LMX rows)
    (8192, 1024, 2048): 159.8,   # mem_kv projection rows
}
# attention dot pairs at the kernel's exact shapes. The floor prices ALL
# attention FLOPs at the BEST of these (the enc pair, 85.9): the small-
# shape sequential probes are per-op-overhead-bound (a (256,64,256) dot is
# ~0.17 us of MXU time vs ~1 us of XLA per-iteration overhead), so their
# rates under-state what the hardware can do — inside a fused grid there is
# no per-op overhead, and a floor must use the highest demonstrated rate
# for the dot family (K=64 half-fills the 128x128 MXU, capping the family
# at ~half the ~163 TF/s projection rate; 85.9 is right at that cap).
RECORDED_ATTN = {
    (1024, 64, 1024): 85.9,   # encoder self (T_IMG, DH, T_IMG)
    (256, 64, 256): 16.9,     # decoder self (T_LMX, DH, T_LMX)
    (256, 64, 1024): 43.3,    # decoder cross (T_LMX, DH, M_MEM)
}
# measured per-kernel times, round-2 trace (docs/PERF.md; ms)
MEASURED_PHASE = {"enc_fwd": 14.9, "enc_bwd": 34.1, "dec_fwd_pass1": 6.7,
                  "dec_fwd_pass2": 6.7, "dec_bwd_pass1": 19.8,
                  "dec_bwd_pass2": 19.8}

# measured v5e VPU rates on VMEM-resident data (tools/vpu_probe.py, round 5;
# Gelem/s for one full workload pass at the backward's recompute shapes).
# The earlier chained-XLA probe was HBM-bound and over-priced VPU work ~40x
# (see the "VPU work is left UNPRICED" note above) — these come from an
# in-kernel fori_loop over a resident block, fixed costs differenced out.
RECORDED_VPU = {
    "softmax": 270.0,  # 264-274 at (256-1024, 1024) blocks
    "ln": 293.0,       # 293-317
    "gelu": 55.8,      # 55-58 — the exact-form rational-erf GELU is ~5x
                       # costlier per element than a softmax pass (the
                       # reference's torch GELU is exact-erf; parity keeps
                       # the form)
}


def vpu_seconds(rates=None):
    """Per-phase VPU element-pass time (seconds) for the SS microbatch.

    Counts every softmax/LN/GELU pass the fused kernels execute, including
    the backward's remat recomputes (dots-saveable policy: probs and GELU
    are recomputed in bwd) and the dsoftmax/dGELU elementwise backward
    passes. VPU work overlaps the MXU in a fused grid, so the FLOOR stays
    max(mxu, hbm, vpu); mxu + vpu is reported as the SERIAL CEILING — the
    no-overlap bound the measured step must beat for the overlap story to
    hold (VERDICT r4 weak #2: the dec-bwd residual was attributed to VPU
    recompute without a measured term; this prices it)."""
    r = rates or RECORDED_VPU
    sm, ln, ge = (r["softmax"] * 1e9, r["ln"] * 1e9, r["gelu"] * 1e9)
    enc_sm = B * H_ENC * L_ENC * T_IMG * T_IMG
    dec_sm = B * H_DEC * L_DEC * (T_LMX * T_LMX + T_LMX * M_MEM)
    enc_ln = 2 * L_ENC * B * T_IMG * E_ENC
    dec_ln = 3 * L_DEC * B * T_LMX * E_DEC
    enc_ge = L_ENC * B * T_IMG * F_ENC
    dec_ge = L_DEC * B * T_LMX * F_DEC
    # fwd: softmax + LN + GELU, plus the phi = exp(-u^2/2) pass the kernels
    # compute to SAVE the GELU derivative for the backward (priced at the
    # softmax-class exp rate)
    fwd_enc = enc_sm / sm + enc_ln / ln + enc_ge / ge + enc_ge / sm
    fwd_dec = dec_sm / sm + dec_ln / ln + dec_ge / ge + dec_ge / sm
    # bwd (saves-aware — ops/pallas_train_layer.py): softmax is RECOMPUTED
    # (probs aren't saved) + one dsoftmax pass; LN backward ~2 LN-class
    # passes; GELU backward multiplies the SAVED derivative (one cheap
    # LN-class pass, NOT an erf recompute)
    bwd_enc = 2.0 * enc_sm / sm + 2.0 * enc_ln / ln + enc_ge / ln
    bwd_dec = 2.0 * dec_sm / sm + 2.0 * dec_ln / ln + dec_ge / ln
    return {"enc_fwd": fwd_enc, "enc_bwd": bwd_enc,
            "dec_fwd_pass1": fwd_dec, "dec_fwd_pass2": fwd_dec,
            "dec_bwd_pass1": bwd_dec, "dec_bwd_pass2": bwd_dec,
            "mem_kv": 0.0}


def gemm_flops(m, k, n):
    return 2.0 * m * k * n


def attn_fwd_flops(t, s):
    # per head-instance: logits dot + out dot
    return 2.0 * (2.0 * t * s * DH)


def enc_layer_proj_flops():
    rows = B * T_IMG
    return (gemm_flops(rows, E_ENC, 3 * E_ENC) + gemm_flops(rows, E_ENC, E_ENC)
            + gemm_flops(rows, E_ENC, F_ENC) + gemm_flops(rows, F_ENC, E_ENC))


def dec_layer_proj_flops():
    rows = B * T_LMX
    return (gemm_flops(rows, E_DEC, 3 * E_DEC)
            + gemm_flops(rows, E_DEC, E_DEC) * 3   # self out, cross q, cross out
            + gemm_flops(rows, E_DEC, F_DEC) + gemm_flops(rows, F_DEC, E_DEC))


def mem_kv_flops():
    # cross K/V projected once per microbatch, shared across both decoder
    # passes (transformer.precompute_memory_kv)
    return L_DEC * gemm_flops(B * M_MEM, E_DEC, 2 * E_DEC)


def phase_bytes():
    """HBM bytes per phase: weights (bf16) + saved activations (bf16,
    written fwd / read bwd) + the cross-K/V reads."""
    enc_w = L_ENC * (E_ENC * 3 * E_ENC + E_ENC * E_ENC + 2 * E_ENC * F_ENC) * 2
    dec_w = L_DEC * (E_DEC * 3 * E_DEC + 3 * E_DEC * E_DEC
                     + 2 * E_DEC * F_DEC) * 2
    # fused-kernel saves per pass: x, z1..z3, h1, gelu', qkv
    # (~7E + 2F per row per layer — ops/pallas_train_layer.py saves model)
    enc_saves = L_ENC * B * T_IMG * (7 * E_ENC + 2 * F_ENC) * 2
    dec_saves = L_DEC * B * T_LMX * (7 * E_DEC + 2 * F_DEC) * 2
    mem_kv = L_DEC * B * M_MEM * 2 * E_DEC * 2      # K+V bf16, read per pass
    return {
        "enc_fwd": enc_w + enc_saves,               # weights read + saves out
        "enc_bwd": 2 * enc_w + enc_saves,           # weights + grads + saves in
        "dec_fwd": dec_w + dec_saves + mem_kv,
        "dec_bwd": 2 * dec_w + dec_saves + mem_kv,
        "mem_kv": dec_w / 6 * 3 + 3 * B * M_MEM * E_DEC * 2,  # fwd + 2x bwd
    }


def probe_gemm(m, k, n, min_tflop=30.0):
    """Chained-GEMM rate at (m, k, n): each iteration runs the (m, k, n) dot
    and an (m, n, k) feedback dot (both counted — together they are exactly
    an attention logits+out pair, and resemble a fwd+bwd contraction pair),
    the carry is the left operand (nothing is loop-invariant or sliceable
    into a smaller dot), and ``reps`` is scaled so total compute swamps the
    ~29 ms tunnel pull (docs/PERF.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    per_iter = 2 * gemm_flops(m, k, n)
    reps = max(30, int(min_tflop * 1e12 / per_iter))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)) * 0.01, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)) * 0.01, jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((n, k)) * 0.01, jnp.bfloat16)

    @jax.jit
    def chain(a, b, c):
        def body(_, acc):
            y = jnp.dot(acc, b,
                        preferred_element_type=jnp.float32).astype(acc.dtype)
            z = jnp.dot(y, c, preferred_element_type=jnp.float32)
            return acc + (z * 1e-9).astype(acc.dtype)
        return jax.lax.fori_loop(0, reps, body, a)

    float(jnp.sum(chain(a, b, c).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(a, b, c).astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return per_iter * reps / dt / 1e12


def mae_ledger(gemm, attn_rate, probe=False):
    """The MAE-pretrain-step analogue (B=64: ViT-B encoder at kept length
    128, dh=32 decoder at T=512 — masked 64-lane head-group attention
    EXECUTES 2x the nominal attention FLOPs, a Mosaic lane-slicing
    constraint priced into the practical floor like the remat recompute).
    Measured step: 162.2 ms (394.5 img/s, tools/train_step_bench.py mae);
    measured decoder grad pass: 80.4 ms (tools/fused_enc_ab.py --mae-dec).
    """
    Bm, keep = 64, 128
    dT, dE, dH, dF, dL = 512, 512, 16, 3072, 8
    enc_rows, dec_rows = Bm * keep, Bm * dT
    enc_rate = gemm[(8192, 768, 3072)] * 1e12
    dec_shape = (8192, 512, 3072)
    if probe:
        gemm[dec_shape] = round(probe_gemm(*dec_shape), 1)
    dec_rate = gemm.get(dec_shape, 160.0) * 1e12

    enc_proj = L_ENC * (
        gemm_flops(enc_rows, E_ENC, 3 * E_ENC)
        + gemm_flops(enc_rows, E_ENC, E_ENC)
        + 2 * gemm_flops(enc_rows, E_ENC, F_ENC))
    dec_proj = dL * (gemm_flops(dec_rows, dE, 3 * dE)
                     + gemm_flops(dec_rows, dE, dE)
                     + 2 * gemm_flops(dec_rows, dE, dF))
    # per head-instance attention dots; decoder executes gs=2 groups at
    # 64 lanes (dh=32) => 2x the nominal dot FLOPs
    enc_attn = Bm * H_ENC * L_ENC * 2.0 * (2.0 * keep * keep * 64)
    dec_attn_exec = 2.0 * Bm * dH * dL * 2.0 * (2.0 * dT * dT * 32)

    enc_w = L_ENC * (E_ENC * 3 * E_ENC + E_ENC * E_ENC
                     + 2 * E_ENC * F_ENC) * 2
    dec_w = dL * (dE * 3 * dE + dE * dE + 2 * dE * dF) * 2
    enc_saves = L_ENC * enc_rows * (7 * E_ENC + 2 * F_ENC) * 2
    dec_saves = dL * dec_rows * (7 * dE + 2 * dF) * 2

    phases = {
        "enc_fwd": (enc_proj / enc_rate + enc_attn / attn_rate,
                    enc_w + enc_saves),
        "enc_bwd": (2 * enc_proj / enc_rate + 3 * enc_attn / attn_rate,
                    2 * enc_w + enc_saves),
        "dec_fwd": (dec_proj / dec_rate + dec_attn_exec / attn_rate,
                    dec_w + dec_saves),
        "dec_bwd": (2 * dec_proj / dec_rate + 3 * dec_attn_exec / attn_rate,
                    2 * dec_w + dec_saves),
    }
    ledger, floor_s = {}, 0.0
    for name, (mxu_t, byts) in phases.items():
        t = max(mxu_t, byts / HBM_BW)
        floor_s += t
        ledger[name] = {"floor_ms": round(t * 1e3, 2),
                        "mxu_ms": round(mxu_t * 1e3, 2),
                        "hbm_ms": round(byts / HBM_BW * 1e3, 2),
                        "bound": "mxu" if mxu_t >= byts / HBM_BW
                                 else "memory"}
    measured_ms, dec_grad_measured = 162.2, 80.4
    dec_floor = (ledger["dec_fwd"]["floor_ms"]
                 + ledger["dec_bwd"]["floor_ms"])
    # glue (embed, unshuffle gathers, masked-pixel loss, optimizer) carried
    # as measured: total minus the two traced stacks' measured times is not
    # available per-phase for the encoder, so glue here = measured - floor
    # phases is NOT used; report the kernel-phase fractions instead.
    out = {
        "phases": ledger,
        "floor_ms_kernels": round(floor_s * 1e3, 1),
        "measured_ms": measured_ms,
        "measured_img_per_s": 394.5,
        "dec_grad_floor_ms": round(dec_floor, 1),
        "dec_grad_measured_ms": dec_grad_measured,
        "dec_grad_achieved": round(dec_floor / dec_grad_measured, 3),
        "kernels_floor_of_measured_step": round(floor_s * 1e3 / measured_ms,
                                                3),
        "note": ("dec attention priced at the EXECUTED 2x masked-group "
                 "FLOPs (dh=32 -> 64-lane pairs); nominal-FLOP floor "
                 "would be lower but is not achievable on this chip's "
                 "64-lane slicing floor"),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="refresh the per-shape rates on-chip")
    ap.add_argument("--mae", action="store_true",
                    help="emit the MAE-pretrain-step ledger instead")
    args = ap.parse_args()

    gemm = dict(RECORDED_GEMM)
    attn = dict(RECORDED_ATTN)
    if args.mae:
        print(json.dumps(mae_ledger(gemm, max(attn.values()) * 1e12,
                                    probe=args.measure)))
        return
    if args.measure:
        for shape in list(gemm):
            gemm[shape] = round(probe_gemm(*shape), 1)
        for shape in list(attn):
            attn[shape] = round(probe_gemm(*shape), 1)

    enc_rate = gemm[(8192, 768, 3072)] * 1e12
    dec_rate = gemm[(2048, 1024, 4096)] * 1e12
    mkv_rate = gemm[(8192, 1024, 2048)] * 1e12
    # best demonstrated rate for the K=64 attention-dot family (see the
    # RECORDED_ATTN note) — used for every attention term in the floor
    attn_rate = max(attn.values()) * 1e12
    enc_attn_rate = dself_rate = dcross_rate = attn_rate

    n_attn_enc = B * H_ENC * L_ENC
    n_attn_dec = B * H_DEC * L_DEC
    enc_proj = L_ENC * enc_layer_proj_flops()
    dec_proj = L_DEC * dec_layer_proj_flops()
    enc_attn_f = n_attn_enc * attn_fwd_flops(T_IMG, T_IMG)
    dself_f = n_attn_dec * attn_fwd_flops(T_LMX, T_LMX)
    dcross_f = n_attn_dec * attn_fwd_flops(T_LMX, M_MEM)
    by = phase_bytes()

    # (proj seconds, attn seconds, hbm bytes); bwd: proj x2, attn x3
    dec_attn_fwd_t = dself_f / dself_rate + dcross_f / dcross_rate
    phases = {
        "enc_fwd": (enc_proj / enc_rate, enc_attn_f / enc_attn_rate,
                    by["enc_fwd"]),
        "enc_bwd": (2 * enc_proj / enc_rate, 3 * enc_attn_f / enc_attn_rate,
                    by["enc_bwd"]),
    }
    for p in ("pass1", "pass2"):
        phases[f"dec_fwd_{p}"] = (dec_proj / dec_rate, dec_attn_fwd_t,
                                  by["dec_fwd"])
        phases[f"dec_bwd_{p}"] = (2 * dec_proj / dec_rate, 3 * dec_attn_fwd_t,
                                  by["dec_bwd"])
    phases["mem_kv"] = (3 * mem_kv_flops() / mkv_rate, 0.0, by["mem_kv"])

    vpu = vpu_seconds()
    ledger, floor_s = {}, 0.0
    for name, (proj_t, at, byts) in phases.items():
        mxu_t = proj_t + at
        vpu_t = vpu.get(name, 0.0)
        t = max(mxu_t, byts / HBM_BW, vpu_t)
        serial = mxu_t + vpu_t          # no-overlap ceiling for the phase
        floor_s += t
        row = {"floor_ms": round(t * 1e3, 2),
               "proj_ms": round(proj_t * 1e3, 2),
               "attn_ms": round(at * 1e3, 2),
               "vpu_ms": round(vpu_t * 1e3, 2),
               "serial_mxu_vpu_ms": round(serial * 1e3, 2),
               "hbm_ms": round(byts / HBM_BW * 1e3, 2),
               "bound": ("vpu" if vpu_t >= mxu_t
                         and vpu_t >= byts / HBM_BW else
                         "mxu" if mxu_t >= byts / HBM_BW else "memory")}
        if name in MEASURED_PHASE:
            row["measured_ms"] = MEASURED_PHASE[name]
            row["achieved"] = round(t * 1e3 / MEASURED_PHASE[name], 3)
            row["achieved_of_serial"] = round(
                max(serial, byts / HBM_BW) * 1e3 / MEASURED_PHASE[name], 3)
        ledger[name] = row
    # measured non-floor-modeled glue (CE loss + gather, residual stacking,
    # key splits, weight-pack casts, grad-accum add, optimizer amortized
    # over 8 microbatches): measured microbatch minus the traced kernels
    # and the mem_kv ledger line — carried as MEASURED time (like the
    # decode study's fixed epilogue), so the floor is "kernels at their
    # bound + today's glue".
    glue_ms = (MEASURED_US_MS - sum(MEASURED_PHASE.values())
               - ledger["mem_kv"]["floor_ms"])
    floor_ms = floor_s * 1e3 + glue_ms
    kernels_floor = sum(v["floor_ms"] for k, v in ledger.items()
                        if k in MEASURED_PHASE)
    kernels_measured = sum(MEASURED_PHASE.values())
    kernels_ceiling = sum(v["serial_mxu_vpu_ms"] for k, v in ledger.items()
                          if k in MEASURED_PHASE)
    out = {
        "phases": ledger,
        "glue_ms_measured": round(glue_ms, 1),
        "floor_ms": round(floor_ms, 1),
        "floor_img_per_s": round(B / (floor_ms / 1e3), 1),
        "measured_ms": MEASURED_US_MS,
        "measured_img_per_s": MEASURED_IMG_S,
        "achieved_of_floor": round(floor_ms / MEASURED_US_MS, 3),
        "kernels_achieved_of_floor": round(kernels_floor / kernels_measured, 3),
        # serial ceiling: MXU + measured-VPU with zero overlap per phase.
        # measured falling between floor (full overlap) and ceiling (none)
        # bounds the residual; ceiling/measured > 1 means the kernels beat
        # the no-overlap model (overlap is happening) — e.g. 1.17 = the
        # kernels run 17% faster than fully-serialized MXU+VPU would.
        # (Key renamed from the round-5 "kernels_measured_over_ceiling",
        # which mislabeled this exact ratio — the value is unchanged.)
        "kernels_serial_ceiling_ms": round(kernels_ceiling, 1),
        "kernels_ceiling_over_measured": round(
            kernels_ceiling / kernels_measured, 3),
        "vpu_rates_gelem_s": RECORDED_VPU,
        "gemm_rates_tf_s": {str(k): v for k, v in gemm.items()},
        "attn_rates_tf_s": {str(k): v for k, v in attn.items()},
        "measured_rates": bool(args.measure),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
