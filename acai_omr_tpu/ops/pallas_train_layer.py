"""Fused training-time decoder-layer stack: forward + backward Pallas kernels.

The scheduled-sampling training step spends ~195 of 233 ms inside six
``lax.scan`` layer stacks (docs/PERF.md per-op profile); the decoder's four
scans (two forward passes + their backwards) run 2048-row GEMMs at ~38 % MXU
because every layer iteration round-trips activations through HBM, pays the
scan's serialization, and re-materializes attention biases. This module runs
the *whole decoder stack* as one Pallas grid per pass, the training-path
analogue of the decode monolith (``pallas_monolith.py``):

* **grid = (num_layers, batch_tiles)** — layer weights (~29 MB bf16) are
  fetched once per layer and overlap the previous layer's compute; the
  hidden-state carry lives in a persistent VMEM scratch, so activations
  never touch HBM between layers.
* **Attention from the fused qkv GEMM** — one (rows, 3E) projection, then
  per-(image, head) 64-lane slices feed plain MXU dots
  (A·Bᵀ for logits, Aᵀ·B for the backward's dK/dW — all three dot forms
  lower on v5e, tools/mosaic_dot_forms_probe.py). Masks are built in-kernel
  from (B, 1, T) validity planes; no (B, H, T, T) bias is ever materialized.
* **Remat-in-kernel backward** — the forward saves only the layer inputs
  and the three pre-norm residuals (x, z1, z2, z3); the backward kernel
  re-derives qkv/probs/FFN internals in VMEM and emits dx, d(weights),
  d(mem_kv) in a single reverse sweep. Weight and weight-grad buffers are
  hand-DMA'd (single-buffered) to fit ~128 MB VMEM.
* **Hardware-PRNG dropout** — per-(layer, tile, site) seeded
  ``pltpu.prng_random_bits`` masks, regenerated bit-identically in the
  backward; no mask tensors are stored or streamed.

Semantics match :func:`acai_omr_tpu.ops.transformer.decoder_stack` with
``mem_kv`` precomputed (reference: the per-layer cross-attention projections
of acai_omr/models/kv_caching.py:227-256 and the post-norm layer order of
acai_omr/models/models.py:412-426), up to dropout stream identity.

Default-on for qualifying decoder shapes on TPU (measured 36.4 vs 55.5 ms
per flagship decoder-stack grad pass, scheduled-sampling step 235 -> 200 ms);
``ACAI_FUSED_TRAIN_LAYER=0`` opts out.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_monolith import _erf

Params = dict

NEG = -1e9
_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

_ENABLED = os.environ.get("ACAI_FUSED_TRAIN_LAYER", "1") == "1"
_FORCE = False
_INTERPRET = False

# VMEM planning: v5e capacity is 128 MB (the compiler's OOM report); ask for
# essentially all of it — this kernel is the only resident program.
_VMEM_LIMIT = int(127 * 1024 * 1024)


_ABLATE = "full"  # tools/bwd_vmem_probe.py: stub backward stages to localize VMEM


def set_ablate(mode: str) -> None:
    global _ABLATE
    _ABLATE = mode


def set_test_mode(force: bool, interpret: bool) -> None:
    global _FORCE, _INTERPRET
    _FORCE = force
    _INTERPRET = interpret


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def enabled_for(b: int, t: int, m: int, e: int, h: int) -> bool:
    """Fused path is gated to shapes the kernel's tiling supports."""
    if not (_ENABLED or _FORCE):
        return False
    if not (_on_tpu() or _FORCE):
        return False
    dh = e // h
    return (e % 128 == 0 and dh % 8 == 0 and t % 8 == 0 and m % 128 == 0
            and t >= 8 and h % 2 == 0 and 2 * dh % 128 == 0)


def fwd_vmem_fits(b: int, t: int, m: int, e: int, f: int,
                  itemsize: int = 2, cross: bool = True) -> bool:
    """Conservative VMEM model of the forward kernel: the WHOLE batch's
    hidden-state carry is VMEM-resident (the ``xc`` scratch, b*t*e), plus
    double-buffered per-layer weights and the bt-row working set
    (_pick_row_tile's budget). Shapes whose total exceeds the ~120 MB plan
    must fall back to the XLA stack — Mosaic rejected a 32-rollout GRPO
    chunk at 134 MB. Model totals WITH the double-buffered qkv save window
    and the 56 MB row-tile budget, all under the plan and all still
    compiling/running on-chip (the 62.1 img/s round-2 measurements ran
    with the window enabled): SS decoder ~111 MB, stage-2 encoder
    ~88.5 MB, MAE decoder ~77 MB, 8-rollout GRPO chunk ~107 MB."""
    bt = _pick_row_tile(b, t, m, e, f, itemsize)
    act = bt * t * (3 * e + f + 4 * e) * itemsize + bt * t * m * 4
    act += 4 * bt * t * f * itemsize
    act += 2 * bt * t * 3 * e * itemsize  # double-buffered qkv save window
    act += 2 * bt * m * 2 * e * itemsize
    resident = b * t * e * itemsize
    wpl = (4 * e * e + (2 * e * e if cross else 0) + 2 * e * f) * itemsize
    return resident + 2 * wpl + act <= 120 * 1024 * 1024


def saves_fit(b: int, t: int, e: int, f: int, nl: int,
              itemsize: int = 2) -> bool:
    """The forward saves (x, z1..z3, h1, GELU', qkv) per layer for the
    backward — nl*b*t*(7e+2f) elements of HBM. Long-sequence batches (GRPO's rollout
    updates at max_actions=1536) must stay under a budget or the fused
    dispatch falls back to the rematerializing XLA stack."""
    try:
        budget_gb = float(os.environ.get("ACAI_FUSED_SAVES_GB", "6"))
    except ValueError:
        budget_gb = 6.0
    return nl * b * t * (7 * e + 2 * f) * itemsize <= budget_gb * 2 ** 30


# ---------------------------------------------------------------------------
# weight packing
#
# Per-layer 1-D params are packed into one (L, 8, W) fp32 plane so every
# kernel input block keeps (sublane, lane) dims tile-aligned:
#   row 0: bqkv  (3E)          row 1: b1 (F)
#   row 2: [bo | boc | bqc | b2]  (4E)
#   row 3: [g1 | beta1 | g2 | beta2] (4E)    row 4: [g3 | beta3] (2E)
# ---------------------------------------------------------------------------

def _vec_width(e: int, f: int) -> int:
    w = max(3 * e, f, 4 * e)
    return ((w + 127) // 128) * 128


def _pad_to(v: jnp.ndarray, w: int) -> jnp.ndarray:
    return jnp.pad(v, ((0, 0), (0, w - v.shape[1])))


def pack_weights(stacked: Params, dt) -> tuple:
    """Stacked layer pytree -> flat kernel operands (cast to compute dtype).

    The cross-attention in_proj contributes only its q columns; the k/v
    columns act through the precomputed ``mem_kv``
    (transformer.precompute_memory_kv).
    """
    sa, ca = stacked["self_attn"], stacked["cross_attn"]
    e = sa["out"]["kernel"].shape[1]
    f = stacked["linear1"]["kernel"].shape[2]
    w = _vec_width(e, f)
    f32 = jnp.float32
    vecs = jnp.stack([
        _pad_to(sa["in_bias"].astype(f32), w),
        _pad_to(stacked["linear1"]["bias"].astype(f32), w),
        _pad_to(jnp.concatenate([
            sa["out"]["bias"], ca["out"]["bias"], ca["in_bias"][:, :e],
            stacked["linear2"]["bias"]], axis=1).astype(f32), w),
        _pad_to(jnp.concatenate([
            stacked["norm1"]["scale"], stacked["norm1"]["bias"],
            stacked["norm2"]["scale"], stacked["norm2"]["bias"]],
            axis=1).astype(f32), w),
        _pad_to(jnp.concatenate([
            stacked["norm3"]["scale"], stacked["norm3"]["bias"]],
            axis=1).astype(f32), w),
        _pad_to(jnp.zeros_like(sa["in_bias"], f32), w),
        _pad_to(jnp.zeros_like(sa["in_bias"], f32), w),
        _pad_to(jnp.zeros_like(sa["in_bias"], f32), w),
    ], axis=1)
    return (sa["in_kernel"].astype(dt), sa["out"]["kernel"].astype(dt),
            ca["in_kernel"][:, :, :e].astype(dt), ca["out"]["kernel"].astype(dt),
            stacked["linear1"]["kernel"].astype(dt),
            stacked["linear2"]["kernel"].astype(dt), vecs)


def pack_weights_enc(stacked: Params, dt) -> tuple:
    """Encoder-layer pytree -> flat kernel operands (no cross stage).

    Same 8-row ``vecs`` plane as :func:`pack_weights` with the cross slots
    zeroed; the encoder's final ``norm2`` occupies the decoder's ``norm3``
    slot (the kernel's FFN-residual LayerNorm)."""
    sa = stacked["self_attn"]
    e = sa["out"]["kernel"].shape[1]
    f = stacked["linear1"]["kernel"].shape[2]
    w = _vec_width(e, f)
    f32 = jnp.float32
    zero_e = jnp.zeros_like(stacked["norm1"]["scale"], f32)
    vecs = jnp.stack([
        _pad_to(sa["in_bias"].astype(f32), w),
        _pad_to(stacked["linear1"]["bias"].astype(f32), w),
        _pad_to(jnp.concatenate([
            sa["out"]["bias"].astype(f32), zero_e, zero_e,
            stacked["linear2"]["bias"].astype(f32)], axis=1), w),
        _pad_to(jnp.concatenate([
            stacked["norm1"]["scale"].astype(f32),
            stacked["norm1"]["bias"].astype(f32), zero_e, zero_e], axis=1), w),
        _pad_to(jnp.concatenate([
            stacked["norm2"]["scale"], stacked["norm2"]["bias"]],
            axis=1).astype(f32), w),
        _pad_to(jnp.zeros_like(sa["in_bias"], f32), w),
        _pad_to(jnp.zeros_like(sa["in_bias"], f32), w),
        _pad_to(jnp.zeros_like(sa["in_bias"], f32), w),
    ], axis=1)
    return (sa["in_kernel"].astype(dt), sa["out"]["kernel"].astype(dt),
            stacked["linear1"]["kernel"].astype(dt),
            stacked["linear2"]["kernel"].astype(dt), vecs)


# ---------------------------------------------------------------------------
# in-kernel math helpers (fp32 internals, matching ops/nn.py numerics)
# ---------------------------------------------------------------------------

def _ln_fwd(z, scale_row, bias_row, eps=1e-5):
    """z (R, E) any dtype -> (out32, zhat32, inv32); LN in fp32 like nn.layernorm."""
    z32 = z.astype(jnp.float32)
    mu = jnp.mean(z32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    zh = (z32 - mu) * inv
    return zh * scale_row + bias_row, zh, inv


def _ln_bwd(g, z, scale_row, eps=1e-5):
    """Backward of y = LN(z)*scale + bias. Returns (dz32, dscale, dbias)."""
    z32 = z.astype(jnp.float32)
    mu = jnp.mean(z32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    zh = (z32 - mu) * inv
    g32 = g.astype(jnp.float32)
    dscale = jnp.sum(g32 * zh, axis=0, keepdims=True)
    dbias = jnp.sum(g32, axis=0, keepdims=True)
    gg = g32 * scale_row
    dz = inv * (gg - jnp.mean(gg, axis=1, keepdims=True)
                - zh * jnp.mean(gg * zh, axis=1, keepdims=True))
    return dz, dscale, dbias


def _gelu_fwd(u32):
    return 0.5 * u32 * (1.0 + _erf(u32 / _SQRT2))


def _gelu_grad(u32):
    phi = jnp.exp(-0.5 * u32 * u32) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf(u32 / _SQRT2)) + u32 * phi


def _drop_mask(shape, rate: float, seeds) -> jnp.ndarray:
    """Deterministic keep-mask from the hardware PRNG; regenerated
    bit-identically in the backward pass from the same (layer, tile, site)
    seed tuple. Mosaic's prng_seed takes at most TWO i32 words, so the
    tuple is folded into (seed0, polynomial-hash of the rest) — the fwd and
    bwd kernels compute the same fold, which is all determinism needs."""
    s0 = jnp.asarray(seeds[0], jnp.int32)
    mix = jnp.int32(0)
    for s in seeds[1:]:
        mix = mix * jnp.int32(1000003) + jnp.asarray(s, jnp.int32)
    pltpu.prng_seed(s0, mix)
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(min(int(rate * 2.0 ** 32), 2 ** 32 - 1))
    return bits.astype(jnp.uint32) >= thresh


def _apply_drop(v, rate: float, seeds, deterministic: bool, *,
                img_base: int, t: int):
    """Dropout with PER-IMAGE masks: each image's keep-mask is seeded by
    (seeds..., global image index) and generated at (t, width) — independent
    of the tile decomposition, so the forward (row tile ``bt``) and backward
    (``bt_bwd``) regenerate bit-identical masks even when their tilings
    differ. (Round-4 review: the old per-TILE masks keyed on the tile index
    j and the tile's own shape, so bt != bt_bwd — the DEFAULT at flagship
    shapes — silently applied different dropout in the two passes,
    corrupting every gradient whenever dropout was active.)"""
    if deterministic or rate <= 0.0:
        return v
    n_img = v.shape[0] // t
    rows = []
    for ii in range(n_img):
        keep = _drop_mask((t, v.shape[1]), rate,
                          tuple(seeds) + (img_base + ii,))
        rows.append(jnp.where(keep, v[ii * t:(ii + 1) * t] / (1.0 - rate),
                              jnp.zeros((t, v.shape[1]), v.dtype)))
    return rows[0] if n_img == 1 else jnp.concatenate(rows, axis=0)


def _attend(q, k, v, bias32, dt, scale=None):
    """One head's attention: q (T, Dh), k/v (S, Dh), bias (T, S) fp32.

    Returns (out (T, Dh) dt, probs (T, S) fp32). ``scale`` overrides the
    1/sqrt(Dh) default — the grouped path passes full-lane (T, 128)
    operands whose true head dim is smaller."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    lg = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    lg = lg * scale + bias32
    mx = jnp.max(lg, axis=1, keepdims=True)
    ex = jnp.exp(lg - mx)
    p = ex / jnp.sum(ex, axis=1, keepdims=True)
    out = jax.lax.dot_general(p.astype(dt), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(dt), p


def _attend_bwd(dout, q, k, v, p, dt, scale=None):
    """Backward of one head's attention given saved probs ``p`` (fp32).

    dout (T, Dh) -> (dq, dk, dv) in dt. Bias is a constant mask; no grad.
    For the grouped (masked full-lane) path, ``q``/``k``/``v``/``dout``
    must each be column-masked to the head's lanes so every output grad
    lands only in those lanes."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    dp = jax.lax.dot_general(dout, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(p.astype(dt), dout, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(dt)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    ds = (ds * scale).astype(dt)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(dt)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(dt)
    return dq, dk, dv


def _group_spec(dh: int) -> tuple[int, int]:
    """(heads-per-group, group width) for the self-attention lane layout.

    dh >= 64 heads column-slice directly. Below that, Mosaic's slicing
    floor is 64-wide/64-aligned, so heads run as masked full-lane GROUPS
    (_head_col_mask): 64-lane pairs for dh=32 (2x attention FLOPs) vs
    128-lane quads (4x FLOPs) measured a WASH at MAE-decoder shapes
    (80.3 vs 80.2 ms/grad pass — the K=64 dots' half-rate MXU occupancy
    cancels the FLOP saving; tools/fused_enc_ab.py --mae-dec with
    ACAI_HEAD_GROUP_WIDTH=64/128). Default 64: same time, fewer FLOPs."""
    if (2 * dh) % 128 == 0:
        return 1, dh
    try:
        w = int(os.environ.get("ACAI_HEAD_GROUP_WIDTH", "64"))
    except ValueError:
        w = 64
    if w not in (64, 128):
        w = 64
    gs = max(1, w // dh)
    return gs, gs * dh


def _bwd_head_ilp() -> int:
    """How many consecutive attention-head backward iterations may be in
    flight before a `_chain` gate serializes on the previous group
    (ACAI_BWD_HEAD_ILP, default 1 = fully serial). The full serialization
    exists to cap the concurrent live set (Mosaic spilled ~56 MB when all
    heads scheduled together — see `_chain`); small groups trade a bounded
    live-set increase for MXU/VPU overlap between neighbouring heads."""
    try:
        v = int(os.environ.get("ACAI_BWD_HEAD_ILP", "1"))
    except ValueError:
        v = 1
    return max(1, v)


def _head_col_mask(gs: int, hh: int, dh: int, dt):
    """(1, gs*dh) 0/1 plane selecting head ``hh``'s lanes within a group.

    Heads with dh < 64 cannot be column-sliced (Mosaic has no sub-64-lane
    slicing); instead whole 128-lane head GROUPS feed full-lane MXU dots
    with the non-head lanes zeroed — zeroed k/v lanes contribute nothing
    to the contraction, so per-head logits/outputs are exact at gs× the
    attention FLOPs (the training analogue of the decode monolith's
    block-diagonal attention)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, gs * dh), 1)
    return (lanes // dh == hh).astype(dt)


def _chain(v, dep):
    """Make ``v`` data-depend on ``dep`` without changing its value.

    Mosaic has no optimization_barrier lowering; this gates ``v`` on
    ``min(|dep|, 0.0)`` — exactly +0.0 for finite inputs (NaNs would
    already poison the gradients) and not constant-foldable, so the
    scheduler must finish ``dep`` before starting consumers of ``v``.
    Used to serialize unrolled per-head attention-backward iterations,
    whose concurrent scheduling spilled ~56 MB of VMEM."""
    gate = jnp.minimum(jnp.min(jnp.abs(dep.astype(jnp.float32))), 0.0)
    return v + gate.astype(v.dtype)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_bt(a, b):
    """A @ B^T."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tb(a, b, odt=jnp.float32):
    """A^T @ B, emitted at ``odt``. Mosaic requires the matmul accumulator
    itself to be 32-bit ('Expected matmul acc to be 32-bit'), so non-fp32
    outputs are produced as an fp32 dot + cast; callers that care about the
    cast temporary's liveness serialize their chunks with ``_chain``."""
    out = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out if odt == jnp.float32 else out.astype(odt)


def _causal32(t: int) -> jnp.ndarray:
    ri = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(ri >= ci, 0.0, NEG).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, x_in, mem_kv, sbias, mbias,
                wqkv, wo, wqc, woc, w1, w2, vecs,
                out, sx, sz1, sz2, sz3, sh1, sgp, sqkv, xc,
                *, nl, nt, bt, t, m, e, f, h, dt, rate, det, causal,
                cross=True, save=True):
    l = pl.program_id(0)
    j = pl.program_id(1)
    btt = bt * t
    dh = e // h
    s0 = seed_ref[0]
    s1 = seed_ref[1]

    @pl.when(l == 0)
    def _():
        xc[pl.dslice(j * btt, btt), :] = x_in[...]

    x = xc[pl.dslice(j * btt, btt), :]
    if save:
        sx[0] = x

    bqkv = vecs[0, 0:1, :3 * e]
    bo = vecs[0, 2:3, :e]
    boc = vecs[0, 2:3, e:2 * e]
    bqc = vecs[0, 2:3, 2 * e:3 * e]
    b2 = vecs[0, 2:3, 3 * e:4 * e]
    b1 = vecs[0, 1:2, :f]
    g1 = vecs[0, 3:4, :e]
    be1 = vecs[0, 3:4, e:2 * e]
    g2 = vecs[0, 3:4, 2 * e:3 * e]
    be2 = vecs[0, 3:4, 3 * e:4 * e]
    g3 = vecs[0, 4:5, :e]
    be3 = vecs[0, 4:5, e:2 * e]

    # --- self attention ---------------------------------------------------
    qkv = (_dot(x, wqkv[0]) + bqkv).astype(dt)
    if save:
        # saved for the backward: streaming the (btt, 3E) projection back in
        # is ~30 GB/s of otherwise-idle DMA, against ~0.5 TFLOP/step of
        # recompute dots on the MXU-bound backward (see docs/PERF.md)
        sqkv[0] = qkv
    cb = _causal32(t) if causal else jnp.zeros((t, t), jnp.float32)
    gs, gw = _group_spec(dh)  # heads per lane group, group width
    scl = 1.0 / math.sqrt(dh)
    img_rows = []
    for i in range(bt):
        qkv_i = qkv[i * t:(i + 1) * t, :]
        bias_i = cb + sbias[i, 0:1, :]
        heads = []
        for g in range(h // gs):
            if gs == 1:
                o, _ = _attend(qkv_i[:, g * dh:(g + 1) * dh],
                               qkv_i[:, e + g * dh:e + (g + 1) * dh],
                               qkv_i[:, 2 * e + g * dh:2 * e + (g + 1) * dh],
                               bias_i, dt)
                heads.append(o)
                continue
            q_g = qkv_i[:, g * gw:(g + 1) * gw]
            k_g = qkv_i[:, e + g * gw:e + (g + 1) * gw]
            v_g = qkv_i[:, 2 * e + g * gw:2 * e + (g + 1) * gw]
            o_g = jnp.zeros((t, gw), jnp.float32)
            dep = None
            for hh in range(gs):
                mrow = _head_col_mask(gs, hh, dh, dt)
                k_m = k_g * mrow
                if dep is not None:
                    k_m = _chain(k_m, dep)
                o, _ = _attend(q_g, k_m, v_g * mrow, bias_i, dt, scale=scl)
                o_g = o_g + o.astype(jnp.float32)
                dep = o
            heads.append(o_g.astype(dt))
        img_rows.append(jnp.concatenate(heads, axis=1))
    a_s = jnp.concatenate(img_rows, axis=0)
    sa = (_dot(a_s, wo[0]) + bo).astype(dt)
    sa = _apply_drop(sa, rate, (s0, s1, l, 0), det, img_base=j * bt, t=t)
    z1 = x + sa
    if save:
        sz1[0] = z1
    x1_32, _, _ = _ln_fwd(z1, g1, be1)
    x1 = x1_32.astype(dt)

    # --- cross attention (decoder only) -------------------------------------
    if cross:
        qc = (_dot(x1, wqc[0]) + bqc).astype(dt)
        img_rows = []
        for i in range(bt):
            mk = mem_kv[0, i]
            bias_i = mbias[i, 0:1, :] + jnp.zeros((t, m), jnp.float32)
            heads = []
            for hh in range(h):
                o, _ = _attend(qc[i * t:(i + 1) * t, hh * dh:(hh + 1) * dh],
                               mk[:, hh * dh:(hh + 1) * dh],
                               mk[:, e + hh * dh:e + (hh + 1) * dh],
                               bias_i, dt)
                heads.append(o)
            img_rows.append(jnp.concatenate(heads, axis=1))
        a_c = jnp.concatenate(img_rows, axis=0)
        ca = (_dot(a_c, woc[0]) + boc).astype(dt)
        ca = _apply_drop(ca, rate, (s0, s1, l, 1), det, img_base=j * bt, t=t)
        z2 = x1 + ca
        if save:
            sz2[0] = z2
        x2_32, _, _ = _ln_fwd(z2, g2, be2)
        x2 = x2_32.astype(dt)
    else:
        x2 = x1

    # --- feed-forward (F-chunked). The post-dropout hidden h1 and the GELU
    # derivative are SAVED for the backward: recomputing them there (the
    # erf rational approximation expands to ~21 MB of fp32 vreg spill at
    # F=4096) was what kept the backward kernel over the 128 MB VMEM
    # budget. Chunking fwd+bwd identically keeps the per-chunk site-2
    # dropout streams consistent between the passes. ------------------------
    ff32 = jnp.zeros((btt, e), jnp.float32)
    for c0 in range(0, f, 1024):
        cw = min(1024, f - c0)
        u_c = _dot(x2, w1[0][:, c0:c0 + cw]) + b1[:, c0:c0 + cw]
        erf_c = _erf(u_c / _SQRT2)
        h1_c = (0.5 * u_c * (1.0 + erf_c)).astype(dt)
        h1_c = _apply_drop(h1_c, rate, (s0, s1, l, 2, c0 // 1024), det, img_base=j * bt, t=t)
        if save:
            phi_c = jnp.exp(-0.5 * u_c * u_c) * _INV_SQRT_2PI
            sgp[0, :, c0:c0 + cw] = \
                (0.5 * (1.0 + erf_c) + u_c * phi_c).astype(dt)
            sh1[0, :, c0:c0 + cw] = h1_c
        ff32 = ff32 + _dot(h1_c, w2[0][c0:c0 + cw, :])
    ff = (ff32 + b2).astype(dt)
    ff = _apply_drop(ff, rate, (s0, s1, l, 3), det, img_base=j * bt, t=t)
    z3 = x2 + ff
    if save:
        sz3[0] = z3
    xo_32, _, _ = _ln_fwd(z3, g3, be3)
    xo = xo_32.astype(dt)

    xc[pl.dslice(j * btt, btt), :] = xo

    @pl.when(l == nl - 1)
    def _():
        out[...] = xo


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, mem_kv, sbias, mbias,
                wqkv_h, wo_h, wqc_h, woc_h, w1_h, w2_h, vecs,
                sx, sz1, sz2, sz3, sh1, sgp, sqkv, g_in,
                dxc, dmem_kv, dwqkv_h, dwo_h, dwqc_h, dwoc_h, dw1_h,
                dw2_h, dvecs,
                wqkv, wo, wqc, woc, w1c, w2c,
                dwqkv, dwo, dwqc, dwoc, dw1, dw2, mkv, dmkv,
                sems, osems, mk_sem, dmk_sem,
                vx, vz1, vz2, vz3, vh1, vgp, vqkv, ssems, vdx, wsems,
                dx_sems,
                *, nl, nt, bt, t, m, e, f, h, dt, rate, det, causal,
                cross=True):
    l = pl.program_id(0)
    j = pl.program_id(1)
    lr = nl - 1 - l
    btt = bt * t
    dh = e // h
    s0 = seed_ref[0]
    s1 = seed_ref[1]

    # mem_kv is SINGLE-buffered by hand (Pallas windows are always
    # double-buffered; at (M, 2E) per image that is 16 MB of VMEM for the
    # in+out pair): start the fetch now, consume it in the cross stage.
    if cross:
        mk_cp = pltpu.make_async_copy(
            mem_kv.at[lr, pl.dslice(j * bt, bt)], mkv, mk_sem)
        mk_cp.start()

    # The saved activations are single-buffered by hand too: their default
    # double-buffered windows cost 12 MB of VMEM against ~6 MB single, and
    # the ~6 MB/step of fetches are trivially hidden behind ~1 ms of
    # compute. Fetches start here; each stage waits for its input at first
    # use.
    sv_pairs = [(sx, vx), (sz1, vz1)]
    if cross:
        sv_pairs.append((sz2, vz2))
    sv_pairs += [(sz3, vz3), (sh1, vh1), (sgp, vgp), (sqkv, vqkv)]
    sv_cps = []
    for idx, (hbm, vm) in enumerate(sv_pairs):
        cp = pltpu.make_async_copy(
            hbm.at[lr, pl.dslice(j * btt, btt)], vm, ssems.at[idx])
        cp.start()
        sv_cps.append(cp)
    if cross:
        cp_x, cp_z1, cp_z2, cp_z3, cp_h1, cp_gp, cp_qkv = sv_cps
    else:
        cp_x, cp_z1, cp_z3, cp_h1, cp_gp, cp_qkv = sv_cps
        cp_z2 = None

    # dx layer-carry lives in HBM (the dxc output buffer doubles as the
    # carry; its last write, at l == nl-1, IS the final dx): staged through
    # the small vdx buffer instead of keeping a (B·T, E) VMEM resident.
    dx_in_cp = pltpu.make_async_copy(
        dxc.at[pl.dslice(j * btt, btt)], vdx, dx_sems.at[0])

    @pl.when(l > 0)
    def _():
        dx_in_cp.start()

    # w1/w2 are streamed per 1024-wide F-chunk with a 2-deep pipeline
    # instead of held resident (16 MB -> 8 MB of VMEM): the FFN stage is
    # their only consumer and the refetch per tile (~16 MB against ~1 ms of
    # tile compute) hides behind the MXU.
    cw_chunks = [(c0, min(1024, f - c0)) for c0 in range(0, f, 1024)]
    ncw = len(cw_chunks)
    w_cps = {}

    def _w_start(ci):
        bi = ci % 2
        c0, cw = cw_chunks[ci]
        c1 = pltpu.make_async_copy(
            w1_h.at[lr, :, pl.dslice(c0, cw)], w1c.at[bi, :, pl.dslice(0, cw)],
            wsems.at[2 * bi])
        c2 = pltpu.make_async_copy(
            w2_h.at[lr, pl.dslice(c0, cw), :], w2c.at[bi, pl.dslice(0, cw), :],
            wsems.at[2 * bi + 1])
        c1.start()
        c2.start()
        w_cps[ci] = (c1, c2)

    if _ABLATE != "noffn":
        for ci in range(min(2, ncw)):
            _w_start(ci)

    def _acc(vm, a, b, dep=None):
        # Fold the weight-grad contribution aᵀ·b into its resident VMEM
        # accumulator in ≤(1024, 1024) chunks, UNCONDITIONALLY — the
        # buffers are zeroed in the j==0 prologue below. Predicated
        # (`pl.when(j==0)` init / `when(j>0)` add) accumulation kept every
        # chunk alive until the merged conditional regions executed:
        # 14 chunks × 4 MB ≈ the observed 63 MB of register-allocator
        # spill slots that blew the 128 MB VMEM budget. Chunks are chained
        # on one another (and on the caller-provided ``dep``) so at most
        # one 4 MB fp32 dot output is live at a time; the returned dep
        # lets callers serialize across _acc calls too.
        k, n = vm.shape
        if n >= k:
            for c0 in range(0, n, 1024):
                b_c = b[:, c0:c0 + 1024]
                if dep is not None:
                    b_c = _chain(b_c, dep)
                d = _dot_tb(a, b_c, vm.dtype)
                vm[:, c0:c0 + 1024] += d
                dep = d
        else:
            for r0 in range(0, k, 1024):
                a_c = a[:, r0:r0 + 1024]
                if dep is not None:
                    a_c = _chain(a_c, dep)
                d = _dot_tb(a_c, b, vm.dtype)
                vm[r0:r0 + 1024, :] += d
                dep = d
        return dep

    # ---- manual single-buffered weight DMA (HBM -> VMEM at each new layer)
    w_pairs = ((wqkv_h, wqkv), (wo_h, wo)) + \
        (((wqc_h, wqc), (woc_h, woc)) if cross else ())
    acc_bufs = (dwqkv, dwo, dw1, dw2) + ((dwqc, dwoc) if cross else ())

    @pl.when(j == 0)
    def _():
        for idx, (hbm, vm) in enumerate(w_pairs):
            pltpu.make_async_copy(hbm.at[lr], vm, sems.at[idx]).start()
        for idx, (hbm, vm) in enumerate(w_pairs):
            pltpu.make_async_copy(hbm.at[lr], vm, sems.at[idx]).wait()

    wqkv_v, wo_v = wqkv[...], wo[...]
    wqc_v, woc_v = (wqc[...], woc[...]) if cross else (None, None)

    @pl.when(j == 0)
    def _():
        # zero this layer's weight-grad accumulators up front so the tile
        # accumulation below can be unconditional (see _acc)
        for vm in acc_bufs:
            vm[...] = jnp.zeros(vm.shape, vm.dtype)
        dvecs[0] = jnp.zeros((8, vecs.shape[2]), jnp.float32)

    @pl.when(l > 0)
    def _():
        dx_in_cp.wait()

    g = jnp.where(l == 0, g_in[...], vdx[...])

    bqkv = vecs[0, 0:1, :3 * e]
    bqc = vecs[0, 2:3, 2 * e:3 * e]
    b1 = vecs[0, 1:2, :f]
    g1 = vecs[0, 3:4, :e]
    be1 = vecs[0, 3:4, e:2 * e]
    g2 = vecs[0, 3:4, 2 * e:3 * e]
    be2 = vecs[0, 3:4, 3 * e:4 * e]
    g3 = vecs[0, 4:5, :e]

    # NOTE on `_chain`: every recompute below (LN statistics, qkv/qc
    # projections, FFN internals) depends only on *saved refs*, so without
    # explicit ordering Mosaic's list scheduler hoists all of it to the
    # kernel entry and keeps ~60 MB of fp32 temporaries live at once
    # (measured via tools/bwd_vmem_probe.py ablations). Each stage's
    # recompute is therefore gated on the previous stage's product.

    # ---- LN3 + FFN backward ----------------------------------------------
    cp_z3.wait()
    z3 = vz3[...]
    dz3, dg3, db3 = _ln_bwd(g, z3, g3)
    dz3 = dz3.astype(dt)
    if cross:
        cp_z2.wait()
        z2 = vz2[...]
        x2_32, _, _ = _ln_fwd(_chain(z2, dz3), g2, be2)
    else:
        # encoder: the FFN sits directly on x1 = LN1(z1)
        cp_z1.wait()
        z1 = vz1[...]
        x2_32, _, _ = _ln_fwd(_chain(z1, dz3), g1, be1)
    x2 = x2_32.astype(dt)
    wdep = None  # serializes every weight-grad fold across all three stages
    if _ABLATE == "noffn":
        dx2 = dz3
        db1 = jnp.zeros((1, f), jnp.float32)
        db2 = jnp.zeros((1, e), jnp.float32)
    else:
        # F-chunked FFN backward from the forward's saved post-dropout h1
        # and GELU derivative — no erf recompute in this kernel (its
        # rational-approx temporaries were ~21 MB of vreg spill)
        dff = _apply_drop(dz3, rate, (s0, s1, lr, 3), det, img_base=j * bt, t=t)
        db2 = jnp.sum(dff.astype(jnp.float32), axis=0, keepdims=True)
        cp_h1.wait()
        cp_gp.wait()
        dx2f = jnp.zeros((btt, e), jnp.float32)
        db1_parts = []
        dep = dff
        for ci in range(ncw):
            c0, cw = cw_chunks[ci]
            bi = ci % 2
            for cp in w_cps.pop(ci):
                cp.wait()
            # strict chunk pipeline: dw2-dot -> dh1 -> du -> dw1-dot -> next
            # chunk. The dw dots' 4 MB fp32 outputs would otherwise all
            # defer to the loop end and stay live together (the FFN stage
            # was the largest spill contributor, tools/bwd_vmem_probe.py).
            h1_c = _chain(vh1[:, c0:c0 + cw], dep)
            d2 = _dot_tb(h1_c, dff, dw2.dtype)
            dw2[c0:c0 + cw, :] += d2
            dh1_c = _chain(_dot_bt(dff, w2c[bi, :cw, :]).astype(dt), d2)
            dh1_c = _apply_drop(dh1_c, rate, (s0, s1, lr, 2, ci), det, img_base=j * bt, t=t)
            du_c = (dh1_c.astype(jnp.float32)
                    * vgp[:, c0:c0 + cw].astype(jnp.float32)).astype(dt)
            dx2f = dx2f + _dot_bt(du_c, w1c[bi, :, :cw])
            d1 = _dot_tb(x2, du_c, dw1.dtype)
            dw1[:, c0:c0 + cw] += d1
            db1_parts.append(
                jnp.sum(du_c.astype(jnp.float32), axis=0, keepdims=True))
            dep = _chain(du_c, d1)
            if ci + 2 < ncw:
                _w_start(ci + 2)
        dx2 = dz3 + dx2f.astype(dt)
        db1 = jnp.concatenate(db1_parts, axis=1)
        wdep = dep

    # ---- LN2 + cross-attention backward (decoder only) --------------------
    if cross:
        dz2, dg2, db2n = _ln_bwd(dx2, _chain(z2, dx2), g2)
        dz2 = dz2.astype(dt)
        dca = _apply_drop(dz2, rate, (s0, s1, lr, 1), det, img_base=j * bt, t=t)
        cp_z1.wait()
        z1 = vz1[...]
        x1_32, _, _ = _ln_fwd(_chain(z1, dca), g1, be1)
        x1 = x1_32.astype(dt)
        qc = (_dot(x1, wqc_v) + bqc).astype(dt)
        da_c = _dot_bt(dca, woc_v).astype(dt)
        dboc = jnp.sum(dca.astype(jnp.float32), axis=0, keepdims=True)
        mk_cp.wait()
        if _ABLATE == "nocross":
            dqc = jnp.zeros((btt, e), dt)
            a_c = jnp.zeros((btt, e), dt)
            for i in range(bt):
                dmkv[i] = jnp.zeros((m, 2 * e), dt)
        else:
            dqc_rows = []
            ac_rows = []
            for i in range(bt):
                mk = mkv[i]
                bias_i = mbias[i, 0:1, :] + jnp.zeros((t, m), jnp.float32)
                dq_heads, o_heads = [], []
                pend = None  # (dk, dv) of the even head, written pairwise
                dep = None
                ilp = _bwd_head_ilp()
                for hh in range(h):
                    q_h = qc[i * t:(i + 1) * t, hh * dh:(hh + 1) * dh]
                    if dep is not None and hh % ilp == 0:
                        q_h = _chain(q_h, dep)
                    k_h = mk[:, hh * dh:(hh + 1) * dh]
                    v_h = mk[:, e + hh * dh:e + (hh + 1) * dh]
                    o, p = _attend(q_h, k_h, v_h, bias_i, dt)
                    o_heads.append(o)
                    dq_h, dk_h, dv_h = _attend_bwd(
                        da_c[i * t:(i + 1) * t, hh * dh:(hh + 1) * dh],
                        q_h, k_h, v_h, p, dt)
                    dq_heads.append(dq_h)
                    if pend is None:
                        pend = (dk_h, dv_h)
                    else:
                        # write the (M, 2·dh) head pair at a 128-lane-aligned
                        # offset NOW: holding all 16 heads' dk/dv for one big
                        # concat kept ~8 MB live through the whole loop
                        lo = (hh - 1) * dh
                        dmkv[i, :, lo:lo + 2 * dh] = jnp.concatenate(
                            [pend[0], dk_h], axis=1)
                        dmkv[i, :, e + lo:e + lo + 2 * dh] = \
                            jnp.concatenate([pend[1], dv_h], axis=1)
                        pend = None
                    dep = dv_h
                dqc_rows.append(jnp.concatenate(dq_heads, axis=1))
                ac_rows.append(jnp.concatenate(o_heads, axis=1))
            dqc = jnp.concatenate(dqc_rows, axis=0)
            a_c = jnp.concatenate(ac_rows, axis=0)
        dmk_cp = pltpu.make_async_copy(
            dmkv, dmem_kv.at[lr, pl.dslice(j * bt, bt)], dmk_sem)
        dmk_cp.start()
        wdep = _acc(dwoc, a_c, dca, dep=wdep)
        dx1 = dz2 + _dot_bt(dqc, wqc_v).astype(dt)
        wdep = _acc(dwqc, x1, dqc, dep=wdep)
        dbqc = jnp.sum(dqc.astype(jnp.float32), axis=0, keepdims=True)
    else:
        dx1 = dx2  # z1 was already loaded for the FFN's x2 recompute

    # ---- LN1 + self-attention backward -----------------------------------
    dz1, dg1, db1n = _ln_bwd(dx1, _chain(z1, dx1), g1)
    dz1 = dz1.astype(dt)
    dsa = _apply_drop(dz1, rate, (s0, s1, lr, 0), det, img_base=j * bt, t=t)
    cp_x.wait()
    x = vx[...]
    # qkv is SAVED by the forward (not recomputed): the projection dot is
    # ~0.5 TFLOP/step on an MXU-bound kernel, while the (btt, 3E) stream
    # rides DMA engines running at ~12% utilization.
    cp_qkv.wait()
    qkv = vqkv[...]
    da_s = _dot_bt(dsa, wo_v).astype(dt)
    dbo = jnp.sum(dsa.astype(jnp.float32), axis=0, keepdims=True)
    cb = _causal32(t) if causal else jnp.zeros((t, t), jnp.float32)
    if _ABLATE == "noself":
        dqkv = jnp.zeros((btt, 3 * e), dt)
        a_s = jnp.zeros((btt, e), dt)
        dqkv_rows, as_rows = None, None
    else:
        dqkv_rows = []
        as_rows = []
    gs, gw = _group_spec(dh)
    scl = 1.0 / math.sqrt(dh)
    for i in range(bt) if _ABLATE != "noself" else []:
        qkv_i = qkv[i * t:(i + 1) * t, :]
        bias_i = cb + sbias[i, 0:1, :]
        dq_heads, dk_heads, dv_heads, o_heads = [], [], [], []
        dep = None
        for g in range(h // gs):
            if gs == 1:
                q_h = qkv_i[:, g * dh:(g + 1) * dh]
                if dep is not None and g % _bwd_head_ilp() == 0:
                    q_h = _chain(q_h, dep)
                k_h = qkv_i[:, e + g * dh:e + (g + 1) * dh]
                v_h = qkv_i[:, 2 * e + g * dh:2 * e + (g + 1) * dh]
                o, p = _attend(q_h, k_h, v_h, bias_i, dt)
                o_heads.append(o)
                dq_h, dk_h, dv_h = _attend_bwd(
                    da_s[i * t:(i + 1) * t, g * dh:(g + 1) * dh],
                    q_h, k_h, v_h, p, dt)
                dq_heads.append(dq_h)
                dk_heads.append(dk_h)
                dv_heads.append(dv_h)
                dep = dv_h
                continue
            # masked full-lane head groups (see _head_col_mask): per-head
            # grads land only in that head's lanes, so group accumulation
            # is an exact disjoint-support sum.
            q_g = qkv_i[:, g * gw:(g + 1) * gw]
            k_g = qkv_i[:, e + g * gw:e + (g + 1) * gw]
            v_g = qkv_i[:, 2 * e + g * gw:2 * e + (g + 1) * gw]
            do_g = da_s[i * t:(i + 1) * t, g * gw:(g + 1) * gw]
            o_acc = jnp.zeros((t, gw), jnp.float32)
            dq_acc = jnp.zeros((t, gw), jnp.float32)
            dk_acc = jnp.zeros((t, gw), jnp.float32)
            dv_acc = jnp.zeros((t, gw), jnp.float32)
            for hh in range(gs):
                mrow = _head_col_mask(gs, hh, dh, dt)
                k_m = k_g * mrow
                if dep is not None and (g * gs + hh) % _bwd_head_ilp() == 0:
                    k_m = _chain(k_m, dep)
                q_m = q_g * mrow
                v_m = v_g * mrow
                o, p = _attend(q_g, k_m, v_m, bias_i, dt, scale=scl)
                o_acc = o_acc + o.astype(jnp.float32)
                dq_h, dk_h, dv_h = _attend_bwd(
                    do_g * mrow, q_m, k_m, v_m, p, dt, scale=scl)
                dq_acc = dq_acc + dq_h.astype(jnp.float32)
                dk_acc = dk_acc + dk_h.astype(jnp.float32)
                dv_acc = dv_acc + dv_h.astype(jnp.float32)
                dep = dv_h
            o_heads.append(o_acc.astype(dt))
            dq_heads.append(dq_acc.astype(dt))
            dk_heads.append(dk_acc.astype(dt))
            dv_heads.append(dv_acc.astype(dt))
        as_rows.append(jnp.concatenate(o_heads, axis=1))
        dqkv_rows.append(jnp.concatenate(
            dq_heads + dk_heads + dv_heads, axis=1))
    if _ABLATE != "noself":
        dqkv = jnp.concatenate(dqkv_rows, axis=0)
        a_s = jnp.concatenate(as_rows, axis=0)
    wdep = _acc(dwo, a_s, dsa, dep=wdep)
    dx = dz1 + _dot_bt(dqkv, wqkv_v).astype(dt)
    _acc(dwqkv, x, dqkv, dep=wdep)
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    vdx[...] = dx
    dx_out_cp = pltpu.make_async_copy(
        vdx, dxc.at[pl.dslice(j * btt, btt)], dx_sems.at[1])
    dx_out_cp.start()

    # ---- bias/LN-grad accumulation (weight grads were folded in above) ----
    dvecs[0, 0:1, :3 * e] += dbqkv
    dvecs[0, 1:2, :f] += db1
    dvecs[0, 2:3, :e] += dbo
    dvecs[0, 2:3, 3 * e:4 * e] += db2
    dvecs[0, 3:4, :e] += dg1
    dvecs[0, 3:4, e:2 * e] += db1n
    dvecs[0, 4:5, :e] += dg3
    dvecs[0, 4:5, e:2 * e] += db3
    if cross:
        dvecs[0, 2:3, e:2 * e] += dboc
        dvecs[0, 2:3, 2 * e:3 * e] += dbqc
        dvecs[0, 3:4, 2 * e:3 * e] += dg2
        dvecs[0, 3:4, 3 * e:4 * e] += db2n

    @pl.when(j == nt - 1)
    def _():
        d_pairs = ((dwqkv, dwqkv_h), (dwo, dwo_h), (dw1, dw1_h),
                   (dw2, dw2_h)) + \
            (((dwqc, dwqc_h), (dwoc, dwoc_h)) if cross else ())
        for idx, (vm, hbm) in enumerate(d_pairs):
            pltpu.make_async_copy(vm, hbm.at[lr], osems.at[idx]).start()
        for idx, (vm, hbm) in enumerate(d_pairs):
            pltpu.make_async_copy(vm, hbm.at[lr], osems.at[idx]).wait()

    if cross:
        dmk_cp.wait()
    dx_out_cp.wait()


# ---------------------------------------------------------------------------
# split backward kernel (two phases with disjoint save windows)
# ---------------------------------------------------------------------------

def _bwd_split_kernel(seed_ref, mem_kv, sbias, mbias,
                      wqkv_h, wo_h, wqc_h, woc_h, w1_h, w2_h, vecs,
                      sx, sz1, sz2, sz3, sh1, sgp, sqkv, g_in,
                      dxc, dmem_kv, dwqkv_h, dwo_h, dwqc_h, dwoc_h, dw1_h,
                      dw2_h, dvecs,
                      wqkv, wo, wqc, woc, w1c, w2c,
                      dwqkv, dwo, dwqc, dwoc, dw1, dw2, mkv, dmkv,
                      sems, osems, mk_sem, dmk_sem,
                      vx, vz1, vz2, vz3, vh1, vgp, vqkv, ssems, vdx, wsems,
                      dx_sems, sdx2,
                      *, nl, nt, bt, t, m, e, f, h, dt, rate, det, causal,
                      cross=True):
    """`_bwd_kernel` restructured as grid (nl, 2, nt): per layer, phase 0
    runs the FFN backward over all tiles (emitting dx2 into the whole-batch
    ``sdx2`` VMEM scratch), phase 1 runs the cross+self attention backward.

    The monolithic backward's ``_chain`` serialization exists because every
    stage's recompute depends only on saved refs, so Mosaic hoists all of it
    to the kernel entry and keeps ~60 MB of fp32 temporaries live at once
    (docs/PERF.md "training-step floor model": dec bwd ran at 68 % of its
    floor behind those VMEM-anti-spill gates). Here the phase boundary is a
    grid step — a structural barrier the scheduler cannot hoist across — so
    each phase's save window is disjoint (phase 0: z3/z2/h1/gp + w1/w2;
    phase 1: x/z1/z2/qkv + attention weights + mem_kv) and the gates inside
    a phase relax to a 2-deep FFN chunk pipeline / plain data deps. Numerics
    are identical to `_bwd_kernel` (same op order; the removed gates added
    exactly +0.0). The dx2 round trip costs btot·t·e bf16 of VMEM (~4 MB at
    flagship), not HBM."""
    l = pl.program_id(0)
    p = pl.program_id(1)
    j = pl.program_id(2)
    lr = nl - 1 - l
    btt = bt * t
    dh = e // h
    s0 = seed_ref[0]
    s1 = seed_ref[1]

    bqkv = vecs[0, 0:1, :3 * e]
    bqc = vecs[0, 2:3, 2 * e:3 * e]
    g1 = vecs[0, 3:4, :e]
    be1 = vecs[0, 3:4, e:2 * e]
    g2 = vecs[0, 3:4, 2 * e:3 * e]
    be2 = vecs[0, 3:4, 3 * e:4 * e]
    g3 = vecs[0, 4:5, :e]

    cw_chunks = [(c0, min(1024, f - c0)) for c0 in range(0, f, 1024)]
    ncw = len(cw_chunks)

    def _acc(vm, a, b, dep=None):
        # weight-grad fold into the resident accumulator, ≤(1024, 1024)
        # chunks chained so one fp32 dot output is live at a time (see
        # `_bwd_kernel._acc`)
        k, n = vm.shape
        if n >= k:
            for c0 in range(0, n, 1024):
                b_c = b[:, c0:c0 + 1024]
                if dep is not None:
                    b_c = _chain(b_c, dep)
                d = _dot_tb(a, b_c, vm.dtype)
                vm[:, c0:c0 + 1024] += d
                dep = d
        else:
            for r0 in range(0, k, 1024):
                a_c = a[:, r0:r0 + 1024]
                if dep is not None:
                    a_c = _chain(a_c, dep)
                d = _dot_tb(a_c, b, vm.dtype)
                vm[r0:r0 + 1024, :] += d
                dep = d
        return dep

    # ---- phase 0: LN3 + FFN backward --------------------------------------
    @pl.when(p == 0)
    def _():
        sv_pairs = [(sz3, vz3)]
        sv_pairs.append((sz2, vz2) if cross else (sz1, vz1))
        sv_pairs += [(sh1, vh1), (sgp, vgp)]
        sv_cps = []
        for idx, (hbm, vm) in enumerate(sv_pairs):
            cp = pltpu.make_async_copy(
                hbm.at[lr, pl.dslice(j * btt, btt)], vm, ssems.at[idx])
            cp.start()
            sv_cps.append(cp)
        dx_in_cp = pltpu.make_async_copy(
            dxc.at[pl.dslice(j * btt, btt)], vdx, dx_sems.at[0])

        @pl.when(l > 0)
        def _():
            dx_in_cp.start()

        w_cps = {}

        def _w_start(ci):
            bi = ci % 2
            c0, cw = cw_chunks[ci]
            c1 = pltpu.make_async_copy(
                w1_h.at[lr, :, pl.dslice(c0, cw)],
                w1c.at[bi, :, pl.dslice(0, cw)], wsems.at[2 * bi])
            c2 = pltpu.make_async_copy(
                w2_h.at[lr, pl.dslice(c0, cw), :],
                w2c.at[bi, pl.dslice(0, cw), :], wsems.at[2 * bi + 1])
            c1.start()
            c2.start()
            w_cps[ci] = (c1, c2)

        for ci in range(min(2, ncw)):
            _w_start(ci)

        @pl.when(j == 0)
        def _():
            dw1[...] = jnp.zeros(dw1.shape, dw1.dtype)
            dw2[...] = jnp.zeros(dw2.shape, dw2.dtype)
            dvecs[0] = jnp.zeros((8, vecs.shape[2]), jnp.float32)

        @pl.when(l > 0)
        def _():
            dx_in_cp.wait()

        g = jnp.where(l == 0, g_in[...], vdx[...])
        sv_cps[0].wait()
        z3 = vz3[...]
        dz3, dg3, db3 = _ln_bwd(g, z3, g3)
        dz3 = dz3.astype(dt)
        sv_cps[1].wait()
        if cross:
            x2_32, _, _ = _ln_fwd(vz2[...], g2, be2)
        else:
            x2_32, _, _ = _ln_fwd(vz1[...], g1, be1)
        x2 = x2_32.astype(dt)

        dff = _apply_drop(dz3, rate, (s0, s1, lr, 3), det, img_base=j * bt, t=t)
        db2 = jnp.sum(dff.astype(jnp.float32), axis=0, keepdims=True)
        sv_cps[2].wait()
        sv_cps[3].wait()
        dx2f = jnp.zeros((btt, e), jnp.float32)
        db1_parts = []
        # 2-deep chunk pipeline: chunk ci gates on chunk ci-2's products
        # (both fold dots — d1 does not depend on d2), bounding the live
        # set at two chunks while letting neighbouring chunks overlap
        prev = [None, None]
        for ci in range(ncw):
            c0, cw = cw_chunks[ci]
            bi = ci % 2
            for cp in w_cps.pop(ci):
                cp.wait()
            h1_c = vh1[:, c0:c0 + cw]
            if prev[bi] is not None:
                h1_c = _chain(_chain(h1_c, prev[bi][0]), prev[bi][1])
            d2 = _dot_tb(h1_c, dff, dw2.dtype)
            dw2[c0:c0 + cw, :] += d2
            dh1_c = _dot_bt(dff, w2c[bi, :cw, :]).astype(dt)
            dh1_c = _apply_drop(dh1_c, rate, (s0, s1, lr, 2, ci), det, img_base=j * bt, t=t)
            du_c = (dh1_c.astype(jnp.float32)
                    * vgp[:, c0:c0 + cw].astype(jnp.float32)).astype(dt)
            dx2f = dx2f + _dot_bt(du_c, w1c[bi, :, :cw])
            d1 = _dot_tb(x2, du_c, dw1.dtype)
            dw1[:, c0:c0 + cw] += d1
            db1_parts.append(
                jnp.sum(du_c.astype(jnp.float32), axis=0, keepdims=True))
            prev[bi] = (d1, d2)
            if ci + 2 < ncw:
                _w_start(ci + 2)
        dx2 = dz3 + dx2f.astype(dt)
        sdx2[pl.dslice(j * btt, btt), :] = dx2
        db1 = jnp.concatenate(db1_parts, axis=1)

        dvecs[0, 1:2, :f] += db1
        dvecs[0, 2:3, 3 * e:4 * e] += db2
        dvecs[0, 4:5, :e] += dg3
        dvecs[0, 4:5, e:2 * e] += db3

        @pl.when(j == nt - 1)
        def _():
            for idx, (vm, hbm) in enumerate(((dw1, dw1_h), (dw2, dw2_h))):
                pltpu.make_async_copy(vm, hbm.at[lr], osems.at[idx]).start()
            for idx, (vm, hbm) in enumerate(((dw1, dw1_h), (dw2, dw2_h))):
                pltpu.make_async_copy(vm, hbm.at[lr], osems.at[idx]).wait()

    # ---- phase 1: cross + self attention backward -------------------------
    @pl.when(p == 1)
    def _():
        if cross:
            mk_cp = pltpu.make_async_copy(
                mem_kv.at[lr, pl.dslice(j * bt, bt)], mkv, mk_sem)
            mk_cp.start()
        sv_pairs = [(sx, vx), (sz1, vz1)]
        if cross:
            sv_pairs.append((sz2, vz2))
        sv_pairs.append((sqkv, vqkv))
        sv_cps = []
        for idx, (hbm, vm) in enumerate(sv_pairs):
            cp = pltpu.make_async_copy(
                hbm.at[lr, pl.dslice(j * btt, btt)], vm, ssems.at[idx])
            cp.start()
            sv_cps.append(cp)

        w_pairs = ((wqkv_h, wqkv), (wo_h, wo)) + \
            (((wqc_h, wqc), (woc_h, woc)) if cross else ())
        acc_bufs = (dwqkv, dwo) + ((dwqc, dwoc) if cross else ())

        @pl.when(j == 0)
        def _():
            for idx, (hbm, vm) in enumerate(w_pairs):
                pltpu.make_async_copy(hbm.at[lr], vm, sems.at[idx]).start()
            for idx, (hbm, vm) in enumerate(w_pairs):
                pltpu.make_async_copy(hbm.at[lr], vm, sems.at[idx]).wait()
            for vm in acc_bufs:
                vm[...] = jnp.zeros(vm.shape, vm.dtype)

        wqkv_v, wo_v = wqkv[...], wo[...]
        wqc_v, woc_v = (wqc[...], woc[...]) if cross else (None, None)

        dx2 = sdx2[pl.dslice(j * btt, btt), :]
        wdep = None
        if cross:
            sv_cps[2].wait()
            z2 = vz2[...]
            dz2, dg2, db2n = _ln_bwd(dx2, z2, g2)
            dz2 = dz2.astype(dt)
            dca = _apply_drop(dz2, rate, (s0, s1, lr, 1), det, img_base=j * bt, t=t)
            sv_cps[1].wait()
            z1 = vz1[...]
            x1_32, _, _ = _ln_fwd(z1, g1, be1)
            x1 = x1_32.astype(dt)
            qc = (_dot(x1, wqc_v) + bqc).astype(dt)
            da_c = _dot_bt(dca, woc_v).astype(dt)
            dboc = jnp.sum(dca.astype(jnp.float32), axis=0, keepdims=True)
            mk_cp.wait()
            dqc_rows = []
            ac_rows = []
            for i in range(bt):
                mk = mkv[i]
                bias_i = mbias[i, 0:1, :] + jnp.zeros((t, m), jnp.float32)
                dq_heads, o_heads = [], []
                pend = None
                dep = None
                ilp = _bwd_head_ilp()
                for hh in range(h):
                    q_h = qc[i * t:(i + 1) * t, hh * dh:(hh + 1) * dh]
                    if dep is not None and hh % ilp == 0:
                        q_h = _chain(q_h, dep)
                    k_h = mk[:, hh * dh:(hh + 1) * dh]
                    v_h = mk[:, e + hh * dh:e + (hh + 1) * dh]
                    o, pr = _attend(q_h, k_h, v_h, bias_i, dt)
                    o_heads.append(o)
                    dq_h, dk_h, dv_h = _attend_bwd(
                        da_c[i * t:(i + 1) * t, hh * dh:(hh + 1) * dh],
                        q_h, k_h, v_h, pr, dt)
                    dq_heads.append(dq_h)
                    if pend is None:
                        pend = (dk_h, dv_h)
                    else:
                        lo = (hh - 1) * dh
                        dmkv[i, :, lo:lo + 2 * dh] = jnp.concatenate(
                            [pend[0], dk_h], axis=1)
                        dmkv[i, :, e + lo:e + lo + 2 * dh] = \
                            jnp.concatenate([pend[1], dv_h], axis=1)
                        pend = None
                    dep = dv_h
                dqc_rows.append(jnp.concatenate(dq_heads, axis=1))
                ac_rows.append(jnp.concatenate(o_heads, axis=1))
            dqc = jnp.concatenate(dqc_rows, axis=0)
            a_c = jnp.concatenate(ac_rows, axis=0)
            dmk_cp = pltpu.make_async_copy(
                dmkv, dmem_kv.at[lr, pl.dslice(j * bt, bt)], dmk_sem)
            dmk_cp.start()
            wdep = _acc(dwoc, a_c, dca)
            dx1 = dz2 + _dot_bt(dqc, wqc_v).astype(dt)
            wdep = _acc(dwqc, x1, dqc, dep=wdep)
            dbqc = jnp.sum(dqc.astype(jnp.float32), axis=0, keepdims=True)
        else:
            sv_cps[1].wait()
            z1 = vz1[...]
            dx1 = dx2

        dz1, dg1, db1n = _ln_bwd(dx1, z1, g1)
        dz1 = dz1.astype(dt)
        dsa = _apply_drop(dz1, rate, (s0, s1, lr, 0), det, img_base=j * bt, t=t)
        sv_cps[0].wait()
        x = vx[...]
        sv_cps[-1].wait()
        qkv = vqkv[...]
        da_s = _dot_bt(dsa, wo_v).astype(dt)
        dbo = jnp.sum(dsa.astype(jnp.float32), axis=0, keepdims=True)
        cb = _causal32(t) if causal else jnp.zeros((t, t), jnp.float32)
        dqkv_rows = []
        as_rows = []
        gs, gw = _group_spec(dh)
        scl = 1.0 / math.sqrt(dh)
        for i in range(bt):
            qkv_i = qkv[i * t:(i + 1) * t, :]
            bias_i = cb + sbias[i, 0:1, :]
            dq_heads, dk_heads, dv_heads, o_heads = [], [], [], []
            dep = None
            for gg in range(h // gs):
                if gs == 1:
                    q_h = qkv_i[:, gg * dh:(gg + 1) * dh]
                    if dep is not None and gg % _bwd_head_ilp() == 0:
                        q_h = _chain(q_h, dep)
                    k_h = qkv_i[:, e + gg * dh:e + (gg + 1) * dh]
                    v_h = qkv_i[:, 2 * e + gg * dh:2 * e + (gg + 1) * dh]
                    o, pr = _attend(q_h, k_h, v_h, bias_i, dt)
                    o_heads.append(o)
                    dq_h, dk_h, dv_h = _attend_bwd(
                        da_s[i * t:(i + 1) * t, gg * dh:(gg + 1) * dh],
                        q_h, k_h, v_h, pr, dt)
                    dq_heads.append(dq_h)
                    dk_heads.append(dk_h)
                    dv_heads.append(dv_h)
                    dep = dv_h
                    continue
                q_g = qkv_i[:, gg * gw:(gg + 1) * gw]
                k_g = qkv_i[:, e + gg * gw:e + (gg + 1) * gw]
                v_g = qkv_i[:, 2 * e + gg * gw:2 * e + (gg + 1) * gw]
                do_g = da_s[i * t:(i + 1) * t, gg * gw:(gg + 1) * gw]
                o_acc = jnp.zeros((t, gw), jnp.float32)
                dq_acc = jnp.zeros((t, gw), jnp.float32)
                dk_acc = jnp.zeros((t, gw), jnp.float32)
                dv_acc = jnp.zeros((t, gw), jnp.float32)
                for hh in range(gs):
                    mrow = _head_col_mask(gs, hh, dh, dt)
                    k_m = k_g * mrow
                    if dep is not None and (gg * gs + hh) % _bwd_head_ilp() == 0:
                        k_m = _chain(k_m, dep)
                    q_m = q_g * mrow
                    v_m = v_g * mrow
                    o, pr = _attend(q_g, k_m, v_m, bias_i, dt, scale=scl)
                    o_acc = o_acc + o.astype(jnp.float32)
                    dq_h, dk_h, dv_h = _attend_bwd(
                        do_g * mrow, q_m, k_m, v_m, pr, dt, scale=scl)
                    dq_acc = dq_acc + dq_h.astype(jnp.float32)
                    dk_acc = dk_acc + dk_h.astype(jnp.float32)
                    dv_acc = dv_acc + dv_h.astype(jnp.float32)
                    dep = dv_h
                o_heads.append(o_acc.astype(dt))
                dq_heads.append(dq_acc.astype(dt))
                dk_heads.append(dk_acc.astype(dt))
                dv_heads.append(dv_acc.astype(dt))
            as_rows.append(jnp.concatenate(o_heads, axis=1))
            dqkv_rows.append(jnp.concatenate(
                dq_heads + dk_heads + dv_heads, axis=1))
        dqkv = jnp.concatenate(dqkv_rows, axis=0)
        a_s = jnp.concatenate(as_rows, axis=0)
        wdep = _acc(dwo, a_s, dsa, dep=wdep)
        dx = dz1 + _dot_bt(dqkv, wqkv_v).astype(dt)
        _acc(dwqkv, x, dqkv, dep=wdep)
        dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

        vdx[...] = dx
        dx_out_cp = pltpu.make_async_copy(
            vdx, dxc.at[pl.dslice(j * btt, btt)], dx_sems.at[1])
        dx_out_cp.start()

        dvecs[0, 0:1, :3 * e] += dbqkv
        dvecs[0, 2:3, :e] += dbo
        dvecs[0, 3:4, :e] += dg1
        dvecs[0, 3:4, e:2 * e] += db1n
        if cross:
            dvecs[0, 2:3, e:2 * e] += dboc
            dvecs[0, 2:3, 2 * e:3 * e] += dbqc
            dvecs[0, 3:4, 2 * e:3 * e] += dg2
            dvecs[0, 3:4, 3 * e:4 * e] += db2n

        @pl.when(j == nt - 1)
        def _():
            d_pairs = ((dwqkv, dwqkv_h), (dwo, dwo_h)) + \
                (((dwqc, dwqc_h), (dwoc, dwoc_h)) if cross else ())
            for idx, (vm, hbm) in enumerate(d_pairs):
                pltpu.make_async_copy(vm, hbm.at[lr], osems.at[idx]).start()
            for idx, (vm, hbm) in enumerate(d_pairs):
                pltpu.make_async_copy(vm, hbm.at[lr], osems.at[idx]).wait()

        if cross:
            dmk_cp.wait()
        dx_out_cp.wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pick_row_tile(b: int, t: int, m: int, e: int, f: int, itemsize: int) -> int:
    """Images per grid step: largest divisor of b fitting the VMEM plan."""
    bt = b
    while bt > 1:
        # double-buffered mem_kv + activation working set (~8 arrays of
        # (bt*t, max(3e, f)) plus fp32 attention probs) + the 2-buffered
        # h1/GELU'/qkv save windows (2 × (bt·t, 2f + 3e))
        act = bt * t * (3 * e + f + e * 4) * itemsize + bt * t * m * 4
        act += 4 * bt * t * f * itemsize
        act += 2 * bt * t * 3 * e * itemsize
        memkv = 2 * bt * m * 2 * e * itemsize
        if b % bt == 0 and act + memkv < 56 * 1024 * 1024:
            break
        bt -= 1
    while b % bt:
        bt -= 1
    return bt


def _fwd_call(x, mem_kv, sbias, mbias, flat_w, seeds, *, num_heads, rate,
              det, causal, bt, bt_bwd, interpret, cross=True,
              want_saves=True):
    del bt_bwd
    bt_rows, e = x.shape
    t = sbias.shape[2]
    btot = bt_rows // t
    dt = x.dtype
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if cross:
        nl, b, m, _ = mem_kv.shape
        wqkv_w, wo_w, wqc_w, woc_w, w1_w, w2_w, vecs = flat_w
    else:
        wqkv_w, wo_w, w1_w, w2_w, vecs = flat_w
        nl = wqkv_w.shape[0]
        m = 128
        dummy = jnp.zeros((1, 8, 128), dt)
        wqc_w = woc_w = dummy
        mem_kv = jnp.zeros((1, 1, 8, 128), dt)
        mbias = jnp.zeros((1, 1, 128), jnp.float32)
    f = w1_w.shape[2]
    nt = btot // bt
    btt = bt * t
    kern = functools.partial(
        _fwd_kernel, nl=nl, nt=nt, bt=bt, t=t, m=m, e=e, f=f, h=num_heads,
        dt=dt, rate=rate, det=det, causal=causal, cross=cross,
        save=want_saves)
    w = vecs.shape[2]
    sv = want_saves
    lspec = lambda shape: pl.BlockSpec(shape, lambda l, j, *_: (l, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, nt),
        in_specs=[
            pl.BlockSpec((btt, e), lambda l, j, *_: (j, 0)),
            pl.BlockSpec((1, bt, m, 2 * e), lambda l, j, *_: (l, j, 0, 0))
            if cross else any_spec,
            pl.BlockSpec((bt, 1, t), lambda l, j, *_: (j, 0, 0)),
            pl.BlockSpec((bt, 1, m), lambda l, j, *_: (j, 0, 0))
            if cross else any_spec,
            lspec((1, e, 3 * e)),
            lspec((1, e, e)),
            lspec((1, e, e)) if cross else any_spec,
            lspec((1, e, e)) if cross else any_spec,
            lspec((1, e, f)),
            lspec((1, f, e)),
            lspec((1, 8, w)),
        ],
        out_specs=[
            pl.BlockSpec((btt, e), lambda l, j, *_: (j, 0)),
            pl.BlockSpec((1, btt, e), lambda l, j, *_: (l, j, 0))
            if sv else any_spec,
            pl.BlockSpec((1, btt, e), lambda l, j, *_: (l, j, 0))
            if sv else any_spec,
            pl.BlockSpec((1, btt, e), lambda l, j, *_: (l, j, 0))
            if (cross and sv) else any_spec,
            pl.BlockSpec((1, btt, e), lambda l, j, *_: (l, j, 0))
            if sv else any_spec,
            pl.BlockSpec((1, btt, f), lambda l, j, *_: (l, j, 0))
            if sv else any_spec,
            pl.BlockSpec((1, btt, f), lambda l, j, *_: (l, j, 0))
            if sv else any_spec,
            pl.BlockSpec((1, btt, 3 * e), lambda l, j, *_: (l, j, 0))
            if sv else any_spec,
        ],
        scratch_shapes=[pltpu.VMEM((btot * t, e), dt)],
    )
    shp = jax.ShapeDtypeStruct
    dsh = shp((1, 8, 128), dt)
    out_shapes = [
        shp((btot * t, e), dt),
        shp((nl, btot * t, e), dt) if sv else dsh,
        shp((nl, btot * t, e), dt) if sv else dsh,
        shp((nl, btot * t, e), dt) if (cross and sv) else dsh,
        shp((nl, btot * t, e), dt) if sv else dsh,
        shp((nl, btot * t, f), dt) if sv else dsh,
        shp((nl, btot * t, f), dt) if sv else dsh,
        shp((nl, btot * t, 3 * e), dt) if sv else dsh,
    ]
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seeds, x, mem_kv, sbias, mbias, wqkv_w, wo_w, wqc_w, woc_w,
      w1_w, w2_w, vecs)


# Split two-phase backward (VERDICT r3 #1's prescribed restructuring):
# BUILT, exact (tests/test_fused_train_layer.py::test_split_backward_*),
# and measured SLOWER at flagship shapes — 38.3 vs 34.9 ms/grad-step
# (fused_train_ab, v5e, bt_bwd=1) — because the phase boundary's costs
# (z1/z2 re-fetch, un-overlapped per-phase weight fetches, 2x grid steps,
# the dx2 hand-off) exceed what relaxed `_chain` scheduling buys; with
# head-ILP already measured neutral, this falsifies the "VMEM-anti-spill
# serialization idles the MXU" theory of the dec-bwd floor gap — see
# docs/PERF.md "dec-bwd ceiling" note. Default OFF; knob kept for A/Bs.
_BWD_SPLIT = os.environ.get("ACAI_BWD_SPLIT", "0") == "1"


def set_bwd_split(flag: bool) -> None:
    global _BWD_SPLIT
    _BWD_SPLIT = flag


def bwd_split_fits(b: int, t: int, e: int, f: int, m: int,
                   itemsize: int = 2, cross: bool = True,
                   bt_bwd: int = 1) -> bool:
    """The split backward adds a whole-batch (B·T, E) dx2 VMEM scratch; gate
    it to shapes where that scratch plus the union of both phases' resident
    buffers stays inside the plan (conservative; flagship SS decoder ~73 MB,
    MAE decoder ~95 MB). ``bt_bwd`` scales the per-tile buffers (the
    backward row tile from row_tile/ACAI_FUSED_BT_BWD)."""
    sdx2 = b * t * e * itemsize
    btt = bt_bwd * t
    resident = (
        sdx2
        + 4 * btt * max(e, f) * itemsize      # saved-stream buffers
        + btt * 3 * e * itemsize              # qkv save
        + 2 * btt * f * itemsize              # h1 + gp
        + 4 * e * 1024 * itemsize             # w1/w2 chunk pipeline
        + 2 * e * f * itemsize                # dw1 + dw2 accumulators
        + (6 + 6) * e * e * itemsize          # attn weights + accumulators
        + (2 * m * 2 * e * itemsize if cross else 0))  # mkv + dmkv
    return resident + 40 * 1024 * 1024 < _VMEM_LIMIT


def _bwd_call(x, mem_kv, sbias, mbias, flat_w, saved, g, seeds, *, num_heads,
              rate, det, causal, bt, bt_bwd, interpret, cross=True,
              split=False):
    bt = bt_bwd
    bt_rows, e = x.shape
    t = sbias.shape[2]
    btot = bt_rows // t
    dt = x.dtype
    if cross:
        nl, b, m, _ = mem_kv.shape
        wqkv_w, wo_w, wqc_w, woc_w, w1_w, w2_w, vecs = flat_w
        sx, sz1, sz2, sz3, sh1, sgp, sqkv = saved
    else:
        wqkv_w, wo_w, w1_w, w2_w, vecs = flat_w
        sx, sz1, sz3, sh1, sgp, sqkv = saved
        nl = wqkv_w.shape[0]
        b, m = 1, 128
        dummy = jnp.zeros((1, 8, 128), dt)
        wqc_w = woc_w = sz2 = dummy
        mem_kv = jnp.zeros((1, 1, 8, 128), dt)
        mbias = jnp.zeros((1, 1, 128), jnp.float32)
    f = w1_w.shape[2]
    nt = btot // bt
    btt = bt * t
    w = vecs.shape[2]
    kern = functools.partial(
        _bwd_split_kernel if split else _bwd_kernel,
        nl=nl, nt=nt, bt=bt, t=t, m=m, e=e, f=f, h=num_heads,
        dt=dt, rate=rate, det=det, causal=causal, cross=cross)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if split:
        # grid (nl, phase, tile): index maps see (l, p, j)
        tile_ix = lambda l, p, j, *_: j
        layer_ix = lambda l, p, j, *_: nl - 1 - l
    else:
        tile_ix = lambda l, j, *_: j
        layer_ix = lambda l, j, *_: nl - 1 - l
    dvm = pltpu.VMEM((8, 128), dt)  # dummy scratch when the stage is absent
    scratch_shapes = [
        pltpu.VMEM((e, 3 * e), dt), pltpu.VMEM((e, e), dt),
        pltpu.VMEM((e, e), dt) if cross else dvm,
        pltpu.VMEM((e, e), dt) if cross else dvm,
        # w1/w2 F-chunk staging (2-deep pipeline; see kernel)
        pltpu.VMEM((2, e, min(1024, f)), dt),
        pltpu.VMEM((2, min(1024, f), e), dt),
        # grad accumulators in compute dtype: fp32 accumulators' RMW
        # loads through vreg spill slots were the VMEM breaker
        pltpu.VMEM((e, 3 * e), dt), pltpu.VMEM((e, e), dt),
        pltpu.VMEM((e, e), dt) if cross else dvm,
        pltpu.VMEM((e, e), dt) if cross else dvm,
        pltpu.VMEM((e, f), dt), pltpu.VMEM((f, e), dt),
        pltpu.VMEM((bt, m, 2 * e), dt) if cross else pltpu.VMEM((1, 8, 128), dt),
        pltpu.VMEM((bt, m, 2 * e), dt) if cross else pltpu.VMEM((1, 8, 128), dt),
        pltpu.SemaphoreType.DMA((4,)), pltpu.SemaphoreType.DMA((6,)),
        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        # single-buffered saved-activation buffers (x, z1, z2, z3, h1, gp)
        pltpu.VMEM((btt, e), dt), pltpu.VMEM((btt, e), dt),
        pltpu.VMEM((btt, e), dt) if cross else dvm,
        pltpu.VMEM((btt, e), dt),
        pltpu.VMEM((btt, f), dt), pltpu.VMEM((btt, f), dt),
        pltpu.VMEM((btt, 3 * e), dt),
        pltpu.SemaphoreType.DMA((7,)),
        # dx staging + its in/out DMA sems + w-chunk sems
        pltpu.VMEM((btt, e), dt), pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if split:
        # whole-batch dx2 hand-off scratch between the two phases
        scratch_shapes.append(pltpu.VMEM((btot * t, e), dt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, 2, nt) if split else (nl, nt),
        in_specs=[
            any_spec,  # mem_kv: hand-DMA'd, single-buffered
            pl.BlockSpec((bt, 1, t), lambda *a: (tile_ix(*a), 0, 0)),
            pl.BlockSpec((bt, 1, m), lambda *a: (tile_ix(*a), 0, 0))
            if cross else any_spec,
            any_spec, any_spec, any_spec, any_spec, any_spec, any_spec,
            pl.BlockSpec((1, 8, w), lambda *a: (layer_ix(*a), 0, 0)),
            # saved activations: hand-DMA'd, single-buffered (see kernel)
            any_spec, any_spec, any_spec, any_spec, any_spec, any_spec,
            any_spec,
            pl.BlockSpec((btt, e), lambda *a: (tile_ix(*a), 0)),
        ],
        out_specs=[
            any_spec,  # dxc: HBM dx layer-carry, last write is the result
            any_spec,  # dmem_kv: hand-DMA'd, single-buffered
            any_spec, any_spec, any_spec, any_spec, any_spec, any_spec,
            pl.BlockSpec((1, 8, w), lambda *a: (layer_ix(*a), 0, 0)),
        ],
        scratch_shapes=scratch_shapes,
    )
    shp = jax.ShapeDtypeStruct
    dsh = shp((1, 8, 128), dt)
    out_shapes = [
        shp((btot * t, e), dt),
        shp((nl, b, m, 2 * e), dt) if cross else dsh,
        shp((nl, e, 3 * e), dt),
        shp((nl, e, e), dt),
        shp((nl, e, e), dt) if cross else dsh,
        shp((nl, e, e), dt) if cross else dsh,
        shp((nl, e, f), dt),
        shp((nl, f, e), dt),
        shp((nl, 8, w), jnp.float32),
    ]
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * (3 if split else 2),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seeds, mem_kv, sbias, mbias, wqkv_w, wo_w, wqc_w, woc_w, w1_w, w2_w,
      vecs, sx, sz1, sz2, sz3, sh1, sgp, sqkv, g)


# ---------------------------------------------------------------------------
# public API: custom-vjp fused decoder stack
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _make_fused(num_heads: int, rate: float, det: bool, causal: bool,
                bt: int, bt_bwd: int, interpret: bool, split: bool = False):
    cfg = dict(num_heads=num_heads, rate=rate, det=det, causal=causal,
               bt=bt, bt_bwd=bt_bwd, interpret=interpret)

    @jax.custom_vjp
    def fused(flat_w, x, mem_kv, sbias, mbias, seeds):
        # primal (not differentiated, e.g. eval/inference): skip the
        # saved-activation outputs and the GELU'-for-backward VPU work
        out, *_ = _fwd_call(x, mem_kv, sbias, mbias, flat_w, seeds,
                            want_saves=False, **cfg)
        return out

    def fwd(flat_w, x, mem_kv, sbias, mbias, seeds):
        out, sx, sz1, sz2, sz3, sh1, sgp, sqkv = _fwd_call(
            x, mem_kv, sbias, mbias, flat_w, seeds, **cfg)
        return out, (flat_w, x, mem_kv, sbias, mbias, seeds,
                     (sx, sz1, sz2, sz3, sh1, sgp, sqkv))

    def bwd(res, g):
        flat_w, x, mem_kv, sbias, mbias, seeds, saved = res
        (dx, dmkv, dwqkv, dwo, dwqc, dwoc, dw1, dw2, dvecs) = _bwd_call(
            x, mem_kv, sbias, mbias, flat_w, saved, g, seeds, split=split,
            **cfg)
        dflat = (dwqkv.astype(flat_w[0].dtype), dwo.astype(flat_w[1].dtype),
                 dwqc.astype(flat_w[2].dtype), dwoc.astype(flat_w[3].dtype),
                 dw1.astype(flat_w[4].dtype), dw2.astype(flat_w[5].dtype),
                 dvecs)
        return (dflat, dx, dmkv, jnp.zeros_like(sbias),
                jnp.zeros_like(mbias), jnp.zeros_like(seeds))

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=8)
def _make_fused_enc(num_heads: int, rate: float, det: bool, causal: bool,
                    bt: int, bt_bwd: int, interpret: bool,
                    split: bool = False):
    cfg = dict(num_heads=num_heads, rate=rate, det=det, causal=causal,
               bt=bt, bt_bwd=bt_bwd, interpret=interpret, cross=False)

    @jax.custom_vjp
    def fused(flat_w, x, sbias, seeds):
        out, *_ = _fwd_call(x, None, sbias, None, flat_w, seeds,
                            want_saves=False, **cfg)
        return out

    def fwd(flat_w, x, sbias, seeds):
        out, sx, sz1, _, sz3, sh1, sgp, sqkv = _fwd_call(
            x, None, sbias, None, flat_w, seeds, **cfg)
        return out, (flat_w, x, sbias, seeds, (sx, sz1, sz3, sh1, sgp, sqkv))

    def bwd(res, g):
        flat_w, x, sbias, seeds, saved = res
        (dx, _, dwqkv, dwo, _, _, dw1, dw2, dvecs) = _bwd_call(
            x, None, sbias, None, flat_w, saved, g, seeds, split=split,
            **cfg)
        dflat = (dwqkv.astype(flat_w[0].dtype), dwo.astype(flat_w[1].dtype),
                 dw1.astype(flat_w[2].dtype), dw2.astype(flat_w[3].dtype),
                 dvecs)
        return (dflat, dx, jnp.zeros_like(sbias), jnp.zeros_like(seeds))

    fused.defvjp(fwd, bwd)
    return fused


def decoder_stack_fused(stacked: Params, x: jnp.ndarray, mem_kv: jnp.ndarray,
                        self_valid: jnp.ndarray, mem_valid: jnp.ndarray,
                        num_heads: int, dropout_rate: float = 0.0,
                        rng=None, deterministic: bool = True,
                        row_tile: int | None = None) -> jnp.ndarray:
    """Fused-kernel equivalent of ``transformer.decoder_stack`` (causal
    self-attention + precomputed cross K/V), differentiable via the
    hand-written backward kernel.

    x: (B, T, E); mem_kv: (L, B, M, 2E); self_valid: (B, T) bool;
    mem_valid: (B, M) bool.
    """
    b, t, e = x.shape
    nl, _, m, _ = mem_kv.shape
    dt = x.dtype
    flat_w = pack_weights(stacked, dt)
    f = flat_w[4].shape[2]
    sbias = jnp.where(self_valid, 0.0, NEG).astype(jnp.float32)[:, None, :]
    mbias = jnp.where(mem_valid, 0.0, NEG).astype(jnp.float32)[:, None, :]
    det = deterministic or dropout_rate <= 0.0
    if det:
        seeds = jnp.zeros((2,), jnp.int32)
    else:
        data = rng if jnp.issubdtype(rng.dtype, jnp.uint32) \
            else jax.random.key_data(rng)
        seeds = data.reshape(-1)[:2].astype(jnp.int32)
    if row_tile and b % row_tile:
        raise ValueError(f"row_tile {row_tile} does not divide batch {b} — "
                         f"the grid would silently skip the trailing images")
    bt = row_tile or _pick_row_tile(b, t, m, e, f, jnp.dtype(dt).itemsize)
    # the backward holds weights + fp32 weight-grad accumulators resident in
    # VMEM; it runs narrow (one-image) tiles to leave room for the streams.
    # ACAI_FUSED_BT_BWD widens the backward row tile for A/Bs (the
    # weight-grad fold GEMMs contract over bt_bwd*T rows, so wider tiles
    # feed the MXU better IF the extra streams still fit VMEM).
    bt_bwd = row_tile or int(os.environ.get("ACAI_FUSED_BT_BWD", "1"))
    while b % bt_bwd:
        bt_bwd -= 1
    split = _BWD_SPLIT and bwd_split_fits(
        b, t, e, f, m, jnp.dtype(dt).itemsize, cross=True, bt_bwd=bt_bwd)
    fused = _make_fused(num_heads, float(dropout_rate), bool(det), True,
                        int(bt), int(bt_bwd), _INTERPRET, split)
    out = fused(flat_w, x.reshape(b * t, e), mem_kv, sbias, mbias, seeds)
    return out.reshape(b, t, e)


def enabled_for_enc(b: int, t: int, e: int, h: int) -> bool:
    """Encoder fused path gate (no cross stage; same tiling rules).

    Unlike the decoder gate, head dims below 64 are allowed when whole
    128-lane head groups divide evenly (masked-group attention,
    _head_col_mask) — the MAE decoder's dh=32 stack qualifies."""
    if not (_ENABLED or _FORCE):
        return False
    if not (_on_tpu() or _FORCE):
        return False
    dh = e // h
    if 2 * dh % 128 == 0:
        lanes_ok = True
    else:
        lanes_ok = dh >= 8 and 128 % dh == 0 and h % (128 // dh) == 0
    return (e % 128 == 0 and dh % 8 == 0 and t % 8 == 0 and t >= 8
            and h % 2 == 0 and lanes_ok)


def _fold_seeds(rng, det):
    if det:
        return jnp.zeros((2,), jnp.int32)
    data = rng if jnp.issubdtype(rng.dtype, jnp.uint32) \
        else jax.random.key_data(rng)
    return data.reshape(-1)[:2].astype(jnp.int32)


def encoder_stack_fused(stacked: Params, x: jnp.ndarray,
                        valid: jnp.ndarray, num_heads: int,
                        dropout_rate: float = 0.0, rng=None,
                        deterministic: bool = True,
                        row_tile: int | None = None) -> jnp.ndarray:
    """Fused-kernel equivalent of ``transformer.encoder_stack`` (bidirectional
    self-attention + FFN, post-norm; reference: the nn.TransformerEncoder
    layers of acai_omr/models/models.py:25-34).

    x: (B, T, E); valid: (B, T) bool (True = attend).
    """
    b, t, e = x.shape
    dt = x.dtype
    flat_w = pack_weights_enc(stacked, dt)
    f = flat_w[2].shape[2]
    sbias = jnp.where(valid, 0.0, NEG).astype(jnp.float32)[:, None, :]
    det = deterministic or dropout_rate <= 0.0
    seeds = _fold_seeds(rng, det)
    if row_tile and b % row_tile:
        raise ValueError(f"row_tile {row_tile} does not divide batch {b} — "
                         f"the grid would silently skip the trailing images")
    bt = row_tile or _pick_row_tile(b, t, 0, e, f, jnp.dtype(dt).itemsize)
    bt_bwd = row_tile or max(1, 256 // t if t < 256 else 1)
    while b % bt_bwd:
        bt_bwd -= 1
    split = _BWD_SPLIT and bwd_split_fits(
        b, t, e, f, 0, jnp.dtype(dt).itemsize, cross=False, bt_bwd=bt_bwd)
    fused = _make_fused_enc(num_heads, float(dropout_rate), bool(det), False,
                            int(bt), int(bt_bwd), _INTERPRET, split)
    out = fused(flat_w, x.reshape(b * t, e), sbias, seeds)
    return out.reshape(b, t, e)
