"""Monolithic decode-step Pallas kernel: all decoder layers in one pallas_call.

The per-token decode step of the KV-cached LMX decoder (reference:
acai_omr/models/kv_caching.py:258-302 — 12x {self-attn, cross-attn, FF}) is
~150 XLA ops per step on the fallback path; per-op dispatch and the missed
DMA/compute overlap leave it at ~50% of the HBM floor (docs/PERF.md). This
kernel runs the whole layer stack inside a single Pallas grid:

* **grid = (num_layers, batch_tiles)** — for each layer, every batch tile of
  rows flows through the full layer body. Layer weights (~28 MB) are fetched
  once per layer (their block index only depends on the layer id) and overlap
  the previous layer's compute; KV-cache and memory tiles stream per grid
  step. v5e VMEM (~128 MB, probed) holds the double-buffered weights plus
  cache tiles comfortably.
* **Time-major caches (L, B, T, E)** — the sequence axis lives on sublanes,
  so appending the new token's K/V writes one 16-sublane tile (~64 KB/step)
  instead of a 128-wide lane tile (~1 MB/step with the lane-major layout),
  via aliased input/output buffers (only the touched tile is written back).
* **Transpose-free attention.** Per row, logits (T, H) come from one
  ``dot_general`` contracting the lane axis of K (T, E) against a per-head
  selection of q broadcast to (H, E); the weighted sum contracts sublanes of
  the softmax weights (T, H) against V (T, E) into (H, E), collapsed back to
  (1, E) with the same selection mask. Both forms are MXU-native; no
  reshapes/transposes that Mosaic would reject as relayouts.
* The token being decoded is folded in analytically (its K/V are quantized
  to the cache dtype first), matching the fallback's write-then-attend
  numerics; positions >= pos are masked with the shared NEG_INF.

The step returns the post-layer-stack hidden state; final norm, unembed and
argmax/sampling stay in XLA (a handful of cheap ops). Opt-out via
``ACAI_MONOLITH_DECODE=0``.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import nn

Params = dict

_ENABLED = os.environ.get("ACAI_MONOLITH_DECODE", "1") == "1"

# test hooks: force the monolith path off-TPU and run the kernel in the
# Pallas interpreter (CPU parity tests vs the per-op XLA path)
_FORCE = False
_INTERPRET = False

# timing-only ablation hooks (tools/monolith_step_bench.py): names of kernel
# stages to skip so their cost can be attributed. NUMERICALLY WRONG — never
# set outside attribution runs. Read at trace time.
_ABLATE: frozenset = frozenset()

ABLATIONS = ("quantrows", "packscale", "qdotquant", "gelu", "selfattn",
             "crossattn", "exp", "w4unpack")


def set_ablate(names=()) -> None:
    """Timing-only: skip the named kernel stages (see ABLATIONS) so their
    cost can be attributed. NUMERICALLY WRONG. The flags are read at trace
    time — callers must ``jax.clear_caches()`` after changing them."""
    global _ABLATE
    names = frozenset(names)
    unknown = names - frozenset(ABLATIONS)
    if unknown:
        raise ValueError(f"unknown ablation(s): {sorted(unknown)}")
    _ABLATE = names


def set_test_mode(force: bool, interpret: bool) -> None:
    global _FORCE, _INTERPRET
    _FORCE = force
    _INTERPRET = interpret


# manual layer-ahead weight prefetch: the per-layer weight fetch only gets
# Mosaic's one-grid-step lookahead, so the first batch tile of every layer
# is DMA-oversubscribed (weights + caches ≈ 2x a steady step's traffic —
# the overlap residual measured by tools/monolith_step_bench.py). This mode
# moves the six weight matrices to manually double-buffered VMEM scratch:
# layer i+1's copies start at layer i's FIRST tile, giving them the whole
# layer (b/bt grid steps) to land. Costs the parallel-j tile scheduling
# (the schedule needs in-order tiles), so it's a measured trade: +1.4% on
# the int8 step (half-size weight copies land easily inside a layer),
# -0.5% on bf16 — "auto" enables it for quantized caches only.
# A/B: ACAI_MONOLITH_WDMA=1 forces on, =0 forces off.
_MANUAL_WDMA = os.environ.get("ACAI_MONOLITH_WDMA", "auto")


def set_manual_wdma(flag) -> None:
    """True/False force the mode; "auto" (default) = int8 caches only."""
    global _MANUAL_WDMA
    _MANUAL_WDMA = flag


def _manual_wdma(quantized: bool) -> bool:
    if _MANUAL_WDMA in ("auto",):
        return quantized
    return _MANUAL_WDMA in (True, "1")


# manual cache-stream prefetch: the per-grid-step cache/memory/scale blocks
# (the bulk of the int8 step's HBM traffic — ~17 MB/step at flagship shapes)
# otherwise ride Mosaic's automatic pipelining, whose one-step lookahead was
# measured as the residual between the int8 step and its HBM floor
# (docs/PERF.md stage attribution: ~0.36 ms/step of imperfect DMA overlap,
# not VPU work). This mode moves them to explicitly double-buffered VMEM
# scratch: step g issues step g+1's eight copies at its own start, so every
# stream has a full grid step to land and the copies are batched onto the
# DMA engines in one burst. Needs in-order tiles (slot parity follows the
# global grid step), same trade as the weight prefetch.
# A/B: ACAI_MONOLITH_CDMA=1 forces on, =0 forces off, auto = int8 only.
_MANUAL_CDMA = os.environ.get("ACAI_MONOLITH_CDMA", "auto")


def set_manual_cdma(flag) -> None:
    """True/False force the mode; "auto" (default) = int8 caches only."""
    global _MANUAL_CDMA
    _MANUAL_CDMA = flag


def _manual_cdma(quantized: bool) -> bool:
    if _MANUAL_CDMA in ("auto",):
        return quantized
    return _MANUAL_CDMA in (True, "1")


# rotation-slot count for the manual cache prefetch: S slots keep S-1 grid
# steps of copies in flight. int8 blocks are small enough for 3 slots at
# bt=8 (measured: the 2-slot skeleton sat ~10% above the achieved-bandwidth
# floor); larger row tiles need S=2 to fit VMEM.
# A/B: ACAI_MONOLITH_CSLOTS=2|3 forces a count, auto = 3 int8 / 2 bf16.
_N_CSLOTS = os.environ.get("ACAI_MONOLITH_CSLOTS", "auto")


def set_cslots(flag) -> None:
    """2/3 force the slot count; "auto" (default) = 3 int8 / 2 bf16."""
    global _N_CSLOTS
    _N_CSLOTS = flag


def pick_cslots(quantized: bool) -> int:
    if _N_CSLOTS in ("auto",):
        return 3 if quantized else 2
    return int(_N_CSLOTS)

# dead-row DMA skip (measured NEGATIVE, default off): stream only self-cache
# chunks whose 128-row time window intersects [0, pos) — rows at positions
# >= pos are masked to exp=0 in-compute, so their bytes never matter. The
# fixed-pos step bench (pos <= 128, cache 512: 75% of chunks skippable)
# measured -4% ms/step, but the REAL 511-token decode regressed 36.3 -> 35.5
# sys/s: most steps run at high pos where every chunk streams anyway, and
# 4x the DMA issues per stream cost more than the few skipped bytes save.
# int8-only even when forced (stale bf16 scratch could hold NaN/Inf; int8
# garbage is finite and masked exactly).
# A/B: ACAI_MONOLITH_CHUNK_SKIP=1 forces on, default/0 = off.
_CHUNK_SKIP = os.environ.get("ACAI_MONOLITH_CHUNK_SKIP", "0")


def set_chunk_skip(flag) -> None:
    """True forces the (measured-slower) chunked-skip mode on; default off."""
    global _CHUNK_SKIP
    _CHUNK_SKIP = flag


def _chunk_skip(quantized: bool) -> bool:
    return quantized and _CHUNK_SKIP in (True, "1")


# sublane tile of the cache's time axis written back per step (>= the native
# sublane tile: 16 covers bf16/f32; int8 tiles are (32, 128))
_TIME_TILE = 16
INT8_QMAX = 127.0
INT4_QMAX = 7.0


def time_tile(cache_dtype) -> int:
    return 32 if cache_dtype == jnp.int8 else _TIME_TILE
# probed VMEM ceiling (~120 MB; see tools/vmem_probe.py), minus slack for
# Mosaic temporaries; the flagship layer's double-buffered weights take 56 MB
# bf16 / 30 MB int8 (W8A8)
_VMEM_LIMIT = int(119.5 * 1024 * 1024)
_WEIGHTS_VMEM = 56 * 1024 * 1024
_WEIGHTS_VMEM_INT8 = 30 * 1024 * 1024
_WEIGHTS_VMEM_INT4 = 31 * 1024 * 1024  # packed x2 (~15) + layer unpack scratch (~15)
_SLACK_VMEM = 6 * 1024 * 1024
# row-tile cap. bt=16 at the flagship shape has been MEASURED as a negative
# twice: pre-CDMA, Mosaic's double-buffered windows for the in+out aliased
# cache operands exceeded VMEM; post-CDMA (explicit S=2 scratch) the compile
# still OOMs on scoped allocations — the block-diagonal attention's bt²-sized
# f32 logits planes (~16 MB each for self and cross at bt=16 / cache 512)
# that a streams-only budget under-counts. _cdma_vmem therefore models the
# intermediates too. The upside was bounded anyway: ablating ALL compute
# stages moves the int8 step only ~3% (it is DMA-bound at achieved
# bandwidth), so a fatter tile can't buy more than that. The knob stays for
# experiments on smaller shapes where the model admits 16.
_MAX_BT = int(os.environ.get("ACAI_MONOLITH_MAX_BT", "8"))


def _cdma_vmem(bt: int, t: int, m: int, e: int, h: int, s: int,
               quantized: bool, mem_group: int, itemsize: int) -> int:
    """VMEM bytes of the manual-CDMA kernel's explicit residency at row tile
    ``bt``: S rotation slots of cache/memory scratch plus the bt²-sized
    additive masks (the terms that grow with ``bt``; weights/slack are
    accounted by the caller)."""
    kv = 2 * s * bt * t * e * itemsize
    if mem_group > 1:
        mem = 2 * s * m * e * itemsize
    else:
        mem = 2 * s * bt * m * e * itemsize
    scales = 0
    if quantized:
        scales = 2 * s * t * bt * h * 2  # lane-packed self planes, bf16
        mw = h if mem_group > 1 else bt * h
        scales += 2 * s * m * mw * 2
    masks = bt * t * bt * h * 2
    masks += 8 * 128 * 2 if mem_group > 1 else bt * m * bt * h * 2
    # block-diagonal attention intermediates: (bt·T, bt·H) f32 logits plus
    # bf16 softmax weights per attention site (the bt² term that OOMed the
    # measured bt=16 compile; 6 B/elem ≈ f32 + bf16)
    inter = bt * t * bt * h * 6
    inter += (bt * m * h * 6 if mem_group > 1 else bt * m * bt * h * 6)
    return kv + mem + scales + masks + inter


def _weights_vmem_for(quantized: bool, w8a8, w4a8) -> tuple[int, bool, bool]:
    """Resolve the (weights VMEM budget, w8a8, w4a8) triple from explicit
    flags or the module env policy (W4A8 wins over W8A8 when both set —
    they are exclusive weight modes).

    An EXPLICIT ``w8a8`` pins the whole weight mode: callers that pass it
    (TP pack-group sites, decode_layers) have already resolved their mode,
    so the env W4A8 policy must not override them — under
    ``ACAI_W4A8_DECODE=1`` a TP shard (which never runs int4,
    ``weight_quant_mode``) would otherwise plan VMEM/row tiles for int4
    while the kernel runs the W8A8/bf16 plan, desynchronizing the host
    scale-pack group from the kernel row tile (round-5 review)."""
    if w4a8 is None:
        w4a8 = _W4A8 and quantized and w8a8 is None
    if w8a8 is None:
        w8a8 = _W8A8 and quantized and not w4a8
    if w4a8:
        return _WEIGHTS_VMEM_INT4, False, True
    return (_WEIGHTS_VMEM_INT8 if w8a8 else _WEIGHTS_VMEM), w8a8, False


def pick_cdma_plan(b: int, t: int, m: int, e: int, itemsize: int = 1,
                   num_heads: int = 16, mem_group: int = 1,
                   w8a8: bool | None = None,
                   w4a8: bool | None = None) -> tuple[int, int]:
    """(row tile, rotation slots) for the manual-CDMA kernel: the largest
    feasible ``bt`` wins (fatter grid steps = larger contiguous copies and
    fewer DMA issue boundaries), then the deepest slot count that still fits
    — e.g. the flagship (B=32, cache 512) runs bt=8/S=3 but a 1536-token
    cache segment drops to S=2 to keep bt=8 (S=3 there would exceed VMEM —
    scratch is 2·S·bt·t·E bytes for the self streams alone)."""
    quantized = itemsize == 1
    weights_vmem, w8a8, w4a8 = _weights_vmem_for(quantized, w8a8, w4a8)
    budget = _VMEM_LIMIT - weights_vmem - _SLACK_VMEM
    s_pref = pick_cslots(quantized)
    slot_choices = (s_pref,) if _N_CSLOTS not in ("auto",) \
        else tuple(range(s_pref, 1, -1))
    bt = min(_MAX_BT, 16) if (w8a8 or w4a8) else min(_MAX_BT, 8)
    while bt > 1:
        if b % bt == 0 and not (mem_group > 1 and mem_group % bt):
            for s in slot_choices:
                if _cdma_vmem(bt, t, m, e, h=num_heads, s=s,
                              quantized=quantized, mem_group=mem_group,
                              itemsize=itemsize) <= budget:
                    return bt, s
        bt //= 2
    return 1, slot_choices[-1]


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pick_row_tile(b: int, t: int, m: int, e: int, itemsize: int = 2,
                  num_heads: int = 16, mem_group: int = 1,
                  w8a8: bool | None = None,
                  manual_cdma: bool | None = None,
                  w4a8: bool | None = None) -> int:
    """Rows per grid step: largest power-of-2 divisor of ``b`` such that the
    double-buffered cache/memory tiles plus the layer weights fit VMEM.

    Bigger tiles are better: each grid step's compute grows with ``bt`` while
    the next layer's weight fetch still only gets a one-step lookahead,
    so fatter steps hide the weight DMA (measured: the per-layer weight-fetch
    stall is most of the gap to the HBM floor at small bt). The W8A8 int8
    mode halves the weight residency, which the budget model says admits
    bt=16 at the flagship shapes — but the real compile exceeds VMEM there
    (see ``_MAX_BT``), so the default cap stays 8. ``w8a8`` defaults to the
    module env policy for int8 caches; callers that already packed (or
    skipped) int8 weights pass it explicitly so tile choice matches the
    actual VMEM plan.

    With ``mem_group > 1`` (grouped cross-attention: G consecutive rows share
    one memory) the memory block is one shared (M, E) tile per grid step, so
    it drops out of the per-row budget; the tile must also stay within one
    group (``mem_group % bt == 0``)."""
    weights_vmem, w8a8, w4a8 = _weights_vmem_for(itemsize == 1, w8a8, w4a8)
    budget = _VMEM_LIMIT - weights_vmem - _SLACK_VMEM
    bt = min(_MAX_BT, 16) if (w8a8 or w4a8) else min(_MAX_BT, 8)
    # ``manual_cdma`` defaults to the module env policy; callers whose
    # delivery mode differs from the env default (tp shards force BlockSpec
    # windows) pass it so the VMEM budget models the delivery path the
    # kernel will actually use
    if manual_cdma is None:
        manual_cdma = _manual_cdma(itemsize == 1)
    if manual_cdma:
        bt_m = pick_cdma_plan(b, t, m, e, itemsize, num_heads, mem_group,
                              w8a8, w4a8)[0]
        # manual prefetch: residency is the explicit scratch the kernel
        # allocates (S rotation slots + bt²-sized masks), not Mosaic's
        # double-buffered block windows. EXCEPT: sub-128-lane int8 scale
        # planes (bt·H < 128) make the kernel fall back to BlockSpec
        # delivery (lane-unaligned DMA slices are illegal), so re-budget
        # with the window model below — every caller (host pack group and
        # kernel tile pick) flows through here, keeping them consistent;
        # a window-model bt whose planes reach 128 lanes is safe under
        # manual delivery too (windows are the larger residency).
        if not (itemsize == 1 and (bt_m * num_heads) % 128):
            return bt_m
    if mem_group > 1:
        budget -= 2 * m * e * itemsize * 2  # shared mem K+V, double-buffered
        per_bt = 2 * t * e * itemsize * 2   # self K+V only
        if itemsize == 1:
            # shared (M, H) mem scale planes, bf16, double-buffered
            budget -= 2 * m * num_heads * 2 * 2
            # lane-packed self scale planes, bf16, double-buffered
            per_bt += 2 * t * num_heads * 2 * 2
        while bt > 1 and (b % bt or mem_group % bt or bt * per_bt > budget):
            bt //= 2
        return bt
    # K+V, self+mem, double-buffered; int8 adds bf16 scale planes, lane-packed
    # to bt*H so they stream at full HBM width (tools/narrow_lane_dma_probe.py:
    # 16-lane blocks reach ~22% of peak)
    per_bt = 2 * (t + m) * e * itemsize * 2
    if itemsize == 1:
        per_bt += 2 * (t + m) * num_heads * 2 * 2
    while bt > 1 and (b % bt or bt * per_bt > budget):
        bt //= 2
    return bt


def scale_pack_group(b: int, t: int, m: int, e: int,
                     num_heads: int = 16, mem_group: int = 1,
                     w8a8: bool | None = None,
                     manual_cdma: bool | None = None,
                     w4a8: bool | None = None) -> int:
    """Lane-pack group for int8 SELF-cache scale planes == the kernel's row
    tile.

    The packed layout (L, B/G, T, G*H) makes each grid step's scale block a
    full-lane tile; the group must equal the row tile so block j covers
    exactly rows [j*G, (j+1)*G). With ``mem_group > 1`` the row tile also
    divides the memory group (grouped cross-attention); the MEMORY scale
    planes then stay in the shared narrow layout (L, B/G_mem, M, H) — one
    tiny plane per unique image, repeated across lanes in-kernel.
    """
    return pick_row_tile(b, t, m, e, 1, num_heads, mem_group, w8a8=w8a8,
                         manual_cdma=manual_cdma, w4a8=w4a8)


def pack_scales(s: jnp.ndarray, group: int) -> jnp.ndarray:
    """(L, B, T, H) -> (L, B/G, T, G*H): row-groups packed along lanes."""
    l, b, t, h = s.shape
    s = s.reshape(l, b // group, group, t, h)
    return jnp.transpose(s, (0, 1, 3, 2, 4)).reshape(l, b // group, t,
                                                     group * h)


def unpack_scales(s: jnp.ndarray, group: int) -> jnp.ndarray:
    """(L, B/G, T, G*H) -> (L, B, T, H)."""
    l, j, t, gh = s.shape
    h = gh // group
    s = s.reshape(l, j, t, group, h)
    return jnp.transpose(s, (0, 1, 3, 2, 4)).reshape(l, j * group, t, h)


def pack_scales_tp(s: jnp.ndarray, group: int, tp: int) -> jnp.ndarray:
    """Tensor-parallel lane-pack: pack each contiguous head block of ``s``
    ((L, B, T, H), head-major — tp_shuffle gives shard i heads
    [i*H/tp, (i+1)*H/tp)) independently and concatenate on lanes, so a
    model-axis shard of the result IS that shard's own (L, B/G, T, G*H/tp)
    pack — a plain :func:`pack_scales` would interleave row groups across
    the lane split and shard into garbage."""
    hl = s.shape[-1] // tp
    return jnp.concatenate(
        [pack_scales(s[..., i * hl:(i + 1) * hl], group) for i in range(tp)],
        axis=-1)


def unpack_scales_tp(s: jnp.ndarray, group: int, tp: int) -> jnp.ndarray:
    """Inverse of :func:`pack_scales_tp` -> (L, B, T, H) head-major."""
    w = s.shape[-1] // tp
    return jnp.concatenate(
        [unpack_scales(s[..., i * w:(i + 1) * w], group) for i in range(tp)],
        axis=-1)


def use_monolith(cfg, batch: int, t_cache: int, m_len: int,
                 compute_dtype, cache_dtype) -> bool:
    """The kernel covers the flagship decoder shapes: E a multiple of 128,
    bf16 compute with bf16 or int8 (quantized) caches.

    ``t_cache`` need not be tile-aligned (callers round cache segments up to
    the time tile); the memory length is fixed per batch and must be.
    """
    del t_cache
    if not _FORCE:
        if not (_ENABLED and _on_tpu()):
            return False
        if compute_dtype != jnp.bfloat16:
            return False
        if cache_dtype not in (jnp.bfloat16, jnp.int8):
            return False
    elif compute_dtype != cache_dtype and cache_dtype != jnp.int8:
        return False
    e = cfg.hidden_dim
    dh = e // cfg.num_heads if e % cfg.num_heads == 0 else 0
    if cache_dtype == jnp.int8 and (dh & (dh - 1)) != 0:
        return False  # rolling-max quantization needs a power-of-two head dim
    return (e % 128 == 0 and cfg.mlp_dim % 128 == 0
            and 3 * e <= cfg.mlp_dim  # misc bias rows are padded to mlp_dim
            and dh > 0 and dh % 8 == 0
            and m_len % time_tile(cache_dtype) == 0)


def prepack(params: Params, cfg, compute_dtype=jnp.bfloat16,
            quantize_weights: bool = False, e_attn: int | None = None) -> Params:
    """Slice/cast the decoder params into the kernel's operand layout.

    Runs under jit once per decode segment (hoisted out of the token loop).
    ``misc`` packs every per-layer bias/LayerNorm vector into one
    (L, 12, mlp_dim) array in the compute dtype so the kernel has a single
    small operand (bf16 is exact when the params are bf16 — the decode
    deployment case — and saves ~5 MB of double-buffered VMEM; fp32 test
    mode keeps fp32).

    ``quantize_weights=True`` or ``"int8"`` (the int8 decode mode) stores
    every weight matrix int8 with per-output-column max-abs scales packed
    into one (L, 6, mlp_dim) fp32 operand ("wscale"): weight streaming is
    half the int8 step's non-cache HBM traffic, and the matmuls then run as
    int8 x int8 MXU dots against per-row-quantized activations (W8A8).

    ``quantize_weights="int4"`` (W4A8, ``ACAI_W4A8_DECODE=1``) packs two
    int4 values per byte pairing input-rows (r, r + IN/2): byte =
    16*q[r + IN/2] + (q[r] + 8), so the in-kernel unpack (once per layer,
    into VMEM scratch) yields the two CONTIGUOUS halves of the full
    (IN, OUT) int8 matrix — no lane interleave — and the matmuls then
    ride the same ``_qdot`` path as W8A8. Scales are per-output-column
    over the full input ("wscale4", (L, 6, mlp_dim) fp32, same shape as
    W8A8's): a per-half-scale variant needed split dots and measured
    +1.46 ms/step at B=32 while per-column is already token-identical on
    the trained checkpoint (tools/w4a8_quality.py --sweep). Weight
    streaming drops to ~1/4 of bf16 (~88 MB/step at flagship shapes vs
    176 int8 / 352 bf16) — the B<=64 decode lever (weights dominate
    small-batch steps; VERDICT r4 #1).
    """
    blocks = params["blocks"]
    e, f = cfg.hidden_dim, cfg.mlp_dim
    # tensor-parallel shards pass their local attention width (heads/tp * Dh)
    # so the cross-attn q slice and biases pick the shard's columns; misc
    # rows stay padded to the FULL mlp width (cheap, keeps one layout)
    ea = e if e_attn is None else e_attn
    sa, ca = blocks["self_attn"], blocks["cross_attn"]

    def row(x):
        x = x.astype(compute_dtype)
        return jnp.pad(x, ((0, 0), (0, f - x.shape[-1])))[:, None, :]

    misc = jnp.concatenate([
        row(sa["in_bias"]),                 # 0: qkv bias (3E)
        row(sa["out"]["bias"]),             # 1: self out bias (E)
        row(ca["in_bias"][:, :ea]),         # 2: cross q bias (E or E/tp)
        row(ca["out"]["bias"]),             # 3: cross out bias (E)
        row(blocks["linear1"]["bias"]),     # 4: ff1 bias (F)
        row(blocks["linear2"]["bias"]),     # 5: ff2 bias (E)
        row(blocks["norm1"]["scale"]), row(blocks["norm1"]["bias"]),   # 6, 7
        row(blocks["norm2"]["scale"]), row(blocks["norm2"]["bias"]),   # 8, 9
        row(blocks["norm3"]["scale"]), row(blocks["norm3"]["bias"]),   # 10, 11
    ], axis=1)
    mats = {
        "w_qkv": sa["in_kernel"],
        "w_self_out": sa["out"]["kernel"],
        "w_cross_q": ca["in_kernel"][:, :, :ea],
        "w_cross_out": ca["out"]["kernel"],
        "w_ff1": blocks["linear1"]["kernel"],
        "w_ff2": blocks["linear2"]["kernel"],
    }
    if not quantize_weights:
        out = {k: w.astype(compute_dtype) for k, w in mats.items()}
        out["misc"] = misc
        return out

    out = {}
    srows = []
    if quantize_weights == "int4":
        for name in ("w_qkv", "w_self_out", "w_cross_q", "w_cross_out",
                     "w_ff1", "w_ff2"):
            w = mats[name].astype(jnp.float32)               # (L, IN, OUT)
            l, cin, cout = w.shape
            half = cin // 2
            amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # (L, 1, OUT)
            # ONE scale per output column over the full input (like W8A8's):
            # a per-half variant (finer, free-looking since halves unpack
            # separately) measured +1.46 ms/step at B=32 — the split dots
            # and per-half dequant, not the unpack, were the entire cost —
            # and the per-column granularity is already token-identical on
            # the trained checkpoint (tools/w4a8_quality.py --sweep).
            s = (jnp.maximum(amax, 1e-8) / INT4_QMAX).astype(jnp.bfloat16) \
                .astype(jnp.float32)
            q = jnp.clip(jnp.round(w / s), -INT4_QMAX,
                         INT4_QMAX).astype(jnp.int32)
            # byte = 16*q[pair_hi] + (q[pair_lo] + 8), pairing along the
            # int4_pack_axis: unpack yields the two contiguous halves of
            # the full (IN, OUT) matrix (sublane blocks for input-packed,
            # lane blocks for output-packed)
            if int4_pack_axis(cin, cout) == 0:
                out[name] = (16 * q[:, half:]
                             + (q[:, :half] + 8)).astype(jnp.int8)
            else:
                oh = cout // 2
                out[name] = (16 * q[:, :, oh:]
                             + (q[:, :, :oh] + 8)).astype(jnp.int8)
            srows.append(jnp.pad(s, ((0, 0), (0, 0), (0, f - cout))))
        out["misc"] = misc
        out["wscale4"] = jnp.concatenate(srows, axis=1)      # (L, 6, F)
        return out
    for name in ("w_qkv", "w_self_out", "w_cross_q", "w_cross_out",
                 "w_ff1", "w_ff2"):
        w = mats[name].astype(jnp.float32)                   # (L, IN, OUT)
        amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)    # (L, 1, OUT)
        s = (jnp.maximum(amax, 1e-8) / INT8_QMAX).astype(jnp.bfloat16) \
            .astype(jnp.float32)
        out[name] = jnp.clip(jnp.round(w / s), -INT8_QMAX,
                             INT8_QMAX).astype(jnp.int8)
        srows.append(jnp.pad(s, ((0, 0), (0, 0), (0, f - s.shape[-1]))))
    out["misc"] = misc
    out["wscale"] = jnp.concatenate(srows, axis=1)           # (L, 6, F)
    return out


_W8A8 = os.environ.get("ACAI_W8A8_DECODE", "1") == "1"
_TP_W8A8 = os.environ.get("ACAI_TP_W8A8", "0") == "1"
_W4A8 = os.environ.get("ACAI_W4A8_DECODE", "0") == "1"


def want_w8a8(cache_dtype) -> bool:
    """int8 decode quantizes the weights too (W8A8) unless opted out."""
    return _W8A8 and cache_dtype == jnp.int8


def want_w4a8(cache_dtype) -> bool:
    """Opt-in W4A8 (ACAI_W4A8_DECODE=1): int4 nibble-packed weights under
    int8 caches — ~1/4 the bf16 weight stream. Off by default: a DIFFERENT
    (coarser) weight quantization than the e2e-validated W8A8; validated
    token-identical on the trained synthetic-task checkpoint
    (tools/w4a8_quality.py, docs/w4a8_quality_r5.json) — validate on your
    own weights before enabling. Single-chip only (TP shards keep their
    own modes)."""
    return _W4A8 and cache_dtype == jnp.int8


def weight_quant_mode(cache_dtype, tp_mono: bool = False):
    """Weight mode for decode_segment's prepack: "int4" | "int8" | False.

    TP shards never ride W4A8 (per-shard W4A8 would be a third distinct
    quantization; ACAI_TP_W8A8 already covers the sharded-weights case).
    The tp branch keeps the _W8A8 conjunction: ACAI_TP_W8A8=1 is an opt-in
    ON TOP of W8A8, and the host-side scale-pack groups (decode.py
    _pack_group sites) key on want_w8a8() AND want_tp_w8a8() — dropping
    _W8A8 here would run the kernel on the W8A8 plan while the host packs
    for the unquantized one (round-5 review)."""
    if cache_dtype != jnp.int8:
        return False
    if tp_mono:
        return "int8" if (_W8A8 and want_tp_w8a8()) else False
    if _W4A8:
        return "int4"
    return "int8" if _W8A8 else False


def want_tp_w8a8() -> bool:
    """Opt-in W8A8 under tensor-parallel monolith decode (ACAI_TP_W8A8=1).

    Off by default because sharded W8A8 is a DIFFERENT quantization than
    single-chip W8A8: weight scales are per-shard-slice and the per-row
    activation maxes span only the shard's half of the contraction axis, so
    tokens are not bit-comparable to the single-chip int8 decode (they are
    an equally principled quantization — validate decode quality for your
    weights before enabling). Why you'd want it: B=1 TP-2 decode is weight-
    stream-bound, and per-shard W8A8 quarters the per-chip weight bytes —
    measured at shard shapes: 270 µs/step vs 396 µs for the best single-chip
    config (W8A8) and 394 µs for tp-bf16-weights, i.e. the only composition
    that beats one chip at B=1 (tools/tp_shard_bench.py --int8 --shard-w8a8,
    docs/PERF.md)."""
    return _TP_W8A8


def _qdot(x, w8, s_row):
    """W8A8 matmul: per-row max-abs activation quantization, int8 MXU dot,
    fp32 dequant by row scale x per-output-column weight scale.

    x: (bt, IN) compute dtype; w8: (IN, OUT) int8; s_row: (1, OUT) fp32.
    Returns (bt, OUT) fp32 (bias added by the caller).
    """
    x32 = x.astype(jnp.float32)
    if "qdotquant" in _ABLATE:  # timing-only: skip the row max-abs pass
        rs = jnp.ones((x32.shape[0], 1), jnp.float32)
        x8 = jnp.clip(jnp.round(x32), -INT8_QMAX, INT8_QMAX).astype(jnp.int8)
    else:
        rs = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True),
                         1e-8) / INT8_QMAX
        x8 = jnp.round(x32 / rs).astype(jnp.int8)
    acc = jnp.dot(x8, w8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * rs * s_row


def int4_pack_axis(cin: int, cout: int) -> int:
    """Which axis the int4 nibble pairs pack along: 0 = input rows
    (r, r + IN/2), 1 = output columns (c, c + OUT/2).

    Chosen to minimize the in-kernel identity-dot conversion cost
    (~contracted_dim x unpacked_elems MACs): pack the SHORTER axis, i.e.
    input iff cin <= cout. At flagship shapes every matrix then converts
    through one (E/2, E/2) identity (ff2 is the only cout < cin matrix)."""
    return 0 if cin <= cout else 1


def unpack_int4(wp32):
    """(IN/2, OUT) packed bytes as f32 -> (lo, hi) int4-valued f32 halves.

    byte = 16*q_hi + (q_lo + 8); the f32 floor-divide is the only unpack
    scheme Mosaic lowers on this chip (native s4 operands fail at the host
    layer and int8 shifts fail to compile - tools/int4_probe.py, EXACT)."""
    hi = jnp.floor(wp32 * (1.0 / 16.0))
    lo = wp32 - 16.0 * hi - 8.0
    return lo, hi


def _erf_rational(z):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7, fp32).

    Mosaic has no erf/erfc primitive; this uses only exp, which it lowers.
    """
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(z < 0, -y, y)


# exp/div-free erf candidate — MEASURED SLOWER, kept as an opt-in knob
# and a documented negative: the VPU probe clocks the exact-form GELU at
# ~56 Gelem/s (vs ~270 for a softmax pass), which looked like the A&S
# rational's divide + exp + Horner chain. But the pure-FMA two-branch
# polynomial below probes at only ~32-34 Gelem/s (tools/vpu_probe.py
# gelu_poly): v5e's exp/divide are fast hardware ops, and the 17-FMA
# Horner DEPENDENCY CHAIN is the real cost — serial latency, not
# transcendental throughput, bounds elementwise GELU on this VPU. Fits:
# |z| < 2: z * P8(z^2) (max err 5.6e-7 fp32); 2 <= |z| <= 4: Q8(|z| - 3)
# (3e-7); |z| > 4: 1. Combined max err 5.4e-7 — numerically safe
# everywhere, so the knob (ACAI_ERF_POLY=1) stays for hardware where the
# tradeoff inverts.
_ERF_P_INNER = (1.1283791196906645, -0.37612431815137987,
                0.11282301835706048, -0.02682474115101642,
                0.005165745149216882, -0.0008080523031585587,
                9.773775549318082e-05, -7.991255935925338e-06,
                3.205006352036684e-07)
_ERF_Q_OUTER = (0.9999779388686203, 0.00013951109721889064,
                -0.00041936053857775154, 0.0007858608011556055,
                -0.0010307062836143713, 0.0010255980999460375,
                -0.0007781201077135403, 0.00038805285608613824,
                -8.875076493734391e-05)
_ERF_POLY = os.environ.get("ACAI_ERF_POLY", "0") == "1"


def _erf_poly(z):
    a = jnp.abs(z)
    z2 = a * a
    pin = jnp.float32(_ERF_P_INNER[-1])
    for coef in _ERF_P_INNER[-2::-1]:
        pin = pin * z2 + jnp.float32(coef)
    u = a - 3.0
    q = jnp.float32(_ERF_Q_OUTER[-1])
    for coef in _ERF_Q_OUTER[-2::-1]:
        q = q * u + jnp.float32(coef)
    y = jnp.where(a < 2.0, a * pin, jnp.where(a <= 4.0, q, 1.0))
    return jnp.where(z < 0, -y, y)


def _erf(z):
    return _erf_poly(z) if _ERF_POLY else _erf_rational(z)


def _ln(x, scale, bias, eps):
    """(bt, E) in compute dtype -> LayerNorm in fp32 (ops.nn.layernorm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _quant_rows(x, dh: int, sel_c):
    """Per-head max-abs int8 quantization of (bt, E) fp32 rows, batched.

    One windowed rolling-max pass (window = head_dim, a power of two;
    backward rolls leave every head-start lane holding its head's max), then
    the extract + broadcast ride the MXU: masking to head-start lanes makes
    ``a0 @ sel_c^T`` sum exactly one nonzero per head — the per-head max —
    and ``scale_h @ sel_c`` replicates the rounded scale across the head's
    lanes. 6 roll+max VPU ops + two 0/1 gadget dots for ALL rows, replacing
    the earlier second rolling pass (VERDICT r2 asked for the scale math to
    fold into MXU dots; bit-identical — 0/1 dots carry bf16-rounded fp32
    values exactly, and the old scale_h was the mean of dh identical values).
    ``sel_c`` is the (H, E) 0/1 per-head column selector.
    Returns (q (bt, E) int-valued fp32, scale_e (bt, E), scale_h (bt, H));
    same per-(head, token) granularity as decode._quantize_rows.
    """
    e = x.shape[-1]
    a = jnp.abs(x)
    s = 1
    while s < dh:
        # backward roll spelled as a positive cyclic shift (pltpu.roll
        # rejects negative shifts)
        a = jnp.maximum(a, pltpu.roll(a, e - s, axis=1))
        s *= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a0 = jnp.where(lane % dh == 0, a, 0.0)
    sh_raw = jax.lax.dot_general(a0, sel_c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # scales round to bf16 BEFORE quantizing: the stored scale planes are
    # bf16 (lane-packed cache layout) and the MXU gadget dots that move
    # scales between row/column/packed forms carry bf16 values exactly —
    # quantize/dequantize stay an exact round trip
    scale_h = (jnp.maximum(sh_raw, 1e-8) / INT8_QMAX).astype(jnp.bfloat16) \
        .astype(jnp.float32)
    scale_e = jax.lax.dot_general(scale_h, sel_c, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    q = jnp.clip(jnp.round(x / scale_e), -INT8_QMAX, INT8_QMAX)
    return q, scale_e, scale_h


def _quant_rows_or_ablate(x, dh: int, sel_c):
    """_quant_rows, or (ablation 'quantrows') a shape-compatible stand-in
    with unit scales — isolates the rolling-max VPU cost in timing runs."""
    if "quantrows" in _ABLATE:
        q = jnp.clip(jnp.round(x), -INT8_QMAX, INT8_QMAX)
        h = sel_c.shape[0]
        return q, jnp.ones_like(x), jnp.ones((x.shape[0], h), jnp.float32)
    return _quant_rows(x, dh, sel_c)


def _batched_consts(bt: int, h: int, e: int, dtype):
    """Iota-built constant selector matrices for the batched attention.

    Lane/row index convention everywhere: ``l = b * H + h`` (b-major).
    R picks row b for lane-group l//H (broadcast bt -> nl rows via one dot);
    S is its transpose (collapse nl -> bt); sel_rep is the per-head column
    selector replicated per row; tile_hl lane-tiles an (·, H) plane to
    (·, nl); eye converts (1, nl) rows to (nl, 1) columns via one dot
    (Mosaic-legal "transpose" of a vector).
    """
    nl = bt * h
    dh = e // h
    i0 = jax.lax.broadcasted_iota(jnp.int32, (nl, bt), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (nl, bt), 1)
    r32 = ((i0 // h) == i1).astype(jnp.float32)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (nl, e), 1)
    row_l = jax.lax.broadcasted_iota(jnp.int32, (nl, e), 0)
    sel_rep32 = ((lane_e // dh) == (row_l % h)).astype(jnp.float32)
    s0 = jax.lax.broadcasted_iota(jnp.int32, (bt, nl), 0)
    s1 = jax.lax.broadcasted_iota(jnp.int32, (bt, nl), 1)
    s32 = ((s1 // h) == s0).astype(jnp.float32)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (nl, nl), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (nl, nl), 1)
           ).astype(jnp.float32)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (nl, h), 1)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (nl, h), 0) % h
    return {"R32": r32, "R_dt": r32.astype(dtype), "sel_rep32": sel_rep32,
            "S32": s32, "eye": eye, "packmask": lane_h == row_h}


def _pack_scale_row(s_bh: jnp.ndarray, consts) -> jnp.ndarray:
    """(bt, H) per-head scales -> (1, nl) lane-packed row, l = b*H + h.

    R-dot broadcast + per-row lane select + eye-dot transpose; exact for
    bf16-valued scales (every MXU multiply is by 0/1)."""
    sexp = jax.lax.dot_general(consts["R32"], s_bh, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (nl, H)
    col = jnp.sum(jnp.where(consts["packmask"], sexp, 0.0), axis=1,
                  keepdims=True)                                    # (nl, 1)
    return jax.lax.dot_general(col, consts["eye"], (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (1, nl)


def _row_to_col(x_row, eye):
    """(1, nl) -> (nl, 1) via an eye-dot (the Mosaic-legal vector transpose;
    rounds to bf16 on the MXU exactly like the per-row path's sel_c dots)."""
    return jax.lax.dot_general(eye, x_row, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attend_all(q, fresh, k_blk, v_blk, mask_add, pos, t_len, bt, h, e,
                scale, dtype, consts, k_plane=None, v_plane=None, bias=None):
    """Batched single-query attention: every row of the batch tile in one
    set of block-diagonal MXU dots (full lane width ``nl = bt * H``).

    Semantics match :func:`_attend` row-for-row — the block-diagonal big
    matrices only add exactly-zero / NEG_INF-masked terms, so the fp32
    interpreter parity vs the per-op path is preserved. The streamed bytes
    equal the per-row formulation's; what changes is the number of MXU
    issues (2 wide dots + a handful of tiny gadget dots per attention site
    vs ~4 per row), which bound the int8 monolith (docs/PERF.md).

    q: (bt, E) compute dtype — or the int8 triple (qq int-valued f32,
    qs_h (bt, H), qs_e (bt, E)). fresh: None for cross-attention, else
    (p_rows, v_eff): p_rows = q_eff * k_eff elementwise (bt, E) f32 and the
    (dequantized) fresh V rows (bt, E) f32, folded in analytically.
    k_blk/v_blk: (bt, T, E) cache-blocks; k_plane/v_plane: (T, bt*H) bf16
    lane-packed int8 scale planes (16-lane-wide planes stream at ~22% of
    HBM peak — tools/narrow_lane_dma_probe.py — so the cache layout packs
    bt rows' planes into full 128-lane tiles). mask_add: (bt*T, bt*H) fp32
    additive mask (0 on valid diagonal-block entries, NEG_INF elsewhere,
    cross-attention padding bias folded in) — built once per batch tile in
    scratch instead of iota/where passes on every grid step. Returns
    (bt, E) fp32.
    """
    nl = bt * h
    btt = bt * t_len
    quantized = k_plane is not None
    r32, sel_rep32, s32, eye = (consts["R32"], consts["sel_rep32"],
                                consts["S32"], consts["eye"])

    k_stack = k_blk.reshape(btt, e)
    v_stack = v_blk.reshape(btt, e)

    if quantized:
        qq, qs_h, qs_e = q
        qd = jax.lax.dot_general(r32, qq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qd8 = (qd * sel_rep32).astype(jnp.int8)                # (nl, E)
        big = jax.lax.dot_general(k_stack, qd8, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # packed plane rows replicate across the bt sublane blocks; values in
        # off-diagonal blocks are other rows' scales, killed by mask_add
        kp_big = pltpu.repeat(k_plane, bt, axis=0).astype(jnp.float32)
        # qs_row[l] = qs_h[l//H, l%H] — exact: _quant_rows rounds scales to
        # bf16 so the gadget dots carry them losslessly; sm scale folds in
        qs_row = _pack_scale_row(qs_h, consts) * scale
        logits = big.astype(jnp.float32) * kp_big * qs_row + mask_add
        if bias is not None:
            logits = logits + bias                             # (btt, 1) bcast
    else:
        qd = jax.lax.dot_general(consts["R_dt"], q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qd = (qd * sel_rep32).astype(dtype)                    # (nl, E)
        big = jax.lax.dot_general(k_stack, qd, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # mask_add is 0 on the valid diagonal blocks (exact) and NEG_INF
        # off-diagonal / beyond pos — exp underflows to exactly 0.0 there,
        # so the softmax matches the where()-masked formulation bit for bit
        logits = big * scale + mask_add
        if bias is not None:
            logits = logits + bias                             # (btt, 1) bcast

    if "exp" in _ABLATE:  # timing-only: linear stand-in for the softmax exp
        _exp = lambda z: z * 1e-4 + 1.0
    else:
        _exp = jnp.exp
    m = jnp.max(logits, axis=0, keepdims=True)                 # (1, nl)
    if fresh is not None:
        p_rows, v_eff = fresh
        p_big = jax.lax.dot_general(r32, p_rows, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        p_big = p_big * sel_rep32
        ones = jnp.ones((1, e), jnp.float32)
        lc = jax.lax.dot_general(ones, p_big, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        m = jnp.maximum(m, lc)                                 # (1, nl)
    w = _exp(logits - m)                                       # (btt, nl)
    denom = jnp.sum(w, axis=0, keepdims=True)
    if fresh is not None:
        wc = _exp(lc - m)
        denom = denom + wc

    if quantized:
        vp_big = pltpu.repeat(v_plane, bt, axis=0).astype(jnp.float32)
        w_v = w * vp_big
        ws_row = jnp.maximum(jnp.max(w_v, axis=0, keepdims=True), 1e-30) \
            / INT8_QMAX
        wq = jnp.round(w_v / ws_row).astype(jnp.int8)          # (btt, nl)
        out_big = jax.lax.dot_general(
            wq, v_stack, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        out_big = out_big * _row_to_col(ws_row, eye)           # (nl, E)
    else:
        out_big = jax.lax.dot_general(
            w.astype(dtype), v_stack, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (nl, E)
    if fresh is not None:
        v_rep = jax.lax.dot_general(r32, v_eff, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        out_big = out_big + _row_to_col(wc, eye) * v_rep
    out_big = out_big / _row_to_col(denom, eye)
    return jax.lax.dot_general(s32, out_big * sel_rep32,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attend_shared(q, k_mem, v_mem, bias_col, e, scale, dtype, consts,
                   bt: int = 0, h: int = 0, k_plane=None, v_plane=None):
    """Cross-attention for a batch tile whose rows all share ONE memory
    (grouped rollouts / beams: G rows per unique image).

    q: (bt, E) compute dtype — or, quantized, the int8 triple
    (qq int-valued f32, qs_h (bt, H), qs_e) with ``k_plane``/``v_plane``
    the shared (M, H) bf16 scale planes (one per unique image; repeated
    across the bt lane blocks in-kernel, so they stream as one tiny narrow
    plane per tile). k_mem/v_mem: (M, E); bias_col: (M, 1) fp32 additive
    padding bias. Because K/V are shared, the logits dot is a dense
    (M, E) x (E, nl) MXU matmul — every entry is a real (memory position,
    row-head) logit, so no block-diagonal mask is needed — and the memory
    streams once per *tile* instead of once per row (1/G the cross-KV HBM
    traffic of the replicated layout). The quantized math mirrors
    :func:`_attend_all`'s int8 branch term for term, so grouped int8 is
    bit-identical to replicated int8. Returns (bt, E) fp32.
    """
    quantized = k_plane is not None
    if quantized:
        qq, qs_h, _ = q
        qd = jax.lax.dot_general(consts["R32"], qq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qd8 = (qd * consts["sel_rep32"]).astype(jnp.int8)      # (nl, E)
        big = jax.lax.dot_general(k_mem, qd8, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)  # (M, nl)
        # shared plane: lane l's head is l % H, identical for every row
        # block -> repeat the (M, H) plane bt times along lanes
        kp_big = pltpu.repeat(k_plane, bt, axis=1).astype(jnp.float32)
        qs_row = _pack_scale_row(qs_h, consts) * scale         # (1, nl)
        logits = big.astype(jnp.float32) * kp_big * qs_row + bias_col
    else:
        qd = jax.lax.dot_general(consts["R_dt"], q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qd = (qd * consts["sel_rep32"]).astype(dtype)          # (nl, E)
        big = jax.lax.dot_general(k_mem, qd, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (M, nl)
        logits = big * scale + bias_col                        # (M, 1) bcast
    if "exp" in _ABLATE:  # timing-only: linear stand-in for the softmax exp
        _exp = lambda z: z * 1e-4 + 1.0
    else:
        _exp = jnp.exp
    m_ = jnp.max(logits, axis=0, keepdims=True)                # (1, nl)
    w = _exp(logits - m_)
    denom = jnp.sum(w, axis=0, keepdims=True)
    if quantized:
        vp_big = pltpu.repeat(v_plane, bt, axis=1).astype(jnp.float32)
        w_v = w * vp_big
        ws_row = jnp.maximum(jnp.max(w_v, axis=0, keepdims=True), 1e-30) \
            / INT8_QMAX
        wq = jnp.round(w_v / ws_row).astype(jnp.int8)          # (M, nl)
        out_big = jax.lax.dot_general(
            wq, v_mem, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        out_big = out_big * _row_to_col(ws_row, consts["eye"])  # (nl, E)
    else:
        out_big = jax.lax.dot_general(w.astype(dtype), v_mem,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    out_big = out_big / _row_to_col(denom, consts["eye"])
    return jax.lax.dot_general(consts["S32"], out_big * consts["sel_rep32"],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(s_ref, *refs, bt: int, t_len: int, m_len: int, e: int, h: int,
            nlayers: int, dtype, quantized: bool, tt: int,
            w8a8: bool = False, w4a8: bool = False, mem_group: int = 1,
            manual_wdma: bool = False, manual_cdma: bool = False,
            n_tiles: int = 1, n_cslots: int = 2, ea: int | None = None,
            tp: int = 1):
    ea = e if ea is None else ea
    ws_ref = None
    ksc_buf = vsc_buf = mksc_buf = mvsc_buf = None
    if w4a8:
        # int4 mode: the last six scratch refs hold this layer's UNPACKED
        # (IN, OUT) int8 weights (filled once per layer at its first tile;
        # w4a8 excludes tp, so this peel never collides with the tp peel)
        *refs, u_qkv, u_sout, u_cq, u_cout, u_ff1, u_ff2 = refs
        ubufs = (u_qkv, u_sout, u_cq, u_cout, u_ff1, u_ff2)
    if tp > 1:
        # tensor-parallel shard: the last four scratch refs are the
        # all-reduce exchange buffers/semaphores (see tp_allreduce below)
        *refs, tp_send, tp_recv, tp_ssem, tp_rsem = refs
    if manual_cdma:
        if quantized:
            *refs, kc_buf, vc_buf, ksc_buf, vsc_buf, mkc_buf, mvc_buf, \
                mksc_buf, mvsc_buf, csem = refs
        else:
            *refs, kc_buf, vc_buf, mkc_buf, mvc_buf, csem = refs
    if manual_wdma:
        *refs, wq_buf, wso_buf, wcq_buf, wco_buf, wf1_buf, wf2_buf, \
            wsem = refs
        wbufs = (wq_buf, wso_buf, wcq_buf, wco_buf, wf1_buf, wf2_buf)
    if quantized:
        if w8a8 or w4a8:
            (x_in_ref, w_qkv_ref, w_sout_ref, w_cq_ref, w_cout_ref, w_ff1_ref,
             w_ff2_ref, misc_ref, k_ref, v_ref, ks_ref, vs_ref, mk_ref,
             mv_ref, mks_ref, mvs_ref, mbias_ref, ws_ref,
             x_out_ref, kt_ref, vt_ref, kst_ref, vst_ref, x_state, mask_self, mask_cross) = refs
        else:
            (x_in_ref, w_qkv_ref, w_sout_ref, w_cq_ref, w_cout_ref, w_ff1_ref,
             w_ff2_ref, misc_ref, k_ref, v_ref, ks_ref, vs_ref, mk_ref,
             mv_ref, mks_ref, mvs_ref, mbias_ref,
             x_out_ref, kt_ref, vt_ref, kst_ref, vst_ref, x_state, mask_self, mask_cross) = refs
    else:
        (x_in_ref, w_qkv_ref, w_sout_ref, w_cq_ref, w_cout_ref, w_ff1_ref,
         w_ff2_ref, misc_ref, k_ref, v_ref, mk_ref, mv_ref, mbias_ref,
         x_out_ref, kt_ref, vt_ref, x_state, mask_self, mask_cross) = refs
        ks_ref = vs_ref = mks_ref = mvs_ref = kst_ref = vst_ref = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    pos = s_ref[0]
    dh = ea // h
    scale = 1.0 / math.sqrt(dh)

    if tp > 1:
        # In-kernel tensor-parallel all-reduce (tp a power of 2): the
        # partial (bt, E) fp32 output of each row-parallel projection (self
        # out, cross out, ff2) is summed across the model shards over ICI
        # via remote DMA — the Megatron reduction (reference decode protocol
        # kv_caching.py:258-302 numerics, now latency-scaled) without
        # leaving the fused layer-stack kernel. tp=2 is one peer exchange;
        # tp=4 runs recursive doubling (round r exchanges the running sum
        # with the shard at model-coordinate XOR (1<<r) — 2 rounds, each of
        # the full (bt, E) buffer; latency-optimal for these tiny buffers
        # where a ring's 2(k-1) hops would lose). Slot rotation: a device
        # can run at most one exchange ahead of any partner it just
        # synchronized with (rdma.wait() requires the partner's send), and
        # partners chain across all tp shards within nr rounds, so skew is
        # bounded by nr exchanges; the 2·nr rotation slots exceed that
        # reuse distance.
        nr = tp.bit_length() - 1  # recursive-doubling rounds
        n_slots = tp_send.shape[0]
        g_step = i * n_tiles + j

        def tp_allreduce(p32, site):
            acc = p32.astype(jnp.float32)
            base = nr * (3 * g_step + site)
            for r in range(nr):
                slot = jax.lax.rem(base + r, n_slots)
                tp_send[slot, 0:bt] = acc
                rdma = pltpu.make_async_remote_copy(
                    src_ref=tp_send.at[slot], dst_ref=tp_recv.at[slot],
                    send_sem=tp_ssem.at[slot], recv_sem=tp_rsem.at[slot],
                    device_id=s_ref[1 + r],
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                rdma.start()
                rdma.wait()
                acc = acc + tp_recv[slot, 0:bt]
            return acc
    else:
        def tp_allreduce(p32, site):
            del site
            return p32

    if manual_wdma:
        # layer-ahead weight prefetch: all six copies for layer i+1 start at
        # layer i's first tile and are waited at layer i+1's first tile, so
        # the weight DMA has the whole layer to land instead of Mosaic's
        # one-step lookahead (requires in-order tiles: j is "arbitrary")
        slot = jax.lax.rem(i, 2)

        def wdma(layer, s):
            return [pltpu.make_async_copy(hbm.at[layer], buf.at[s],
                                          wsem.at[t, s])
                    for t, (hbm, buf) in enumerate(zip(
                        (w_qkv_ref, w_sout_ref, w_cq_ref, w_cout_ref,
                         w_ff1_ref, w_ff2_ref), wbufs))]

        @pl.when((i == 0) & (j == 0))
        def _():
            for c in wdma(0, 0):
                c.start()
            for c in wdma(0, 0):
                c.wait()

        @pl.when((i > 0) & (j == 0))
        def _():
            for c in wdma(i, slot):
                c.wait()

        if nlayers > 1:
            @pl.when((i + 1 < nlayers) & (j == 0))
            def _():
                for c in wdma(i + 1, jax.lax.rem(i + 1, 2)):
                    c.start()

    if manual_cdma:
        # cache-stream prefetch: step g+S-1's blocks start copying into the
        # next free rotation slot at step g's start, so S-1 grid steps of
        # copies are always in flight and the DMA engines never drain at a
        # step boundary (vs Mosaic's per-operand pipelining, measured as the
        # int8 step's residual to its HBM floor — docs/PERF.md)
        g = i * n_tiles + j
        cslot = jax.lax.rem(g, n_cslots)
        # self-stream time chunking: rows at positions >= pos are dead weight
        # (masked to exp=0 in-compute), so their DMA is skipped per 128-row
        # chunk, gated on the dynamic pos scalar. int8-only (_chunk_skip):
        # skipped chunks leave STALE scratch behind, which is benign for int8
        # (values finite by type, and the scale planes — whose stale bf16
        # bits could be NaN/Inf — always stream fully), but bf16 stale
        # garbage on a fresh VMEM allocation could poison the masked softmax
        # with NaNs.
        ck = 128 if _chunk_skip(quantized) and t_len > 128 else t_len

        def cdma(gi, s):
            """(predicate | None, async_copy) pairs for grid step ``gi``."""
            li = gi // n_tiles
            tj = jax.lax.rem(gi, n_tiles)
            rows = pl.ds(tj * bt, bt)
            copies = []
            for c in range(0, t_len, ck):
                tsl = pl.ds(c, min(ck, t_len - c))
                pred = (pos > c) if ck < t_len else None
                copies += [
                    (pred, pltpu.make_async_copy(
                        k_ref.at[li, rows, tsl], kc_buf.at[s, :, tsl],
                        csem.at[0, s])),
                    (pred, pltpu.make_async_copy(
                        v_ref.at[li, rows, tsl], vc_buf.at[s, :, tsl],
                        csem.at[1, s])),
                ]
            if quantized:
                copies += [
                    (None, pltpu.make_async_copy(ks_ref.at[li, tj],
                                                 ksc_buf.at[s],
                                                 csem.at[2, s])),
                    (None, pltpu.make_async_copy(vs_ref.at[li, tj],
                                                 vsc_buf.at[s],
                                                 csem.at[3, s])),
                ]
            if mem_group > 1:
                gj = (tj * bt) // mem_group
                copies += [
                    (None, pltpu.make_async_copy(mk_ref.at[li, gj],
                                                 mkc_buf.at[s],
                                                 csem.at[4, s])),
                    (None, pltpu.make_async_copy(mv_ref.at[li, gj],
                                                 mvc_buf.at[s],
                                                 csem.at[5, s])),
                ]
                if quantized:
                    copies += [
                        (None, pltpu.make_async_copy(mks_ref.at[li, gj],
                                                     mksc_buf.at[s],
                                                     csem.at[6, s])),
                        (None, pltpu.make_async_copy(mvs_ref.at[li, gj],
                                                     mvsc_buf.at[s],
                                                     csem.at[7, s])),
                    ]
            else:
                copies += [
                    (None, pltpu.make_async_copy(mk_ref.at[li, rows],
                                                 mkc_buf.at[s],
                                                 csem.at[4, s])),
                    (None, pltpu.make_async_copy(mv_ref.at[li, rows],
                                                 mvc_buf.at[s],
                                                 csem.at[5, s])),
                ]
                if quantized:
                    copies += [
                        (None, pltpu.make_async_copy(mks_ref.at[li, tj],
                                                     mksc_buf.at[s],
                                                     csem.at[6, s])),
                        (None, pltpu.make_async_copy(mvs_ref.at[li, tj],
                                                     mvsc_buf.at[s],
                                                     csem.at[7, s])),
                    ]
            return copies

        def _start(pairs):
            for pred, c in pairs:
                if pred is None:
                    c.start()
                else:
                    pl.when(pred)(lambda c=c: c.start())

        def _wait(pairs):
            # every wait mirrors its start's predicate (pos is constant for
            # the whole call), so signal and wait counts always match
            for pred, c in pairs:
                if pred is None:
                    c.wait()
                else:
                    pl.when(pred)(lambda c=c: c.wait())

        total = nlayers * n_tiles

        @pl.when(g == 0)
        def _():
            # fill the pipeline: steps 0..S-2 (step S-1's copies issue below)
            for k in range(min(n_cslots - 1, total)):
                _start(cdma(k, k))

        if total >= n_cslots:
            @pl.when(g + n_cslots - 1 < total)
            def _():
                nxt = g + n_cslots - 1
                _start(cdma(nxt, jax.lax.rem(nxt, n_cslots)))

        _wait(cdma(g, cslot))

    # per-tile init/flush keep the j grid dimension honestly parallel (no
    # cross-tile reads or writes anywhere in the kernel). The additive
    # attention masks are built once per tile at layer 0 (identical values
    # for every j, so interleaved parallel-j writes are benign) instead of
    # iota/compare/where passes on all nlayers grid steps.
    nl = bt * h
    @pl.when(i == 0)
    def _():
        x_state[j] = x_in_ref[0]
        sub_s = jax.lax.broadcasted_iota(jnp.int32, (bt * t_len, nl), 0)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (bt * t_len, nl), 1)
        valid_s = ((sub_s // t_len) == (lane_s // h)) \
            & ((sub_s % t_len) < pos)
        # bf16 masks: 0.0 is exact on valid entries (additive identity) and
        # the NEG_INF magnitude only needs exp() to underflow to 0
        mask_self[...] = jnp.where(valid_s, 0.0, nn.NEG_INF) \
            .astype(jnp.bfloat16)
        if mem_group == 1:
            sub_c = jax.lax.broadcasted_iota(jnp.int32, (bt * m_len, nl), 0)
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (bt * m_len, nl), 1)
            # bias-free and identical across tiles -> one shared slot (the
            # per-tile padding bias is added per step; one cheap pass)
            mask_cross[...] = jnp.where((sub_c // m_len) == (lane_c // h),
                                        0.0, nn.NEG_INF).astype(jnp.bfloat16)

    # unified views of the current grid step's cache/memory blocks: manual
    # prefetch reads its parity slot of scratch; streamed mode reads the
    # Mosaic-fetched block windows
    if manual_cdma:
        k_blkref, v_blkref = kc_buf.at[cslot], vc_buf.at[cslot]
        mk_blkref, mv_blkref = mkc_buf.at[cslot], mvc_buf.at[cslot]
        ks_pref = ksc_buf.at[cslot] if quantized else None
        vs_pref = vsc_buf.at[cslot] if quantized else None
        mks_pref = mksc_buf.at[cslot] if quantized else None
        mvs_pref = mvsc_buf.at[cslot] if quantized else None
    else:
        k_blkref, v_blkref = k_ref.at[0], v_ref.at[0]
        mk_blkref = mk_ref.at[0, 0] if mem_group > 1 else mk_ref.at[0]
        mv_blkref = mv_ref.at[0, 0] if mem_group > 1 else mv_ref.at[0]
        ks_pref = ks_ref.at[0, 0] if quantized else None
        vs_pref = vs_ref.at[0, 0] if quantized else None
        mks_pref = mks_ref.at[0, 0] if quantized else None
        mvs_pref = mvs_ref.at[0, 0] if quantized else None

    # per-head column selector: sel_c[h, c] = 1 where c // Dh == h (feeds the
    # per-head max in _quant_rows)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (h, ea), 1) // dh
    head_row = jax.lax.broadcasted_iota(jnp.int32, (h, ea), 0)
    sel_c = (lane_head == head_row).astype(jnp.float32)

    misc = misc_ref[0]
    b_qkv = misc[0:1, :3 * ea]
    b_sout, b_cq, b_cout = misc[1:2, :e], misc[2:3, :ea], misc[3:4, :e]
    b_ff1, b_ff2 = misc[4:5, :], misc[5:6, :e]
    ln1s, ln1b = misc[6:7, :e], misc[7:8, :e]
    ln2s, ln2b = misc[8:9, :e], misc[9:10, :e]
    ln3s, ln3b = misc[10:11, :e], misc[11:12, :e]

    if manual_wdma:
        def wread(wref, srow):
            del wref
            return wbufs[srow][slot]
    else:
        def wread(wref, srow):
            del srow
            return wref[0]

    if w4a8:
        ws4 = ws_ref[0]                                     # (6, F) fp32
        w4refs = (w_qkv_ref, w_sout_ref, w_cq_ref, w_cout_ref,
                  w_ff1_ref, w_ff2_ref)

        # unpack this layer's six packed-nibble matrices ONCE, at the
        # layer's first batch tile, into full (IN, OUT) int8 scratch; the
        # matmuls then ride the SAME _qdot path as W8A8 (per-column
        # scales; the per-half-scale variant with split dots measured
        # +1.46 ms/step at B=32 — the split-dot machinery, not the
        # unpack, was the entire cost). Requires in-order tiles
        # (decode_layers forces "arbitrary" j under w4a8).
        if "w4unpack" not in _ABLATE:  # timing-only: stale scratch weights
            # full logical dims per matrix (w4a8 excludes tp, so ea == e)
            w4_fulls = ((e, 3 * ea), (ea, e), (e, ea), (ea, e),
                        (e, w_ff1_ref.shape[-1]), (w_ff1_ref.shape[-1], e))

            @pl.when(j == 0)
            def _():
                # identity-dot conversion: packed int8 -> int32 through the
                # MXU, so the (32,128)->(8,128) relayout rides the matmul
                # instead of the VPU (tools/unpack_probe.py: 12.5 vs 25.8
                # us per ff1-sized block; i16/i8 shift/div don't lower).
                # Every matrix's contracted dim is E/2 by the pack-axis
                # rule, so one identity serves all six.
                d = ea // 2
                eye8 = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
                        == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
                        ).astype(jnp.int8)
                for m_i, ub in enumerate(ubufs):
                    cin, cout = w4_fulls[m_i]
                    wp = wread(w4refs[m_i], m_i)
                    if int4_pack_axis(cin, cout) == 0:
                        conv = jax.lax.dot_general(
                            eye8, wp, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        lo4, hi4 = unpack_int4(conv.astype(jnp.float32))
                        ub[0:cin // 2] = lo4.astype(jnp.int8)
                        ub[cin // 2:] = hi4.astype(jnp.int8)
                    else:
                        conv = jax.lax.dot_general(
                            wp, eye8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        lo4, hi4 = unpack_int4(conv.astype(jnp.float32))
                        ub[:, 0:cout // 2] = lo4.astype(jnp.int8)
                        ub[:, cout // 2:] = hi4.astype(jnp.int8)

        def mat(xv, wref, srow, width):
            del wref
            return _qdot(xv, ubufs[srow][...], ws4[srow:srow + 1, :width])
    elif w8a8:
        ws = ws_ref[0]                                      # (6, F) fp32

        def mat(xv, wref, srow, width):
            return _qdot(xv, wread(wref, srow), ws[srow:srow + 1, :width])
    else:
        def mat(xv, wref, srow, width):
            del width
            return jnp.dot(xv, wread(wref, srow),
                           preferred_element_type=jnp.float32)

    x = x_state[j, 0:bt, :]                                 # (bt, E)

    # ---- self-attention (+ cache append) ----
    qkv = (mat(x, w_qkv_ref, 0, 3 * ea) + b_qkv).astype(dtype)  # (bt, 3E)
    q_all = qkv[:, :ea]
    k_all = qkv[:, ea:2 * ea]
    v_all = qkv[:, 2 * ea:]

    base = (pos // tt) * tt
    if quantized:
        qq_all, qs_e, qs_h = _quant_rows_or_ablate(q_all.astype(jnp.float32), dh, sel_c)
        kq_all, ks_e, ks_h = _quant_rows_or_ablate(k_all.astype(jnp.float32), dh, sel_c)
        vq_all, vs_e, vs_h = _quant_rows_or_ablate(v_all.astype(jnp.float32), dh, sel_c)

    consts = _batched_consts(bt, h, ea, dtype)
    nl = bt * h
    # cache append, all rows at once (one tt-sublane tile per row)
    sub3 = base + jax.lax.broadcasted_iota(jnp.int32, (bt, tt, ea), 1)
    sub2 = base + jax.lax.broadcasted_iota(jnp.int32, (tt, nl), 0)
    if quantized:
        kt_ref[0] = jnp.where(
            sub3 == pos, kq_all[:, None, :],
            k_blkref[:, pl.ds(base, tt), :].astype(jnp.float32)
        ).astype(jnp.int8)
        vt_ref[0] = jnp.where(
            sub3 == pos, vq_all[:, None, :],
            v_blkref[:, pl.ds(base, tt), :].astype(jnp.float32)
        ).astype(jnp.int8)
        # scale planes are lane-packed (T, bt*H); pack the new row via the
        # exact MXU gadget (values are bf16-rounded by _quant_rows)
        if "packscale" in _ABLATE:  # timing-only stand-in
            ks_row = vs_row = jnp.ones((1, nl), jnp.float32)
        else:
            ks_row = _pack_scale_row(ks_h, consts)         # (1, nl) f32
            vs_row = _pack_scale_row(vs_h, consts)
        if nl % 128:
            # sub-128-lane plane blocks (bt*H < 128, e.g. beam-4 tiles):
            # Mosaic rejects memref row-slices whose lane extent is not
            # tile-aligned, so select rows [base, base+tt) of the whole
            # plane with a one-hot (tt, T) gadget dot instead — exact
            # (0/1 matrix x bf16-valued f32 scales; dynamic_slice on
            # values has no Pallas TC lowering)
            rowsel = (jax.lax.broadcasted_iota(jnp.int32, (tt, t_len), 1)
                      == base
                      + jax.lax.broadcasted_iota(jnp.int32, (tt, t_len), 0)
                      ).astype(jnp.float32)
            ks_win = jax.lax.dot_general(
                rowsel, ks_pref[...].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vs_win = jax.lax.dot_general(
                rowsel, vs_pref[...].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            ks_win = ks_pref[pl.ds(base, tt), :].astype(jnp.float32)
            vs_win = vs_pref[pl.ds(base, tt), :].astype(jnp.float32)
        kst_ref[0, 0] = jnp.where(sub2 == pos, ks_row,
                                  ks_win).astype(kst_ref.dtype)
        vst_ref[0, 0] = jnp.where(sub2 == pos, vs_row,
                                  vs_win).astype(vst_ref.dtype)
        p_rows = (qq_all * qs_e) * (kq_all * ks_e)
        if "selfattn" in _ABLATE:  # timing-only: skip the self-attention site
            attn32 = qq_all * qs_e
        else:
            attn32 = _attend_all(
                (qq_all, qs_h, qs_e), (p_rows, vq_all * vs_e),
                k_blkref[...], v_blkref[...], mask_self[...], pos, t_len, bt,
                h, ea, scale, dtype, consts, k_plane=ks_pref[...],
                v_plane=vs_pref[...])
    else:
        kt_ref[0] = jnp.where(sub3 == pos, k_all[:, None, :],
                              k_blkref[:, pl.ds(base, tt), :])
        vt_ref[0] = jnp.where(sub3 == pos, v_all[:, None, :],
                              v_blkref[:, pl.ds(base, tt), :])
        p_rows = q_all.astype(jnp.float32) * k_all.astype(jnp.float32)
        if "selfattn" in _ABLATE:  # timing-only: skip the self-attention site
            attn32 = q_all.astype(jnp.float32)
        else:
            attn32 = _attend_all(
                q_all, (p_rows, v_all.astype(jnp.float32)),
                k_blkref[...], v_blkref[...], mask_self[...], pos, t_len, bt,
                h, ea, scale, dtype, consts)
    attn = attn32.astype(dtype)
    so = (tp_allreduce(mat(attn, w_sout_ref, 1, e), 0) + b_sout).astype(dtype)
    x = _ln(x + so, ln1s, ln1b, 1e-5)

    # ---- cross-attention over the precomputed memory K/V ----
    qc = (mat(x, w_cq_ref, 2, ea) + b_cq).astype(dtype)
    if "crossattn" in _ABLATE:  # timing-only: skip the cross-attention site
        cattn32 = qc.astype(jnp.float32)
    elif mem_group > 1 and quantized:
        qcq_all, qcs_e, qcs_h = _quant_rows_or_ablate(
            qc.astype(jnp.float32), dh, sel_c)
        cattn32 = _attend_shared(
            (qcq_all, qcs_h, qcs_e), mk_blkref[...], mv_blkref[...],
            mbias_ref[...].reshape(m_len, 1), ea, scale, dtype, consts,
            bt=bt, h=h, k_plane=mks_pref[...], v_plane=mvs_pref[...])
    elif mem_group > 1:
        # grouped: every row of this tile shares the tile's single memory
        cattn32 = _attend_shared(
            qc, mk_blkref[...], mv_blkref[...],
            mbias_ref[...].reshape(m_len, 1), ea, scale, dtype, consts)
    elif quantized:
        bias_flat = mbias_ref[...].reshape(bt * m_len, 1)
        qcq_all, qcs_e, qcs_h = _quant_rows_or_ablate(
            qc.astype(jnp.float32), dh, sel_c)
        cattn32 = _attend_all(
            (qcq_all, qcs_h, qcs_e), None, mk_blkref[...], mv_blkref[...],
            mask_cross[...], pos, m_len, bt, h, ea, scale, dtype, consts,
            k_plane=mks_pref[...], v_plane=mvs_pref[...], bias=bias_flat)
    else:
        bias_flat = mbias_ref[...].reshape(bt * m_len, 1)
        cattn32 = _attend_all(
            qc, None, mk_blkref[...], mv_blkref[...], mask_cross[...], pos,
            m_len, bt, h, ea, scale, dtype, consts, bias=bias_flat)
    cattn = cattn32.astype(dtype)
    co = (tp_allreduce(mat(cattn, w_cout_ref, 3, e), 1) + b_cout).astype(dtype)
    x = _ln(x + co, ln2s, ln2b, 1e-5)

    # ---- feed-forward ----
    h1 = (mat(x, w_ff1_ref, 4, w_ff1_ref.shape[-1])
          + b_ff1[:, :w_ff1_ref.shape[-1]]).astype(dtype)
    # exact-form GELU with a rational erf (Mosaic lowers neither erf nor the
    # erfc that jax.nn.gelu(approximate=False) expands to); the 1.5e-7 erf
    # error is far below bf16 activation resolution
    if "gelu" in _ABLATE:  # timing-only: identity activation
        g = h1
    else:
        h32 = h1.astype(jnp.float32)
        g = (0.5 * h32 * (1.0 + _erf(h32 / math.sqrt(2.0)))).astype(dtype)
    f2 = (tp_allreduce(mat(g, w_ff2_ref, 5, e), 2) + b_ff2).astype(dtype)
    x = _ln(x + f2, ln3s, ln3b, 1e-5)

    x_state[j, 0:bt, :] = x

    @pl.when(i == nlayers - 1)
    def _():
        x_out_ref[0] = x_state[j]


def decode_layers(mono: Params, x: jnp.ndarray, pos, k_cache, v_cache,
                  mem_k, mem_v, mem_bias_col, *, num_heads: int,
                  k_scale=None, v_scale=None, mem_k_scale=None,
                  mem_v_scale=None, mem_group: int = 1,
                  interpret: bool | None = None,
                  tp: int = 1, tp_peer=None):
    """Run the full decoder layer stack for one token.

    x: (B, E) compute dtype (embedded token); k_cache/v_cache: (L, B, T, E)
    time-major caches (aliased and appended in place at ``pos``); mem_k/mem_v:
    (L, B, M, E); mem_bias_col: (B, M, 1) fp32 additive padding bias. With
    int8 caches, pass bf16 **lane-packed** scale planes k_scale/v_scale
    (L, B/G, T, G*H) and mem_*_scale (L, B/G, M, G*H) with
    G = :func:`scale_pack_group` (pack with :func:`pack_scales`); narrow
    (·, H)-lane planes stream at ~22% of HBM peak, which bound the int8
    mode (tools/narrow_lane_dma_probe.py). The new token's scales are
    appended in place alongside its K/V. Returns (x_out (B, E), k_cache',
    v_cache'[, k_scale', v_scale']).

    ``mem_group=G > 1`` (GRPO rollouts / beam search): every G consecutive
    batch rows share one memory — mem_k/mem_v carry only the B/G unique rows
    and each grid step streams its group's single (M, E) block
    (:func:`_attend_shared`), 1/G the cross-KV HBM traffic of replicating.
    Grouped + int8 compose: the SELF planes stay lane-packed as above, but
    mem_k_scale/mem_v_scale must be the shared narrow layout (L, B/G, M, H)
    bf16 — one tiny plane per unique image, NOT ``pack_scales``-packed (the
    kernel repeats it across the tile's lane blocks).
    """
    nlayers, b, t_len, ea = k_cache.shape
    e = x.shape[-1]          # residual width; == ea except under tp shards
    m_len = mem_k.shape[2]
    f = mono["w_ff1"].shape[-1]
    h = num_heads            # LOCAL head count under tp
    quantized = k_scale is not None
    if tp > 1:
        # in-kernel all-reduce tensor parallelism (tp=2 or tp=4; recursive
        # doubling in tp_allreduce). int8 caches compose: cache/scale
        # quantization is per-(row, head) and heads are whole per shard, so
        # shard-local quantization is bit-identical to the single-device
        # int8 kernel; the row-parallel partial outputs all-reduce in fp32
        # exactly as in the bf16 path. W8A8 stays opt-in (its per-row
        # activation max spans the contraction axis TP splits, so sharded
        # W8A8 is a DIFFERENT quantization than single-chip —
        # decode_segment keeps weights bf16 under tp by default). Grouped
        # memories (mem_group > 1) ride the same kernel: the shared
        # (M, E/tp) memory block and its narrow (M, H/tp) scale planes are
        # already per-shard slices, orthogonal to the all-reduce.
        if tp not in (2, 4):
            raise ValueError("monolith tp requires tp in (2, 4)")
    if mem_group > 1:
        if mem_k.shape[1] * mem_group != b:
            raise ValueError(
                f"mem rows {mem_k.shape[1]} x group {mem_group} != batch {b}")
    if interpret is None:
        interpret = _INTERPRET
    if interpret and tp > 1 and not isinstance(interpret, pltpu.InterpretParams):
        # the legacy generic interpreter does not simulate remote DMAs /
        # semaphores; the TPU interpret mode does (multi-device shared
        # memory keyed by logical device id)
        interpret = pltpu.InterpretParams()
    dtype = x.dtype
    tt = time_tile(k_cache.dtype)
    bt = pick_row_tile(b, t_len, m_len, ea, jnp.dtype(k_cache.dtype).itemsize,
                       num_heads, mem_group, w8a8="wscale" in mono,
                       w4a8="wscale4" in mono,
                       manual_cdma=(_manual_cdma(k_scale is not None)
                                    and tp == 1))
    grid = (nlayers, b // bt)
    if tp > 1:
        # s_ref layout: [pos, peer_round0, peer_round1, ...] — one peer per
        # recursive-doubling round (tp=2: one, tp=4: two)
        peers = jnp.atleast_1d(jnp.asarray(tp_peer, jnp.int32))
        if peers.shape[0] != tp.bit_length() - 1:
            raise ValueError(
                f"tp={tp} needs {tp.bit_length() - 1} peer ids, got "
                f"{peers.shape[0]}")
        scalars = jnp.concatenate(
            [jnp.asarray(pos, jnp.int32).reshape(1), peers])
    else:
        scalars = jnp.asarray([pos], jnp.int32)

    manual_wdma = _manual_wdma(quantized) and tp == 1
    manual_cdma = _manual_cdma(quantized) and tp == 1
    if quantized and (bt * h) % 128:
        # lane-packed self scale planes narrower than one 128-lane tile
        # (bt*H < 128, e.g. beam-4 x 16 heads = 64 lanes) cannot be
        # .at[]-sliced for the manual cache-DMA (Mosaic rejects DMA slices
        # not aligned to the 128-lane tiling of the lane-padded array);
        # deliver every stream via BlockSpec windows instead — a window's
        # lane dim equal to the array's own lane dim is always legal.
        manual_cdma = False
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)

    def wspec(shape):
        if manual_wdma:
            # full array stays in HBM; the kernel streams per-layer blocks
            # into its own double-buffered scratch a layer ahead
            return pl.BlockSpec(memory_space=pl.ANY)
        return pl.BlockSpec((1,) + shape, lambda i, j, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def cache_spec(length, width):
        if manual_cdma:
            # full array stays in HBM; the kernel prefetches per-step blocks
            # into double-buffered scratch one grid step ahead
            return hbm_spec
        return pl.BlockSpec((1, bt, length, width),
                            lambda i, j, s: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(width):
        return pl.BlockSpec((1, bt, tt, width),
                            lambda i, j, s: (i, j, s[0] // tt, 0),
                            memory_space=pltpu.VMEM)

    # hidden state travels as (J, 16, E) tiles so each grid step touches only
    # its own tile (j stays an honestly parallel grid dimension)
    n_tiles = b // bt
    x_tiles = jnp.zeros((n_tiles, max(bt, 16), e), dtype)
    x_tiles = x_tiles.at[:, :bt].set(x.reshape(n_tiles, bt, e))
    xt_spec = pl.BlockSpec((1, max(bt, 16), e), lambda i, j, s: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        xt_spec,
        wspec(mono["w_qkv"].shape[1:]), wspec(mono["w_self_out"].shape[1:]),
        wspec(mono["w_cross_q"].shape[1:]), wspec(mono["w_cross_out"].shape[1:]),
        wspec(mono["w_ff1"].shape[1:]), wspec(mono["w_ff2"].shape[1:]),
        # misc rows are padded to the FULL mlp width even on tp shards
        pl.BlockSpec((1, 12, mono["misc"].shape[-1]),
                     lambda i, j, s: (i, 0, 0), memory_space=pltpu.VMEM),
        cache_spec(t_len, ea), cache_spec(t_len, ea),
    ]
    inputs = [x_tiles, mono["w_qkv"], mono["w_self_out"], mono["w_cross_q"],
              mono["w_cross_out"], mono["w_ff1"], mono["w_ff2"], mono["misc"],
              k_cache, v_cache]
    out_shape = [
        jax.ShapeDtypeStruct(x_tiles.shape, dtype),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    out_specs = [
        xt_spec,
        tile_spec(ea), tile_spec(ea),
    ]
    # alias indices count the scalar-prefetch argument as input 0: the k/v
    # caches are pallas inputs 9/10 -> outputs 1/2 (scale planes 11/12 -> 3/4)
    aliases = {9: 1, 10: 2}
    if quantized:
        nl = bt * h
        expect = (nlayers, b // bt, t_len, nl)
        if k_scale.shape != expect:
            raise ValueError(
                f"int8 scale planes must be lane-packed with group bt={bt}: "
                f"expected {expect}, got {k_scale.shape} — pack with "
                f"pallas_monolith.pack_scales(s, scale_pack_group(...))")

        def scale_spec(length):
            if manual_cdma:
                return hbm_spec
            return pl.BlockSpec((1, 1, length, nl),
                                lambda i, j, s: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)

        scale_tile = pl.BlockSpec((1, 1, tt, nl),
                                  lambda i, j, s: (i, j, s[0] // tt, 0),
                                  memory_space=pltpu.VMEM)
        if mem_group > 1:
            # grouped memory: one shared (M, E) int8 block + one narrow
            # shared (M, H) bf16 scale plane per tile (see _attend_shared)
            mexpect = (nlayers, b // mem_group, m_len, h)
            if mem_k_scale.shape != mexpect:
                raise ValueError(
                    f"grouped int8 memory scale planes must be the shared "
                    f"(L, B/G, M, H) layout: expected {mexpect}, got "
                    f"{mem_k_scale.shape} (do NOT pack_scales them)")
            mem_spec_q = hbm_spec if manual_cdma else pl.BlockSpec(
                (1, 1, m_len, ea), lambda i, j, s: (i, (j * bt) // mem_group,
                                                    0, 0),
                memory_space=pltpu.VMEM)
            mem_scale_spec = hbm_spec if manual_cdma else pl.BlockSpec(
                (1, 1, m_len, h), lambda i, j, s: (i, (j * bt) // mem_group,
                                                   0, 0),
                memory_space=pltpu.VMEM)
            in_specs += [scale_spec(t_len), scale_spec(t_len),
                         mem_spec_q, mem_spec_q,
                         mem_scale_spec, mem_scale_spec]
        else:
            in_specs += [scale_spec(t_len), scale_spec(t_len),
                         cache_spec(m_len, ea), cache_spec(m_len, ea),
                         scale_spec(m_len), scale_spec(m_len)]
        inputs += [k_scale, v_scale, mem_k, mem_v, mem_k_scale, mem_v_scale]
        out_shape += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                      jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        out_specs += [scale_tile, scale_tile]
        aliases[11] = 3
        aliases[12] = 4
    elif mem_group > 1:
        # one shared (M, E) memory block per tile: block index = the tile's
        # group (bt | mem_group, so a tile never straddles groups)
        mem_spec = hbm_spec if manual_cdma else pl.BlockSpec(
            (1, 1, m_len, ea),
            lambda i, j, s: (i, (j * bt) // mem_group, 0, 0),
            memory_space=pltpu.VMEM)
        in_specs += [mem_spec, mem_spec]
        inputs += [mem_k, mem_v]
    else:
        in_specs += [cache_spec(m_len, ea), cache_spec(m_len, ea)]
        inputs += [mem_k, mem_v]
    if mem_group > 1:
        in_specs.append(pl.BlockSpec(
            (1, m_len, 1), lambda i, j, s: ((j * bt) // mem_group, 0, 0),
            memory_space=pltpu.VMEM))
    else:
        in_specs.append(pl.BlockSpec((bt, m_len, 1), lambda i, j, s: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
    inputs.append(mem_bias_col)
    w8a8 = "wscale" in mono
    w4a8 = "wscale4" in mono
    if (w8a8 or w4a8) and not quantized:
        raise ValueError("W8A8/W4A8 weights require int8 caches "
                         "(quantized mode)")
    if w8a8 and w4a8:
        raise ValueError("W8A8 and W4A8 weight packs are exclusive")
    if w4a8 and tp > 1:
        raise ValueError("W4A8 is single-chip only (TP shards use "
                         "ACAI_TP_W8A8 for quantized weights)")
    if w8a8:
        in_specs.append(pl.BlockSpec((1, 6, f), lambda i, j, s: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(mono["wscale"])
    elif w4a8:
        in_specs.append(pl.BlockSpec((1, 6, f), lambda i, j, s: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(mono["wscale4"])

    scratch_shapes = [
        pltpu.VMEM((b // bt, max(bt, 16), e), dtype),
        pltpu.VMEM((bt * t_len, bt * h), jnp.bfloat16),  # self mask_add
        # cross mask_add — unused in grouped mode (dense logits)
        pltpu.VMEM((8, 128) if mem_group > 1 else (bt * m_len, bt * h),
                   jnp.bfloat16),
    ]
    if manual_wdma:
        # double-buffered weight slots at the OPERANDS' own shapes (the
        # attention widths are ea, not e, when decoding sliced shards —
        # e.g. tools/tp_shard_bench.py's single-chip shard-shape runs)
        wdt = mono["w_qkv"].dtype
        scratch_shapes += [
            pltpu.VMEM((2,) + mono[k].shape[1:], wdt)
            for k in ("w_qkv", "w_self_out", "w_cross_q", "w_cross_out",
                      "w_ff1", "w_ff2")
        ] + [pltpu.SemaphoreType.DMA((6, 2))]
    n_cslots = 2
    if manual_cdma:
        # slot count = prefetch depth + 1 (see pick_cslots): int8 blocks at
        # bt=8 are small enough for three slots, keeping two steps of copies
        # in flight so the DMA engines never drain at a grid-step boundary
        # (measured: the 2-slot skeleton sat ~10% above the floor)
        cdt = k_cache.dtype
        nl = bt * h
        # budget with the CACHE lane width ea (== what the scratch below
        # allocates), not the residual width e — at sliced shard shapes
        # (ea != e, tools/tp_shard_bench) the e-based plan under-counted
        # the budget headroom and could pick a shallower slot count than
        # the executed tiles admit (round-4 review)
        n_cslots = pick_cdma_plan(
            b, t_len, m_len, ea, jnp.dtype(k_cache.dtype).itemsize,
            num_heads, mem_group, w8a8="wscale" in mono,
            w4a8="wscale4" in mono)[1]
        S = n_cslots
        cw = k_cache.shape[-1]                  # == ea (cache lane width)
        scratch_shapes += [pltpu.VMEM((S, bt, t_len, cw), cdt),
                           pltpu.VMEM((S, bt, t_len, cw), cdt)]
        if quantized:
            scratch_shapes += [pltpu.VMEM((S, t_len, nl), k_scale.dtype),
                               pltpu.VMEM((S, t_len, nl), v_scale.dtype)]
        mw_lane = mem_k.shape[-1]
        mshape = ((S, m_len, mw_lane) if mem_group > 1
                  else (S, bt, m_len, mw_lane))
        scratch_shapes += [pltpu.VMEM(mshape, mem_k.dtype),
                           pltpu.VMEM(mshape, mem_v.dtype)]
        if quantized:
            mw = h if mem_group > 1 else nl
            scratch_shapes += [pltpu.VMEM((S, m_len, mw), mem_k_scale.dtype),
                               pltpu.VMEM((S, m_len, mw), mem_v_scale.dtype)]
        scratch_shapes += [pltpu.SemaphoreType.DMA((8, S))]
    if tp > 1:
        # all-reduce exchange buffers: 2·nr rotation slots of (bt, E) fp32
        # partials + send/recv DMA semaphores (see _kernel.tp_allreduce —
        # the reuse distance must exceed the nr-exchange skew bound)
        bt_pad = max(bt, 8)
        s_tp = 2 * (tp.bit_length() - 1)
        scratch_shapes += [pltpu.VMEM((s_tp, bt_pad, e), jnp.float32),
                           pltpu.VMEM((s_tp, bt_pad, e), jnp.float32),
                           pltpu.SemaphoreType.DMA((s_tp,)),
                           pltpu.SemaphoreType.DMA((s_tp,))]
    if w4a8:
        # per-layer unpacked int8 weights (peeled FIRST in _kernel; w4a8
        # excludes tp so the peel order is unambiguous): full (IN, OUT)
        # logical shapes — note ff2 packs its OUTPUT axis (int4_pack_axis)
        scratch_shapes += [
            pltpu.VMEM(fd, jnp.int8)
            for fd in ((e, 3 * ea), (ea, e), (e, ea), (ea, e),
                       (e, f), (f, e))
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _kernel, bt=bt, t_len=t_len, m_len=m_len, e=e, h=h,
        nlayers=nlayers, dtype=dtype, quantized=quantized, tt=tt, w8a8=w8a8,
        w4a8=w4a8, mem_group=mem_group, manual_wdma=manual_wdma,
        manual_cdma=manual_cdma, n_tiles=n_tiles, n_cslots=n_cslots,
        ea=ea, tp=tp)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            # layers are order-dependent (the hidden state flows through
            # scratch). Without manual weight prefetch, batch tiles within a
            # layer are independent and declaring them parallel lets Mosaic
            # overlap DMA/compute across tiles (+11% measured); the manual
            # prefetch schedule instead needs in-order tiles (copies start/
            # wait at each layer's first tile) and recovers that overlap by
            # giving the weight DMA a whole layer of lookahead. TP shards
            # must execute exchanges in matching order -> in-order tiles,
            # and the remote DMAs need a collective_id.
            # w4a8's layer-unpack at j == 0 writes scratch later tiles read
            # -> tiles must execute in order
            dimension_semantics=("arbitrary",
                                 "arbitrary" if (manual_wdma or manual_cdma
                                                 or tp > 1 or w4a8)
                                 else "parallel"),
            **({"collective_id": 0} if tp > 1 else {})),
        interpret=interpret,
    )(scalars, *inputs)
    x_out = outs[0][:, :bt].reshape(b, e)
    return (x_out,) + tuple(outs[1:])
