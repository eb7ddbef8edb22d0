"""KV-cached autoregressive decode — the hot path of the whole system.

TPU-native redesign of the reference's cached decode subsystem
(reference: acai_omr/models/kv_caching.py:1-302 and the Python token loops in
acai_omr/models/models.py:600-647, 988-1049). Design:

* **Functional caches.** Per-layer preallocated (B, H, T_cache, Dh) key/value
  arrays live in the decode-loop carry and are updated with indexed writes
  (``.at[:, :, t]``), which XLA performs in place inside the loop — the
  equivalent of the reference's ``cache_pos`` trick (kv_caching.py:94-104)
  without any mutable module state.
* **Cross-attention K/V precomputed once per batch** from the stacked
  ``in_proj`` kv columns (kv_caching.py:235-253), shared by every decode step.
* **The entire token loop is one compiled ``lax.while_loop``** with early exit
  when every sequence has emitted <eos> (models.py:609-611). No per-token
  Python, no host↔device traffic during decode.
* **Segmented cache growth.** Attending over a full 1536-slot cache on every
  step would read ~3x more HBM than the weights themselves. Instead the cache
  is allocated at a small segment length and doubled on demand; each segment
  size is its own compiled program (a handful total thanks to geometric
  growth), so short sequences — the common case — only ever touch short
  caches. This is also what makes streamed generation cheap: stream chunks
  are just small segments.
* Greedy and top-k/temperature-sampled rollout decoding share one step
  function; sampling threads a PRNG key through the carry
  (rollout parity: models.py:988-1049).

All matmuls run in bf16 with fp32 logits/softmax; argmax ties therefore follow
fp32 logit order, matching the reference's autocast decode numerics
(vitomr_inference.py:64-69).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import nn
from .omr_decoder import DecoderConfig

Params = dict


class MemoryKV(NamedTuple):
    """Per-layer cross-attention keys/values, transposed so the sequence axis
    sits on TPU lanes: (L, B, H, Dh, M). ``k_scale``/``v_scale`` are
    (L, B, H, M) dequantization factors when K/V are int8, else None."""
    k: jnp.ndarray
    v: jnp.ndarray
    bias: jnp.ndarray | None  # (B, M) additive padding bias
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None


class DecodeState(NamedTuple):
    seqs: jnp.ndarray        # (B, max_len) int32, pos 0 = <bos>
    log_probs: jnp.ndarray   # (B, max_len) float32
    finished: jnp.ndarray    # (B,) bool
    t: jnp.ndarray           # () int32 — next position to fill
    k_cache: jnp.ndarray     # (L, B, H, Dh, T_cache) — T on lanes
    v_cache: jnp.ndarray     # (L, B, H, Dh, T_cache)
    rng: jnp.ndarray         # PRNG key (unused for greedy)
    # int8 cache mode: per-written-position dequant scales (L, B, H, T_cache)
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None


INT8_QMAX = 127.0


def _quantize_rows(x: jnp.ndarray, scale_dtype=None):
    """(..., Dh) bf16/f32 -> (int8 values, (...,) f32 scale) with max-abs rows.

    ``scale_dtype`` (e.g. bf16 for the monolith's lane-packed scale planes)
    rounds the scale BEFORE quantizing so the stored scale dequantizes
    exactly what was quantized."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / INT8_QMAX
    if scale_dtype is not None:
        scale = scale.astype(scale_dtype).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -INT8_QMAX, INT8_QMAX).astype(jnp.int8)
    return q, scale


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Top-k + temperature sampling for GRPO rollouts (models.py:1005-1020)."""
    top_k: int = 50
    temperature: float = 1.1


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "cache_dtype", "layout"))
def _memory_kv_arrays(params: Params, cfg: DecoderConfig,
                      img_latent: jnp.ndarray, compute_dtype, cache_dtype,
                      layout: str = "hd"):
    """Per-layer cross K/V via a layer scan.

    Projecting all layers at once materializes an (L, B, M, 2E) intermediate
    (7+ GB for GRPO's 128-rollout batches); scanning keeps the live
    intermediate at one layer's (B, M, 2E). ``layout="hd"`` produces
    head-split lane-major (L, B, H, Dh, M) arrays; ``"te"`` keeps the natural
    time-major (L, B, M, E) shape the monolithic decode kernel consumes.
    """
    e = cfg.hidden_dim
    in_kernel = params["blocks"]["cross_attn"]["in_kernel"]  # (L, E, 3E)
    in_bias = params["blocks"]["cross_attn"]["in_bias"]      # (L, 3E)
    mem = img_latent.astype(compute_dtype)

    def one_layer(_, wb):
        kernel, bias_row = wb
        kv = jnp.dot(mem, kernel[:, e:].astype(compute_dtype)) \
            + bias_row[e:].astype(compute_dtype)              # (B, M, 2E)
        k, v = jnp.split(kv, 2, axis=-1)
        if layout == "te":
            if cache_dtype == jnp.int8:
                def qz(x):
                    b_, m_, _ = x.shape
                    xh = x.astype(jnp.float32).reshape(
                        b_, m_, cfg.num_heads, cfg.head_dim)
                    # bf16 scales: stored lane-packed in bf16 planes
                    q, s = _quantize_rows(xh, jnp.bfloat16)    # scale (B,M,H)
                    return q.reshape(b_, m_, -1), s
                kq, ks = qz(k)
                vq, vs = qz(v)
                return None, (kq, vq, ks, vs)
            return None, (k.astype(cache_dtype), v.astype(cache_dtype))

        def heads(x):
            b, m, _ = x.shape
            x = x.reshape(b, m, cfg.num_heads, cfg.head_dim)
            return jnp.transpose(x, (0, 2, 3, 1))             # (B, H, Dh, M)

        kh, vh = heads(k), heads(v)
        if cache_dtype == jnp.int8:
            kq, ks = _quantize_rows(jnp.swapaxes(kh, -1, -2))
            vq, vs = _quantize_rows(jnp.swapaxes(vh, -1, -2))
            return None, (jnp.swapaxes(kq, -1, -2), jnp.swapaxes(vq, -1, -2), ks, vs)
        return None, (kh.astype(cache_dtype), vh.astype(cache_dtype))

    _, outs = jax.lax.scan(one_layer, None, (in_kernel, in_bias))
    return outs


def precompute_memory_kv(params: Params, cfg: DecoderConfig,
                         img_latent: jnp.ndarray,
                         latent_valid: jnp.ndarray | None,
                         compute_dtype=jnp.bfloat16,
                         cache_dtype=jnp.bfloat16,
                         layout: str = "hd") -> MemoryKV:
    """Project encoder memory into per-layer cross K/V once per batch."""
    bias = None
    if latent_valid is not None:
        bias = jnp.where(latent_valid, 0.0, nn.NEG_INF).astype(jnp.float32)
    outs = _memory_kv_arrays(params, cfg, img_latent, compute_dtype,
                             cache_dtype, layout)
    if cache_dtype == jnp.int8:
        k, v, ks, vs = outs
        return MemoryKV(k, v, bias, ks, vs)
    k, v = outs
    return MemoryKV(k, v, bias)


def init_decode_state(cfg: DecoderConfig, batch_size: int, max_len: int,
                      cache_len: int, rng=None,
                      cache_dtype=jnp.bfloat16,
                      monolith: bool = False,
                      scale_group: int | None = None) -> DecodeState:
    """Fresh decode state with <bos>-seeded sequences (models.py:562-573).

    ``monolith=True`` allocates time-major (L, B, T, E) caches for the
    monolithic Pallas decode kernel (ops.pallas_monolith); the default is the
    lane-major (L, B, H, Dh, T) layout of the per-op path. The two are
    distinguished downstream by ndim. With int8 monolith caches the scale
    planes are bf16 and lane-packed as (L, B/G, T, G*H) with
    ``G = scale_group`` (= pallas_monolith.scale_pack_group(...)): narrow
    H-lane planes would stream at ~22% of HBM peak.
    """
    seqs = jnp.full((batch_size, max_len), cfg.pad_idx, dtype=jnp.int32)
    seqs = seqs.at[:, 0].set(cfg.bos_idx)
    log_probs = jnp.zeros((batch_size, max_len), dtype=jnp.float32)
    finished = jnp.zeros((batch_size,), dtype=bool)
    scale_dtype = jnp.float32
    if monolith:
        shape = (cfg.num_layers, batch_size, cache_len, cfg.hidden_dim)
        g = scale_group
        if g is None and cache_dtype == jnp.int8:
            raise ValueError(
                "int8 monolith caches need scale_group="
                "pallas_monolith.scale_pack_group(b, cache_len, m_len, e, h)")
        scale_shape = None if g is None else (
            cfg.num_layers, batch_size // g, cache_len, g * cfg.num_heads)
        scale_dtype = jnp.bfloat16
    else:
        shape = (cfg.num_layers, batch_size, cfg.num_heads, cfg.head_dim,
                 cache_len)
        scale_shape = shape[:3] + (cache_len,)
    k_cache = jnp.zeros(shape, dtype=cache_dtype)
    v_cache = jnp.zeros(shape, dtype=cache_dtype)
    k_scale = v_scale = None
    if cache_dtype == jnp.int8:
        k_scale = jnp.ones(scale_shape, dtype=scale_dtype)
        v_scale = jnp.ones(scale_shape, dtype=scale_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return DecodeState(seqs, log_probs, finished, jnp.int32(1), k_cache,
                       v_cache, rng, k_scale, v_scale)


def cache_len_of(k_cache: jnp.ndarray) -> int:
    """Sequence capacity of a cache array in either layout."""
    return k_cache.shape[2] if k_cache.ndim == 4 else k_cache.shape[-1]


def grow_cache(state: DecodeState, new_cache_len: int) -> DecodeState:
    """Pad the KV caches to a longer segment (host-triggered, rare)."""
    cur = cache_len_of(state.k_cache)
    if new_cache_len <= cur:
        return state
    if state.k_cache.ndim == 4:  # time-major monolith layout
        pad = [(0, 0), (0, 0), (0, new_cache_len - cur), (0, 0)]
        spad = pad
    else:
        pad = [(0, 0)] * 4 + [(0, new_cache_len - cur)]
        spad = [(0, 0)] * 3 + [(0, new_cache_len - cur)]
    return state._replace(
        k_cache=jnp.pad(state.k_cache, pad),
        v_cache=jnp.pad(state.v_cache, pad),
        k_scale=None if state.k_scale is None else jnp.pad(state.k_scale, spad, constant_values=1.0),
        v_scale=None if state.v_scale is None else jnp.pad(state.v_scale, spad, constant_values=1.0))


# ---------------------------------------------------------------------------
# one decode step
# ---------------------------------------------------------------------------

def decode_attention(q: jnp.ndarray, kT: jnp.ndarray, vT: jnp.ndarray,
                     bias: jnp.ndarray | None,
                     compute_dtype=jnp.bfloat16,
                     k_scale: jnp.ndarray | None = None,
                     v_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Single-token attention against a transposed cache.

    q: (B, H, Dh); kT/vT: (B, H, Dh, T) with the sequence axis on lanes;
    bias: (B, T) additive (0 / NEG_INF) or None. With int8 caches,
    k_scale/v_scale (B, H, T) dequantize after the dots (the int8 -> compute
    cast fuses into the matmul read, so HBM traffic stays int8).
    Returns (B, H, Dh); fp32 softmax. The Pallas fused kernel
    (ops.pallas_decode) plugs in here on TPU for the bf16 path.
    """
    from ..ops import pallas_decode
    if pallas_decode.use_pallas(q, kT):
        return pallas_decode.decode_attention(q, kT, vT, bias, compute_dtype,
                                              k_scale, v_scale)

    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhd,bhdt->bht", q.astype(compute_dtype),
                        kT.astype(compute_dtype),
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        logits = logits * k_scale
    if bias is not None:
        logits = logits + bias[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        w = w * v_scale
    out = jnp.einsum("bht,bhdt->bhd", w.astype(compute_dtype),
                     vT.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(compute_dtype)


def _grouped_cross_attention(qc: jnp.ndarray, mem: MemoryKV, i: int,
                             group: int, compute_dtype=jnp.bfloat16):
    """Cross-attention where G consecutive batch rows share one memory.

    qc: (B, H, Dh) with B = B_unique * group; mem arrays carry only the
    unique rows (L, B_u, H, Dh, M). Folding the group into the query axis
    reads each memory once per group instead of once per row (GRPO rollouts
    replicate each image's latent G times — models.py:883-891).
    """
    bu = mem.k.shape[1]
    h, dh = qc.shape[1], qc.shape[2]
    q = qc.reshape(bu, group, h, dh)
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum("bghd,bhdm->bghm", q.astype(compute_dtype),
                        mem.k[i].astype(compute_dtype),
                        preferred_element_type=jnp.float32) * scale
    if mem.k_scale is not None:
        logits = logits * mem.k_scale[i][:, None]
    if mem.bias is not None:
        logits = logits + mem.bias[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    if mem.v_scale is not None:
        w = w * mem.v_scale[i][:, None]
    out = jnp.einsum("bghm,bhdm->bghd", w.astype(compute_dtype),
                     mem.v[i].astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(bu * group, h, dh).astype(compute_dtype)


def _row_parallel_dense(p: Params, x: jnp.ndarray, tp_axis: str) -> jnp.ndarray:
    """Row-parallel linear under shard_map: local (B, F/tp) @ (F/tp, E)
    partial products are psum'd over ``tp_axis``, bias added once after."""
    y = jax.lax.psum(jnp.dot(x, p["kernel"].astype(x.dtype)), tp_axis)
    return y + p["bias"].astype(x.dtype)


def _decode_step_logits(params: Params, cfg: DecoderConfig, x: jnp.ndarray,
                        t: jnp.ndarray, caches: dict, mem: MemoryKV,
                        compute_dtype=jnp.bfloat16, mem_group: int = 1,
                        tp_axis: str | None = None):
    """Advance one token: x (B, E) = embedded token at position t-1.

    ``caches``: {"k", "v"[, "ks", "vs"]} pytree of cache arrays (int8 mode
    carries the scale planes). Returns (logits (B, V) fp32, new caches). The
    12-layer loop is unrolled in Python so the cache writes stay simple
    indexed updates on the loop carry (in-place under XLA). ``mem_group=G``:
    mem holds B/G unique rows shared by G consecutive batch rows each.

    ``tp_axis``: Megatron-style tensor parallelism under shard_map — params
    arrive as per-shard slices (``parallel.sharding.tp_shuffle_decoder_params``
    layout: head-parallel qkv/attention, column-parallel linear1), caches and
    mem carry local heads, and the two row-parallel projections (attention
    out, linear2) psum over the axis. LayerNorms/embeddings/unembed are
    replicated and computed redundantly per shard.
    """
    from ..ops import pallas_decode

    e = cfg.hidden_dim
    h, dh = cfg.num_heads, cfg.head_dim
    if tp_axis is not None:
        # local head count from the sharded fused-qkv kernel (E, 3*e_local)
        e_loc = params["blocks"]["self_attn"]["in_kernel"].shape[-1] // 3
        h = e_loc // dh
    else:
        e_loc = e
    b = x.shape[0]
    cache_len = caches["k"].shape[-1]
    pos = t - 1  # cache slot for this token's k/v
    quantized = "ks" in caches
    # fused int8 path: in-kernel cache append + stacked-cache attention (the
    # XLA DUS writes and per-layer operand slices cost more than int8 saves)
    fused_int8 = quantized and pallas_decode.use_pallas(
        jnp.zeros((b, h, dh), compute_dtype), caches["k"][0])
    fused_mem = (mem_group == 1 and mem.k_scale is not None
                 and pallas_decode.use_pallas(
                     jnp.zeros((b, h, dh), compute_dtype), mem.k[0]))

    # positions 0..pos are attendable
    pos_idx = jnp.arange(cache_len)
    self_bias = jnp.where(pos_idx[None, :] <= pos, 0.0, nn.NEG_INF)  # (1, T)
    self_bias = jnp.broadcast_to(self_bias, (b, cache_len)).astype(jnp.float32)

    blocks = params["blocks"]

    def layer(i, x, caches):
        lp = jax.tree.map(lambda a: a[i], blocks)
        sa = lp["self_attn"]
        qkv = jnp.dot(x, sa["in_kernel"].astype(compute_dtype)) + sa["in_bias"].astype(compute_dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h, dh)
        k = k.reshape(b, h, dh)
        v = v.reshape(b, h, dh)
        if fused_int8:
            attn, caches["k"], caches["v"], caches["ks"], caches["vs"] = \
                pallas_decode.self_attention_append_int8(
                    q, k, v, caches["k"], caches["v"], caches["ks"],
                    caches["vs"], i, pos, compute_dtype)
        else:
            if quantized:
                k, ks = _quantize_rows(k)
                v, vs = _quantize_rows(v)
                caches["ks"] = jax.lax.dynamic_update_slice(
                    caches["ks"], ks[None, :, :, None], (i, 0, 0, pos))
                caches["vs"] = jax.lax.dynamic_update_slice(
                    caches["vs"], vs[None, :, :, None], (i, 0, 0, pos))
            caches["k"] = jax.lax.dynamic_update_slice(
                caches["k"], k.astype(caches["k"].dtype)[None, :, :, :, None],
                (i, 0, 0, 0, pos))
            caches["v"] = jax.lax.dynamic_update_slice(
                caches["v"], v.astype(caches["v"].dtype)[None, :, :, :, None],
                (i, 0, 0, 0, pos))
            attn = decode_attention(
                q, caches["k"][i], caches["v"][i], self_bias, compute_dtype,
                k_scale=caches["ks"][i] if quantized else None,
                v_scale=caches["vs"][i] if quantized else None)
        if tp_axis is None:
            attn = nn.dense(sa["out"], attn.reshape(b, e))
        else:
            attn = _row_parallel_dense(sa["out"], attn.reshape(b, e_loc),
                                       tp_axis)
        x = nn.layernorm(lp["norm1"], x + attn, eps=1e-5)

        ca = lp["cross_attn"]
        qc = jnp.dot(x, ca["in_kernel"][:, :e_loc].astype(compute_dtype)) + ca["in_bias"][:e_loc].astype(compute_dtype)
        qc = qc.reshape(b, h, dh)
        if mem_group > 1:
            cattn = _grouped_cross_attention(qc, mem, i, mem_group,
                                             compute_dtype)
        elif fused_mem:
            cattn = pallas_decode.decode_attention_stacked(
                qc, mem.k, mem.v, i, mem.bias, compute_dtype,
                mem.k_scale, mem.v_scale)
        else:
            cattn = decode_attention(
                qc, mem.k[i], mem.v[i], mem.bias, compute_dtype,
                k_scale=mem.k_scale[i] if mem.k_scale is not None else None,
                v_scale=mem.v_scale[i] if mem.v_scale is not None else None)
        if tp_axis is None:
            cattn = nn.dense(ca["out"], cattn.reshape(b, e))
        else:
            cattn = _row_parallel_dense(ca["out"], cattn.reshape(b, e_loc),
                                        tp_axis)
        x = nn.layernorm(lp["norm2"], x + cattn, eps=1e-5)

        h1 = nn.gelu(nn.dense(lp["linear1"], x))  # column-parallel under tp
        if tp_axis is None:
            ff = nn.dense(lp["linear2"], h1)
        else:
            ff = _row_parallel_dense(lp["linear2"], h1, tp_axis)
        x = nn.layernorm(lp["norm3"], x + ff, eps=1e-5)
        return x, caches

    for i in range(cfg.num_layers):
        x, caches = layer(i, x, caches)

    x = nn.layernorm(params["final_norm"], x, eps=1e-6)
    logits = nn.dense(params["unembed"], x).astype(jnp.float32)
    return logits, caches


def _embed_token(params: Params, tok: jnp.ndarray, pos: jnp.ndarray,
                 compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B,) token ids at sequence position ``pos`` -> (B, E)."""
    x = jnp.take(params["vocab_embedding"]["table"], tok, axis=0)
    pe = jax.lax.dynamic_index_in_dim(params["pos_embedding"], pos, axis=0,
                                      keepdims=False)
    return (x + pe).astype(compute_dtype)


# ---------------------------------------------------------------------------
# compiled decode segment
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "num_steps", "sampling",
                                             "compute_dtype", "mem_group",
                                             "tp_axis", "pe_offset"))
def decode_segment(params: Params, cfg: DecoderConfig, state: DecodeState,
                   mem: MemoryKV, num_steps: int,
                   sampling: SamplingConfig | None = None,
                   compute_dtype=jnp.bfloat16,
                   mem_group: int = 1,
                   tp_axis: str | None = None,
                   pe_offset: int = 0,
                   tp_peer=None) -> DecodeState:
    """Run up to ``num_steps`` decode steps inside one lax.while_loop.

    Stops early when all sequences are finished or the segment budget, the
    cache length, or max_len is exhausted. Greedy when ``sampling`` is None,
    else top-k/temperature sampling with per-step PRNG splitting. Time-major
    (4-D) cache states run the monolithic Pallas layer-stack kernel; the
    5-D layout runs the per-op XLA path. ``mem_group=G``: mem carries only
    B/G unique rows, shared by each G consecutive batch rows (grouped
    rollouts/beams).
    """
    max_len = state.seqs.shape[1]
    cache_len = cache_len_of(state.k_cache)
    stop_t = jnp.minimum(state.t + num_steps, min(max_len, cache_len + 1))
    monolith = state.k_cache.ndim == 4
    # tensor-parallel monolith: tp_axis with a 4-D cache marks a TP shard
    # (heads split over tp_axis, cache width = hidden_dim/tp); the kernel's
    # in-kernel ICI all-reduce needs the per-round peer logical device ids
    # (sharded_generate computes them and passes ``tp_peer``)
    tp_mono = monolith and tp_axis is not None
    if monolith:
        from ..ops import pallas_monolith
        ea = state.k_cache.shape[-1]
        h_loc = ea // cfg.head_dim
        mono = pallas_monolith.prepack(
            params, cfg, compute_dtype,
            # weight_quant_mode: "int8" (W8A8, default-on for int8 caches),
            # "int4" (W4A8, ACAI_W4A8_DECODE=1 opt-in — 1/4 the bf16 weight
            # stream), or False. W8A8 defaults off under tp: its per-row
            # activation max spans the contraction axis TP splits, so
            # sharded W8A8 quantizes differently than a single chip (int8
            # CACHES compose exactly — per-(row, head) scales, whole heads
            # per shard). ACAI_TP_W8A8=1 opts in to per-shard W8A8 — the
            # B=1 latency winner (see pallas_monolith.want_tp_w8a8). W4A8
            # never rides tp shards (weight_quant_mode).
            quantize_weights=(False if state.k_scale is None else
                              pallas_monolith.weight_quant_mode(
                                  state.k_cache.dtype, tp_mono)),
            e_attn=ea if tp_mono else None)
        b, m_len = mem.k.shape[1], mem.k.shape[2]
        if mem.bias is None:
            bias_col = jnp.zeros((b, m_len, 1), jnp.float32)
        else:
            bias_col = mem.bias.reshape(b, m_len, 1).astype(jnp.float32)

    def cond(s: DecodeState):
        return (s.t < stop_t) & ~jnp.all(s.finished)

    def body(s: DecodeState):
        prev_tok = jnp.take_along_axis(s.seqs, (s.t - 1)[None, None], axis=1)[:, 0]
        x = _embed_token(params, prev_tok, s.t - 1 + pe_offset, compute_dtype)
        caches = {"k": s.k_cache, "v": s.v_cache}
        if s.k_scale is not None:
            caches["ks"] = s.k_scale
            caches["vs"] = s.v_scale
        if monolith:
            if s.k_scale is not None:  # int8 caches
                (x_out, caches["k"], caches["v"], caches["ks"],
                 caches["vs"]) = pallas_monolith.decode_layers(
                    mono, x, s.t - 1, s.k_cache, s.v_cache, mem.k, mem.v,
                    bias_col, num_heads=h_loc, k_scale=s.k_scale,
                    v_scale=s.v_scale, mem_k_scale=mem.k_scale,
                    mem_v_scale=mem.v_scale, mem_group=mem_group,
                    tp=cfg.hidden_dim // ea if tp_mono else 1,
                    tp_peer=tp_peer if tp_mono else None)
            else:
                x_out, caches["k"], caches["v"] = pallas_monolith.decode_layers(
                    mono, x, s.t - 1, s.k_cache, s.v_cache, mem.k, mem.v,
                    bias_col, num_heads=h_loc, mem_group=mem_group,
                    tp=cfg.hidden_dim // ea if tp_mono else 1,
                    tp_peer=tp_peer if tp_mono else None)
            x_out = nn.layernorm(params["final_norm"], x_out, eps=1e-6)
            logits = nn.dense(params["unembed"], x_out).astype(jnp.float32)
        else:
            logits, caches = _decode_step_logits(
                params, cfg, x, s.t, caches, mem, compute_dtype, mem_group,
                tp_axis)

        rng = s.rng
        if sampling is None:
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lp = jax.nn.log_softmax(logits, axis=-1)
            chosen_lp = jnp.take_along_axis(lp, next_tok[:, None], axis=-1)[:, 0]
        else:
            rng, step_rng = jax.random.split(rng)
            topk_logits, topk_idx = jax.lax.top_k(
                logits, min(sampling.top_k, logits.shape[-1]))
            # sample in top-k space with temperature; log-probs are over the
            # *untempered* top-k logits (reference: models.py:1009-1020)
            choice = jax.random.categorical(
                step_rng, topk_logits / sampling.temperature, axis=-1)
            next_tok = jnp.take_along_axis(topk_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
            topk_lp = jax.nn.log_softmax(topk_logits, axis=-1)
            chosen_lp = jnp.take_along_axis(topk_lp, choice[:, None], axis=-1)[:, 0]

        seqs = jax.lax.dynamic_update_slice(s.seqs, next_tok[:, None], (0, s.t))
        log_probs = jax.lax.dynamic_update_slice(
            s.log_probs, chosen_lp[:, None].astype(jnp.float32), (0, s.t))
        finished = s.finished | (next_tok == cfg.eos_idx)
        return DecodeState(seqs, log_probs, finished, s.t + 1, caches["k"],
                           caches["v"], rng, caches.get("ks"), caches.get("vs"))

    return jax.lax.while_loop(cond, body, state)


# ---------------------------------------------------------------------------
# host-level drivers
# ---------------------------------------------------------------------------

def _next_segment(cur: int, max_len: int, initial: int = 256) -> int:
    return min(max(initial, cur * 2), max_len)


def create_inference_mask(seqs: jnp.ndarray, eos_idx: int) -> jnp.ndarray:
    """True up to and including each row's first <eos> (models.py:550-559)."""
    eos = seqs == eos_idx
    seen = jnp.cumsum(eos.astype(jnp.int32), axis=-1)
    first_eos = eos & (seen == 1)
    return (seen == 0) | first_eos


def mask_and_clip_seqs(seqs, log_probs, eos_idx: int, pad_idx: int):
    """Pad-fill junk after first <eos> and trim excess (models.py:585-596)."""
    mask = create_inference_mask(seqs, eos_idx)
    seqs = jnp.where(mask, seqs, pad_idx)
    log_probs = jnp.where(mask, log_probs, 0.0)
    max_len = int(jnp.max(jnp.sum(mask, axis=-1)))
    return seqs[:, :max_len], log_probs[:, :max_len], mask[:, :max_len]


def generate(params: Params, cfg: DecoderConfig, img_latent, latent_valid,
             *, max_len: int = 1536, sampling: SamplingConfig | None = None,
             rng=None, initial_segment: int = 256, segment_steps: int | None = None,
             compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
             compact: bool = True, mem_group: int = 1, pe_offset: int = 0,
             progress_cb=None):
    """Batched KV-cached generation (greedy or sampled).

    Equivalent of ``ViTOMR.cached_greedy_generate`` /
    ``GRPOViTOMR.cached_forward_rollout_policy`` (models.py:600-615, 988-1049).
    Decodes in geometrically growing cache segments; returns
    (seqs, log_probs, seq_mask) trimmed to the longest live sequence.

    ``mem_group=G > 1``: decode G sequences per row of ``img_latent`` (GRPO
    rollout groups, models.py:883-891) WITHOUT replicating the memory — the
    cross K/V are projected and streamed once per unique image; returns
    G * img_latent.shape[0] rows, ordered group-major (row i*G+g is image i's
    g-th rollout), identical to decoding a ``jnp.repeat``-expanded latent.

    ``progress_cb(seqs, t, finished)``: mid-decode progress hook for
    streaming servers (reference SSE STEP events, ui/routes.py:66-104 /
    models.py:625-647). Called at every segment boundary with the host
    copies of the full master sequence buffer (B, max_len) int32 (row
    order = input order; includes BOS at column 0 and pad tails), the
    current decode position ``t``, and a (B,) finished mask. Granularity =
    ``segment_steps`` (pass e.g. 25 to flush like the reference's
    FLUSH_INTERVAL); each boundary already pays one host round trip for
    the status pull, the extra sequence pull rides the same sync window.

    ``pe_offset=1`` reproduces the reference's *cached* decode PE indexing,
    which embeds token ``seqs[:, t-1]`` with ``pos_embedding[t]``
    (models.py:576 passes ``time_step=t``; models.py:523 indexes with it) —
    one row ahead of the reference's own training/uncached forward. Required
    for bit-identical decode against checkpoints run through the reference's
    ``cached_greedy_generate`` (tools/reference_identity.py proves this).
    The default 0 keeps our decode consistent with the training forward.
    """
    import numpy as np
    from ..ops import pallas_monolith

    if mem_group > 1 and cache_dtype == jnp.int8:
        b_try = img_latent.shape[0] * mem_group
        if not pallas_monolith.use_monolith(
                cfg, b_try, min(initial_segment, max_len),
                img_latent.shape[1], compute_dtype, cache_dtype):
            # the grouped int8 layout is a monolith-kernel feature (shared
            # (M, E) block + narrow shared scale planes); the per-op path
            # needs the replicated layout
            img_latent = jnp.repeat(img_latent, mem_group, axis=0)
            if latent_valid is not None:
                latent_valid = jnp.repeat(latent_valid, mem_group, axis=0)
            mem_group = 1
    g = mem_group
    b = img_latent.shape[0] * g
    m_len = img_latent.shape[1]
    e, heads = cfg.hidden_dim, cfg.num_heads
    cache_len = min(initial_segment, max_len)
    monolith = pallas_monolith.use_monolith(
        cfg, b, cache_len, m_len, compute_dtype, cache_dtype)
    tt = pallas_monolith.time_tile(cache_dtype)
    if monolith:
        cache_len = -(-cache_len // tt) * tt
    mem = precompute_memory_kv(params, cfg, img_latent, latent_valid,
                               compute_dtype, cache_dtype,
                               layout="te" if monolith else "hd")
    packed = monolith and cache_dtype == jnp.int8
    group = None
    if packed:
        # int8 SELF scale planes ride lane-packed
        # (tools/narrow_lane_dma_probe.py); the pack group must equal the
        # kernel's row tile for this shape. Grouped MEMORY planes stay in
        # the shared narrow (L, B/G, M, H) layout (bf16-rounded like the
        # packed planes, so grouped == replicated bit for bit).
        group = pallas_monolith.scale_pack_group(b, cache_len, m_len, e,
                                                 heads, mem_group=g)
        if g == 1:
            mem = mem._replace(
                k_scale=pallas_monolith.pack_scales(
                    mem.k_scale.astype(jnp.bfloat16), group),
                v_scale=pallas_monolith.pack_scales(
                    mem.v_scale.astype(jnp.bfloat16), group))
        else:
            mem = mem._replace(
                k_scale=mem.k_scale.astype(jnp.bfloat16),
                v_scale=mem.v_scale.astype(jnp.bfloat16))
    state = init_decode_state(cfg, b, max_len, cache_len, rng, cache_dtype,
                              monolith=monolith, scale_group=group)

    # master per-original-row results; active rows map into it via row_map
    master_seqs = state.seqs
    master_lps = state.log_probs
    row_map = np.arange(b)

    def write_back(ms, ml, st, rows):
        rows_j = jnp.asarray(rows)
        ms = ms.at[rows_j].set(st.seqs[: len(rows)])
        ml = ml.at[rows_j].set(st.log_probs[: len(rows)])
        return ms, ml

    # num_steps is an upper bound (stop_t also respects cache_len/max_len);
    # keeping it a constant avoids recompiling per segment position.
    steps = segment_steps or max_len
    t_known = 1  # host-side mirror of state.t, refreshed by the status pull
    while True:
        state = decode_segment(params, cfg, state, mem, steps, sampling,
                               compute_dtype, mem_group=g, pe_offset=pe_offset)
        master_seqs, master_lps = write_back(master_seqs, master_lps, state, row_map)
        # Every device->host pull is a full round trip (~29 ms through the
        # axon tunnel — tools/sync probe); when this segment's stop bound
        # already reached max_len the loop is over either way (budget hit or
        # everyone finished), so skip the status pull entirely.
        stop_bound = min(t_known + steps, cache_len_of(state.k_cache) + 1,
                         max_len)
        if stop_bound >= max_len:
            break
        # ONE pull for everything the host needs: [t, finished rows...] —
        # with a progress_cb the master sequence buffer rides the same pull
        # (each device->host pull is a full ~29 ms tunnel round trip;
        # separate status + sequence pulls measured 2x the streaming tax)
        nf = 1 + state.finished.shape[0]
        parts = [state.t[None], state.finished.astype(jnp.int32)]
        if progress_cb is not None:
            parts.append(master_seqs.reshape(-1))
        status = np.asarray(jnp.concatenate(parts))
        t = t_known = int(status[0])
        finished_rows = status[1:nf].astype(bool)
        if progress_cb is not None:
            # rows no longer in row_map were compacted away == finished
            fin_master = np.ones(master_seqs.shape[0], bool)
            fin_master[row_map] = finished_rows[: len(row_map)]
            progress_cb(status[nf:].reshape(master_seqs.shape), t,
                        fin_master)
        if t >= max_len or bool(finished_rows.all()):
            break
        # segment boundary: drop finished rows before continuing (batch
        # compaction — finished rows otherwise keep paying full cache
        # bandwidth until everyone is done; real batches complete
        # raggedly, so this is a large win on mixed-length workloads).
        # With an explicit ``segment_steps`` this fires at EVERY
        # boundary, not just cache growth — mostly-finished batches
        # shrink long before the cache fills (GRPO rollouts: mean length
        # ~40-250 vs a 512-step budget).
        sel = None     # row selection into the current state
        sel_mem = None  # memory-row selection (groups when g > 1)
        if compact:
            finished = finished_rows[: len(row_map)]
            if g == 1:
                unfinished = np.flatnonzero(~finished)
                target_b = max(1, 1 << (len(unfinished) - 1).bit_length()) \
                    if len(unfinished) else 1
                if len(unfinished) and target_b <= len(row_map) // 2:
                    pad_rows = np.full(target_b - len(unfinished),
                                       unfinished[0])
                    sel = jnp.asarray(np.concatenate([unfinished, pad_rows]))
                    sel_mem = sel
                    # duplicate pad rows are marked finished so they can't
                    # block the all-finished early exit
                    fin = jnp.zeros((target_b,), bool) \
                        .at[len(unfinished):].set(True)
                    row_map = row_map[unfinished]
            else:
                # grouped memory: a group is droppable only once every
                # rollout in it finished (its rows share one mem row)
                alive_g = np.flatnonzero(~finished.reshape(-1, g).all(axis=1))
                n_g = len(alive_g)
                target_g = max(1, 1 << (n_g - 1).bit_length()) if n_g else 1
                if n_g and target_g <= (len(row_map) // g) // 2:
                    pad_g = np.full(target_g - n_g, alive_g[0])
                    sel_groups = np.concatenate([alive_g, pad_g])
                    rows = (sel_groups[:, None] * g
                            + np.arange(g)).reshape(-1)
                    sel = jnp.asarray(rows)
                    sel_mem = jnp.asarray(sel_groups)
                    fin_np = finished[rows].copy()
                    fin_np[n_g * g:] = True  # pad groups can't block exit
                    fin = jnp.asarray(fin_np)
                    row_map = row_map[rows[: n_g * g]]
        need_grow = t > cache_len_of(state.k_cache)
        if not (need_grow or sel is not None):
            continue  # plain mid-decode boundary, nothing to do
        new_len = cache_len_of(state.k_cache)
        if need_grow:
            new_len = _next_segment(new_len, max_len)
            if monolith:
                new_len = -(-new_len // tt) * tt
        b_next = len(sel) if sel is not None else state.seqs.shape[0]
        new_group = group
        if packed:
            new_group = pallas_monolith.scale_pack_group(
                b_next, new_len, m_len, e, heads, mem_group=g)

        def move_scales(s):
            """Row-select and/or re-group a scale-plane cache array."""
            if s is None:
                return None
            if packed:
                if sel is None and new_group == group:
                    return s
                u = pallas_monolith.unpack_scales(s, group)
                if sel is not None:
                    u = u[:, sel]
                return pallas_monolith.pack_scales(u, new_group)
            return s if sel is None else s[:, sel]

        def move_mem_scales(s):
            """Memory planes: packed like the self planes when g == 1,
            the shared narrow (L, B/G, M, H) layout (group-selected, never
            re-packed) when grouped."""
            if s is None or g == 1:
                return move_scales(s)
            return s if sel_mem is None else s[:, sel_mem]

        if sel is not None:
            state = DecodeState(
                state.seqs[sel], state.log_probs[sel], fin, state.t,
                state.k_cache[:, sel], state.v_cache[:, sel], state.rng,
                move_scales(state.k_scale), move_scales(state.v_scale))
            mem = MemoryKV(
                mem.k[:, sel_mem], mem.v[:, sel_mem],
                None if mem.bias is None else mem.bias[sel_mem],
                move_mem_scales(mem.k_scale), move_mem_scales(mem.v_scale))
        elif packed and new_group != group:
            state = state._replace(k_scale=move_scales(state.k_scale),
                                   v_scale=move_scales(state.v_scale))
            mem = mem._replace(k_scale=move_mem_scales(mem.k_scale),
                               v_scale=move_mem_scales(mem.v_scale))
        group = new_group
        if need_grow:
            state = grow_cache(state, new_len)

    return mask_and_clip_seqs(master_seqs, master_lps, cfg.eos_idx, cfg.pad_idx)


# ---------------------------------------------------------------------------
# data-parallel decode over a device mesh
# ---------------------------------------------------------------------------

def prepare_tp_decode_params(params: Params, cfg: DecoderConfig, mesh,
                             model_axis: str):
    """Pre-shuffle decoder params for tensor-parallel decode and place them
    on the mesh. Pass the result as ``sharded_generate(tp_params=...)`` when
    decoding repeatedly with the same weights (e.g. the per-bucket-group loop
    in ``batch_inference``): the shuffle emits fresh arrays each time, so
    doing it per call re-transfers the full decoder weights to the devices.
    """
    from jax.sharding import NamedSharding
    from ..parallel import sharding as psharding

    tp = mesh.shape[model_axis]
    shuffled = psharding.tp_shuffle_decoder_params(
        params, cfg.num_heads, cfg.head_dim, tp)
    specs = psharding.tp_decode_param_specs(shuffled, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        shuffled, specs)



def _tp_peers(mesh, model_axis: str, tp: int):
    """Per-round recursive-doubling peer ids for the TP monolith's in-kernel
    all-reduce: round r's peer is the device at the same mesh coordinates
    with the model coordinate XOR (1 << r), as a row-major logical device
    id. Must be called inside ``shard_map`` (uses ``jax.lax.axis_index``)."""
    peers = []
    for r in range(tp.bit_length() - 1):
        idx = jnp.int32(0)
        for a in mesh.axis_names:
            c_a = jax.lax.axis_index(a)
            if a == model_axis:
                c_a = jnp.bitwise_xor(c_a, 1 << r)
            idx = idx * mesh.shape[a] + c_a
        peers.append(idx)
    return jnp.stack(peers)


def _grow_sharded_caches(carry, memd, cache_len, new_len, packed, group,
                         new_group, pack, unpack, repack_mem):
    """Host-side cache-segment growth shared by :func:`sharded_generate` and
    :func:`sharded_beam_generate`: pad the K/V time axis; for int8 monolith
    states unpack -> pad -> repack the lane-packed scale planes at the new
    segment's pack group (``pack``/``unpack`` are the tp-aware fns), and
    repack the packed MEMORY planes too when ``repack_mem`` (ungrouped
    memories follow the pack group; grouped/shared-narrow ones don't)."""
    if carry["k"].ndim == 4:
        pad = [(0, 0), (0, 0), (0, new_len - cache_len), (0, 0)]
    else:
        pad = [(0, 0)] * 4 + [(0, new_len - cache_len)]
    carry["k"] = jnp.pad(carry["k"], pad)
    carry["v"] = jnp.pad(carry["v"], pad)
    if "ks" in carry:
        if packed:
            def regrow(sc):
                u = unpack(sc, group)
                u = jnp.pad(u, [(0, 0), (0, 0), (0, new_len - cache_len),
                                (0, 0)], constant_values=1.0)
                return pack(u, new_group)

            carry["ks"] = regrow(carry["ks"])
            carry["vs"] = regrow(carry["vs"])
            if repack_mem and new_group != group and "ks" in memd:
                memd["ks"] = pack(unpack(memd["ks"], group), new_group)
                memd["vs"] = pack(unpack(memd["vs"], group), new_group)
        else:
            spad = [(0, 0)] * 3 + [(0, new_len - cache_len)]
            carry["ks"] = jnp.pad(carry["ks"], spad, constant_values=1.0)
            carry["vs"] = jnp.pad(carry["vs"], spad, constant_values=1.0)
    return carry, memd


def _select_best_beam(seqs, log_probs, scores, cfg, length_penalty: float):
    """GNMT length-normalized best-beam selection shared by
    :func:`beam_generate` and :func:`sharded_beam_generate`. Returns
    ((best_seqs, best_lps, mask), final_scores (B, K))."""
    b, k, _ = seqs.shape
    mask = create_inference_mask(seqs.reshape(b * k, -1), cfg.eos_idx)
    lengths = jnp.sum(mask.reshape(b, k, -1), axis=-1) - 1  # exclude <bos>
    norm = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    final_scores = scores / jnp.maximum(norm, 1e-6)
    best = jnp.argmax(final_scores, axis=-1)                # (B,)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((b,) + (1,) * (x.ndim - 1)), axis=1)[:, 0]
    return (mask_and_clip_seqs(take(seqs), take(log_probs), cfg.eos_idx,
                               cfg.pad_idx), final_scores)


def sharded_generate(params: Params, cfg: DecoderConfig, img_latent,
                     latent_valid, mesh, *, axis: str = "data",
                     model_axis: str | None = None,
                     max_len: int = 1536,
                     sampling: SamplingConfig | None = None, rng=None,
                     initial_segment: int = 256,
                     segment_steps: int | None = None,
                     compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
                     mem_group: int = 1, tp_params=None, pe_offset: int = 0,
                     progress_cb=None):
    """Batch-sharded KV-cached generation over a named mesh axis.

    Each device runs the complete decode loop — including the monolithic
    Pallas layer-stack kernel — on its local batch shard via ``shard_map``.
    GSPMD auto-partitioning cannot split a Pallas custom call, so sharding
    the plain :func:`generate` silently falls back to the per-op XLA step;
    this wrapper keeps the kernel (the 1.5-1.7x single-chip win) and scales
    linearly: the decode loop has **zero cross-chip traffic** (SURVEY §2.5(b)
    — decode is embarrassingly parallel across images). Per-shard early exit
    rides the same ``lax.while_loop`` condition; cache-segment growth stays
    host-driven and mesh-uniform. Batch compaction is not applied (it would
    desynchronize shard shapes).

    ``model_axis``: when the mesh has a model dimension > 1, run
    Megatron-style tensor-parallel decode on top of the batch sharding —
    heads and MLP features split over the axis, three psums per layer per
    step (attention out-proj + linear2 residual adds ride ICI). This cuts
    the per-chip *weight* stream by the TP factor, which dominates
    low-batch decode (B=1 streams 336 MB of weights per step vs ~4 MB of
    cache rows — docs/PERF.md), so it is the latency lever, not the
    throughput lever. TP decode uses the per-op XLA step (the monolithic
    Pallas kernel assumes whole-model shards); ``cfg.num_heads`` and
    ``cfg.mlp_dim`` must divide by the axis size.

    ``img_latent`` rows must divide evenly across ``mesh.shape[axis]``
    (pad the batch with dummy rows otherwise). With ``sampling``, per-device
    PRNG streams are independent (``rng`` is pre-split per shard), so sampled
    tokens differ from the single-device sampling order. Returns the same
    (seqs, log_probs, mask) as :func:`generate`.

    ``progress_cb(seqs, t, finished)``: same segment-boundary streaming hook
    as :func:`generate` (SSE STEP events under multi-chip serving — the
    reference streams per flush interval, ui/routes.py:66-104). The sequence
    buffer rides the SAME merged device->host status pull the loop already
    pays per segment; ``t`` is the max position over all shards (monotone
    across events). Rows on slower shards — and finished rows' tails — hold
    pad beyond their own position, so a row's valid tokens are its non-pad
    prefix of ``seqs[row, :t]``. Row order = input order (group-major when
    ``mem_group > 1``); granularity = ``segment_steps``.
    """
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec
    from ..ops import pallas_monolith
    from ..parallel import sharding as psharding

    P = PartitionSpec
    n_dev = mesh.shape[axis]
    tp = mesh.shape[model_axis] if model_axis is not None else 1
    if tp > 1 and (cfg.num_heads % tp or cfg.mlp_dim % tp):
        raise ValueError(f"tensor-parallel decode needs num_heads "
                         f"({cfg.num_heads}) and mlp_dim ({cfg.mlp_dim}) "
                         f"divisible by the model axis size {tp}")
    e_chk, heads_chk = cfg.hidden_dim, cfg.num_heads
    # tp=2 / tp=4 decode rides the monolith when the per-shard widths stay
    # lane-aligned: heads/MLP split per shard with the kernel's in-kernel
    # recursive-doubling ICI all-reduce (pallas_monolith tp_allreduce).
    # int8 caches compose bit-identically (per-(row, head) scales, whole
    # heads per shard; weights stay bf16 under tp unless ACAI_TP_W8A8);
    # grouped memories (mem_group > 1) ride the kernel too — the shared
    # (M, E/tp) memory block and its narrow scale planes are per-shard
    # slices, orthogonal to the all-reduce.
    tp_mono = (tp in (2, 4)
               and cache_dtype in (jnp.bfloat16, jnp.float32, jnp.int8)
               and heads_chk % tp == 0
               and (e_chk // tp) % 128 == 0
               and (cfg.mlp_dim // tp) % 128 == 0)
    if mem_group > 1 and cache_dtype == jnp.int8:
        # grouped int8 is a monolith-kernel feature; the per-op path needs
        # the replicated layout
        if (tp > 1 and not tp_mono) or not pallas_monolith.use_monolith(
                cfg, (img_latent.shape[0] * mem_group) // n_dev,
                min(initial_segment, max_len), img_latent.shape[1],
                compute_dtype, cache_dtype):
            img_latent = jnp.repeat(img_latent, mem_group, axis=0)
            if latent_valid is not None:
                latent_valid = jnp.repeat(latent_valid, mem_group, axis=0)
            mem_group = 1
    g = mem_group
    bu = img_latent.shape[0]
    b = bu * g
    if bu % n_dev:
        raise ValueError(f"batch of {bu} unique rows does not shard over "
                         f"{n_dev} devices — pad the batch")
    local_b = b // n_dev
    m_len = img_latent.shape[1]
    e, heads = cfg.hidden_dim, cfg.num_heads
    cache_len = min(initial_segment, max_len)
    # per-device shapes decide the kernel dispatch and the scale-pack group
    # (see the tp_mono note above: tp in (2, 4) and grouped memories all
    # ride the monolith kernel when the shard widths stay lane-aligned)
    monolith = (tp == 1 or tp_mono) and pallas_monolith.use_monolith(
        cfg, local_b, cache_len, m_len, compute_dtype, cache_dtype)
    tt = pallas_monolith.time_tile(cache_dtype)
    if monolith:
        cache_len = -(-cache_len // tt) * tt
    mem = precompute_memory_kv(params, cfg, img_latent, latent_valid,
                               compute_dtype, cache_dtype,
                               layout="te" if monolith else "hd")
    packed = monolith and cache_dtype == jnp.int8
    group = None

    def _pack_group(t_len):
        # the group must equal the row tile the KERNEL will pick per shard:
        # under tp that is at SHARD widths, with W8A8 off unless the
        # ACAI_TP_W8A8 opt-in is set (prepack keys wscale on the same
        # condition, and pick_row_tile keys its VMEM plan on it)
        if tp_mono:
            return pallas_monolith.scale_pack_group(
                local_b, t_len, m_len, e // tp, heads // tp, mem_group=g,
                w8a8=(pallas_monolith.want_w8a8(jnp.int8)
                      and pallas_monolith.want_tp_w8a8()),
                manual_cdma=False)  # tp shards deliver via BlockSpec windows
        return pallas_monolith.scale_pack_group(local_b, t_len, m_len,
                                                e, heads, mem_group=g)

    def _pack(sc, grp):
        if tp_mono:
            return pallas_monolith.pack_scales_tp(sc, grp, tp)
        return pallas_monolith.pack_scales(sc, grp)

    def _unpack(sc, grp):
        if tp_mono:
            return pallas_monolith.unpack_scales_tp(sc, grp, tp)
        return pallas_monolith.unpack_scales(sc, grp)

    if packed:
        group = _pack_group(cache_len)
        if g == 1:
            mem = mem._replace(
                k_scale=_pack(mem.k_scale.astype(jnp.bfloat16), group),
                v_scale=_pack(mem.v_scale.astype(jnp.bfloat16), group))
        else:
            # grouped int8: memory planes stay in the shared narrow
            # (L, B/G, M, H) layout (see pallas_monolith.decode_layers)
            mem = mem._replace(
                k_scale=mem.k_scale.astype(jnp.bfloat16),
                v_scale=mem.v_scale.astype(jnp.bfloat16))
    state = init_decode_state(cfg, b, max_len, cache_len, None, cache_dtype,
                              monolith=monolith, scale_group=group)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, n_dev)             # (n_dev, ...) per-shard

    def cache_p(x):
        # caches/mem: per-op layouts are (L, B, H, ...) — batch over the data
        # axis; with tp, heads (dim 2) over the model axis. The monolith's
        # time-major (L, B, T, E) layout instead shards the LANE dim (heads
        # live on lanes in original head order, and tp_shuffle gives shard s
        # the contiguous head block s*H/tp..(s+1)*H/tp — the slices match).
        if tp > 1 and monolith:
            return P(*((None, axis) + (None,) * (x.ndim - 3) + (model_axis,)))
        if tp > 1:
            return P(*((None, axis, model_axis) + (None,) * (x.ndim - 3)))
        return P(*((None, axis) + (None,) * (x.ndim - 2)))

    carry = {"seqs": state.seqs, "lps": state.log_probs,
             "fin": state.finished, "t": jnp.ones((n_dev,), jnp.int32),
             "k": state.k_cache, "v": state.v_cache, "key": keys}
    carry_p = {"seqs": P(axis, None), "lps": P(axis, None), "fin": P(axis),
               "t": P(axis), "k": cache_p(state.k_cache),
               "v": cache_p(state.v_cache), "key": P(axis, None)}
    if state.k_scale is not None:
        carry["ks"], carry["vs"] = state.k_scale, state.v_scale
        carry_p["ks"] = carry_p["vs"] = cache_p(state.k_scale)
    memd = {"k": mem.k, "v": mem.v}
    mem_p = {"k": cache_p(mem.k), "v": cache_p(mem.v)}
    if mem.bias is not None:
        memd["bias"], mem_p["bias"] = mem.bias, P(axis, None)
    if mem.k_scale is not None:
        memd["ks"], memd["vs"] = mem.k_scale, mem.v_scale
        mem_p["ks"] = mem_p["vs"] = cache_p(mem.k_scale)
    if tp > 1:
        # contiguous per-shard [q_i|k_i|v_i] fused-qkv blocks (the memory
        # K/V above were projected from the ORIGINAL layout — order matters).
        # ``tp_params`` skips the shuffle when the caller decodes repeatedly
        # with the same weights (the shuffle output is fresh arrays, so
        # without it every call re-uploads the full decoder through the
        # device transfer path — see prepare_tp_decode_params).
        params = tp_params if tp_params is not None else \
            psharding.tp_shuffle_decoder_params(params, heads, cfg.head_dim, tp)
        param_p = psharding.tp_decode_param_specs(params, model_axis)
    else:
        param_p = jax.tree.map(lambda _: P(), params)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params_s = jax.tree.map(put, params, param_p)
    carry = jax.tree.map(put, carry, carry_p)
    memd = jax.tree.map(put, memd, mem_p)

    steps = segment_steps or max_len

    def seg_fn(p, c, md):
        st = DecodeState(c["seqs"], c["lps"], c["fin"], c["t"][0], c["k"],
                         c["v"], c["key"][0], c.get("ks"), c.get("vs"))
        mm = MemoryKV(md["k"], md["v"], md.get("bias"), md.get("ks"),
                      md.get("vs"))
        tp_peer = _tp_peers(mesh, model_axis, tp) \
            if tp > 1 and monolith else None
        s = decode_segment(params=p, cfg=cfg, state=st, mem=mm,
                           num_steps=steps, sampling=sampling,
                           compute_dtype=compute_dtype, mem_group=g,
                           tp_axis=model_axis if tp > 1 else None,
                           pe_offset=pe_offset, tp_peer=tp_peer)
        out = {"seqs": s.seqs, "lps": s.log_probs, "fin": s.finished,
               "t": s.t[None], "k": s.k_cache, "v": s.v_cache,
               "key": s.rng[None]}
        if s.k_scale is not None:
            out["ks"], out["vs"] = s.k_scale, s.v_scale
        return out

    seg = jax.jit(shard_map(seg_fn, mesh=mesh,
                            in_specs=(param_p, carry_p, mem_p),
                            out_specs=carry_p, check_vma=False))
    while True:
        carry = seg(params_s, carry, memd)
        # one pull: per-shard t + all finished flags — with a progress_cb
        # the sequence buffer rides the same pull (a separate pull would
        # double the ~29 ms-per-round-trip streaming tax on tunneled links)
        nf = n_dev + b
        parts = [carry["t"], carry["fin"].astype(jnp.int32)]
        if progress_cb is not None:
            parts.append(carry["seqs"].reshape(-1))
        status = np.asarray(jnp.concatenate(parts))
        t_all = status[:n_dev]
        fin = status[n_dev:nf].astype(bool)
        shard_alive = ~fin.reshape(n_dev, local_b).all(axis=1)
        if progress_cb is not None:
            # reported t = max over ALL shards (monotone across events —
            # per-shard t is monotone, and a live-shards-only max would
            # regress when the leading shard finishes first). Rows on
            # slower shards simply have pad beyond their own position;
            # per-row valid tokens are the non-pad prefix.
            progress_cb(status[nf:].reshape(b, max_len), int(t_all.max()),
                        fin)
        if not shard_alive.any():
            break
        # loop control (growth/stop) keys on LIVE shards only: a finished
        # shard's frozen t must not force cache growth nobody needs
        t_max = int(t_all[shard_alive].max())
        if t_max >= max_len:
            break
        if t_max > cache_len:
            new_len = _next_segment(cache_len, max_len)
            if monolith:
                new_len = -(-new_len // tt) * tt
            # lane-packed plane growth can change the row-tile group
            # (unpack -> pad -> repack, tp-aware); grouped (g > 1) memory
            # planes stay in the raw shared layout (no repack)
            new_group = _pack_group(new_len) if packed else group
            carry, memd = _grow_sharded_caches(
                carry, memd, cache_len, new_len, packed, group, new_group,
                _pack, _unpack, repack_mem=(g == 1))
            group = new_group
            cache_len = new_len

    return mask_and_clip_seqs(carry["seqs"], carry["lps"], cfg.eos_idx,
                              cfg.pad_idx)


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

class BeamState(NamedTuple):
    """Decode state for ``beam_size`` hypotheses per batch row.

    Caches are flattened to a (B*K) batch axis so the per-step layer stack
    (:func:`_decode_step_logits`) is shared verbatim with greedy/sampled
    decoding; beams are reordered each step by gathering cache rows.
    """
    seqs: jnp.ndarray       # (B, K, max_len) int32
    log_probs: jnp.ndarray  # (B, K, max_len) float32 per-token lp
    scores: jnp.ndarray     # (B, K) float32 cumulative lp
    finished: jnp.ndarray   # (B, K) bool
    t: jnp.ndarray          # () int32
    k_cache: jnp.ndarray    # (L, B*K, H, Dh, T_cache)
    v_cache: jnp.ndarray
    # int8 dequant scales: per-op layout (L, B*K, H, T) fp32, or the int8
    # monolith's lane-packed (L, B*K/G, T, G*H) bf16 planes (beam reordering
    # unpacks -> row-gathers -> repacks them, ~3% of the cache-gather bytes)
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None


def init_beam_state(cfg: DecoderConfig, batch_size: int, beam_size: int,
                    max_len: int, cache_len: int,
                    cache_dtype=jnp.bfloat16,
                    monolith: bool = False,
                    scale_group: int | None = None) -> BeamState:
    b, k = batch_size, beam_size
    seqs = jnp.full((b, k, max_len), cfg.pad_idx, dtype=jnp.int32)
    seqs = seqs.at[:, :, 0].set(cfg.bos_idx)
    log_probs = jnp.zeros((b, k, max_len), dtype=jnp.float32)
    scores = jnp.zeros((b, k), dtype=jnp.float32)
    finished = jnp.zeros((b, k), dtype=bool)
    if monolith:
        shape = (cfg.num_layers, b * k, cache_len, cfg.hidden_dim)
    else:
        shape = (cfg.num_layers, b * k, cfg.num_heads, cfg.head_dim, cache_len)
    k_scale = v_scale = None
    if cache_dtype == jnp.int8:
        if monolith:
            if scale_group is None:
                raise ValueError(
                    "int8 monolith beams need scale_group="
                    "pallas_monolith.scale_pack_group(b*k, cache_len, m, e, "
                    "h, mem_group=k)")
            sshape = (cfg.num_layers, b * k // scale_group, cache_len,
                      scale_group * cfg.num_heads)
            sdtype = jnp.bfloat16
        else:
            sshape = (cfg.num_layers, b * k, cfg.num_heads, cache_len)
            sdtype = jnp.float32
        k_scale = jnp.ones(sshape, dtype=sdtype)
        v_scale = jnp.ones(sshape, dtype=sdtype)
    return BeamState(seqs, log_probs, scores, finished, jnp.int32(1),
                     jnp.zeros(shape, cache_dtype), jnp.zeros(shape, cache_dtype),
                     k_scale, v_scale)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps",
                                             "compute_dtype", "mem_group",
                                             "pe_offset", "tp_axis"))
def beam_decode_segment(params: Params, cfg: DecoderConfig, state: BeamState,
                        mem: MemoryKV, num_steps: int,
                        compute_dtype=jnp.bfloat16,
                        mem_group: int = 1, pe_offset: int = 0,
                        tp_axis: str | None = None,
                        tp_peer=None) -> BeamState:
    """Run up to ``num_steps`` beam-search steps in one lax.while_loop.

    Standard batched beam search: each step scores all (K x V) continuations
    per batch row, keeps the top K by cumulative log-prob, and reorders the
    KV caches by gathering parent rows. Finished beams are frozen — their only
    continuation is <pad> at log-prob 0, so they compete with alive beams on
    their final score. The reference decodes greedily only (models.py:600-615);
    beam search is a capability extension, token-identical to greedy at K=1.
    """
    b, k, max_len = state.seqs.shape
    v = cfg.vocab_size
    cache_len = cache_len_of(state.k_cache)
    stop_t = jnp.minimum(state.t + num_steps, min(max_len, cache_len + 1))
    monolith = state.k_cache.ndim == 4
    tp_mono = monolith and tp_axis is not None
    if monolith:
        from ..ops import pallas_monolith
        ea = state.k_cache.shape[-1]
        h_loc = ea // cfg.head_dim
        tp = cfg.hidden_dim // ea if tp_mono else 1
        mono = pallas_monolith.prepack(
            params, cfg, compute_dtype,
            quantize_weights=(False if state.k_scale is None else
                              pallas_monolith.weight_quant_mode(
                                  state.k_cache.dtype, tp_mono)),
            e_attn=ea if tp_mono else None)
        bm, m_len = mem.k.shape[1], mem.k.shape[2]
        if mem.bias is None:
            bias_col = jnp.zeros((bm, m_len, 1), jnp.float32)
        else:
            bias_col = mem.bias.reshape(bm, m_len, 1).astype(jnp.float32)
        scale_group = None
        if state.k_scale is not None:
            # per-SHARD group: within a model shard the lane-packed plane is
            # that shard's own valid pack (pack_scales_tp), so the in-loop
            # beam-reorder regroup uses the plain pack/unpack at shard widths
            scale_group = pallas_monolith.scale_pack_group(
                b * k, cache_len, m_len, ea, h_loc, mem_group=mem_group,
                w8a8=(pallas_monolith.want_w8a8(state.k_cache.dtype)
                      and pallas_monolith.want_tp_w8a8()) if tp_mono
                else None,
                manual_cdma=False if tp_mono else None)

    def cond(s: BeamState):
        return (s.t < stop_t) & ~jnp.all(s.finished)

    def body(s: BeamState):
        prev_tok = jax.lax.dynamic_slice_in_dim(
            s.seqs, s.t - 1, 1, axis=2)[:, :, 0].reshape(b * k)
        x = _embed_token(params, prev_tok, s.t - 1 + pe_offset, compute_dtype)
        caches = {"k": s.k_cache, "v": s.v_cache}
        if s.k_scale is not None:
            caches["ks"], caches["vs"] = s.k_scale, s.v_scale
        if monolith:
            if s.k_scale is not None:  # int8 lane-packed planes
                (x_out, caches["k"], caches["v"], caches["ks"],
                 caches["vs"]) = pallas_monolith.decode_layers(
                    mono, x, s.t - 1, s.k_cache, s.v_cache, mem.k, mem.v,
                    bias_col, num_heads=h_loc, k_scale=s.k_scale,
                    v_scale=s.v_scale, mem_k_scale=mem.k_scale,
                    mem_v_scale=mem.v_scale, mem_group=mem_group,
                    tp=tp, tp_peer=tp_peer if tp_mono else None)
            else:
                x_out, caches["k"], caches["v"] = pallas_monolith.decode_layers(
                    mono, x, s.t - 1, s.k_cache, s.v_cache, mem.k, mem.v,
                    bias_col, num_heads=h_loc, mem_group=mem_group,
                    tp=tp, tp_peer=tp_peer if tp_mono else None)
            x_out = nn.layernorm(params["final_norm"], x_out, eps=1e-6)
            logits = nn.dense(params["unembed"], x_out).astype(jnp.float32)
        else:
            logits, caches = _decode_step_logits(
                params, cfg, x, s.t, caches, mem, compute_dtype, mem_group,
                tp_axis)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = lp.reshape(b, k, v)

        cand = s.scores[:, :, None] + lp                       # (B, K, V)
        # finished beams extend only with <pad> at frozen score
        vocab = jnp.arange(v)[None, None, :]
        frozen = jnp.where(vocab == cfg.pad_idx, s.scores[:, :, None], nn.NEG_INF)
        cand = jnp.where(s.finished[:, :, None], frozen, cand)
        # first expansion: all beams are identical <bos> rows; keep beam 0 only
        beam_idx = jnp.arange(k)[None, :, None]
        cand = jnp.where((s.t == 1) & (beam_idx > 0), nn.NEG_INF, cand)

        top_scores, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k)
        parent = top_idx // v                                  # (B, K)
        token = (top_idx % v).astype(jnp.int32)

        def gather_beams(x2):                                  # (B, K, ...) by parent
            return jnp.take_along_axis(
                x2, parent.reshape(parent.shape + (1,) * (x2.ndim - 2)), axis=1)

        step_lp = top_scores - gather_beams(s.scores[:, :, None])[:, :, 0]
        seqs = jax.lax.dynamic_update_slice(
            gather_beams(s.seqs), token[:, :, None], (0, 0, s.t))
        log_probs = jax.lax.dynamic_update_slice(
            gather_beams(s.log_probs), step_lp[:, :, None], (0, 0, s.t))
        finished = gather_beams(s.finished[:, :, None])[:, :, 0] \
            | (token == cfg.eos_idx)

        flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(b * k)
        k_cache = jnp.take(caches["k"], flat_parent, axis=1)
        v_cache = jnp.take(caches["v"], flat_parent, axis=1)
        k_scale = v_scale = None
        if s.k_scale is not None:
            if monolith:
                # lane-packed (L, B*K/G, T, G*H) planes: beams can cross the
                # pack groups, so unpack -> row-gather -> repack (bf16 layout
                # permutes, ~3% of the int8 cache gathers' bytes)
                def regroup(sc):
                    u = pallas_monolith.unpack_scales(sc, scale_group)
                    return pallas_monolith.pack_scales(
                        jnp.take(u, flat_parent, axis=1), scale_group)
                k_scale = regroup(caches["ks"])
                v_scale = regroup(caches["vs"])
            else:
                k_scale = jnp.take(caches["ks"], flat_parent, axis=1)
                v_scale = jnp.take(caches["vs"], flat_parent, axis=1)
        return BeamState(seqs, log_probs, top_scores, finished, s.t + 1,
                         k_cache, v_cache, k_scale, v_scale)

    return jax.lax.while_loop(cond, body, state)


def beam_generate(params: Params, cfg: DecoderConfig, img_latent, latent_valid,
                  *, beam_size: int = 4, max_len: int = 1536,
                  length_penalty: float = 0.6, initial_segment: int = 256,
                  segment_steps: int | None = None,
                  compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
                  return_all_beams: bool = False, pe_offset: int = 0):
    """Batched beam-search generation over the KV-cached decoder.

    Hypotheses are ranked in-loop by cumulative log-prob; the returned beam
    per row maximizes the GNMT length-normalized score
    ``lp / ((5 + len) / 6) ** length_penalty`` (``length_penalty=0`` selects
    by raw log-prob; ``beam_size=1`` is token-identical to greedy
    :func:`generate`). Returns ``(seqs, log_probs, mask)`` of the best beam,
    trimmed like :func:`generate`; with ``return_all_beams`` also returns
    ``(all_seqs, all_scores)``.
    """
    from ..ops import pallas_monolith

    b = img_latent.shape[0]
    k = beam_size
    m_len = img_latent.shape[1]
    e, heads = cfg.hidden_dim, cfg.num_heads
    cache_len = min(initial_segment, max_len)
    monolith = pallas_monolith.use_monolith(
        cfg, b * k, cache_len, m_len, compute_dtype, cache_dtype)
    tt = pallas_monolith.time_tile(cache_dtype)
    if monolith:
        cache_len = -(-cache_len // tt) * tt
    # beams share the image latent: grouped memory (mem_group=k) projects and
    # streams each image's cross K/V once per beam group instead of K times.
    # Beam reordering only permutes WITHIN a row's K beams, so the shared
    # memory row stays correct across parent gathers.
    mem = precompute_memory_kv(params, cfg, img_latent, latent_valid,
                               compute_dtype, cache_dtype,
                               layout="te" if monolith else "hd")
    packed = monolith and cache_dtype == jnp.int8
    group = None
    if packed:
        # int8 monolith beams: SELF planes lane-packed, MEMORY planes in the
        # grouped shared narrow (L, B, M, H) layout (as in generate()'s
        # mem_group path; beam reordering handles the packed self planes by
        # unpack -> gather -> repack in beam_decode_segment)
        group = pallas_monolith.scale_pack_group(b * k, cache_len, m_len, e,
                                                 heads, mem_group=k)
        if k == 1:
            mem = mem._replace(
                k_scale=pallas_monolith.pack_scales(
                    mem.k_scale.astype(jnp.bfloat16), group),
                v_scale=pallas_monolith.pack_scales(
                    mem.v_scale.astype(jnp.bfloat16), group))
        else:
            mem = mem._replace(
                k_scale=mem.k_scale.astype(jnp.bfloat16),
                v_scale=mem.v_scale.astype(jnp.bfloat16))
    state = init_beam_state(cfg, b, k, max_len, cache_len, cache_dtype,
                            monolith=monolith, scale_group=group)

    steps = segment_steps or max_len
    t_known = 1
    while True:
        state = beam_decode_segment(params, cfg, state, mem, steps,
                                    compute_dtype, mem_group=k,
                                    pe_offset=pe_offset)
        stop_bound = min(t_known + steps, cache_len_of(state.k_cache) + 1,
                         max_len)
        if stop_bound >= max_len:
            break  # loop over either way — skip the ~29 ms status pull
        import numpy as np
        status = np.asarray(jnp.concatenate(
            [state.t[None], jnp.all(state.finished)[None].astype(jnp.int32)]))
        t = t_known = int(status[0])
        if t >= max_len or bool(status[1]):
            break
        if t > cache_len_of(state.k_cache):
            grown = cache_len_of(state.k_cache)
            new_len = _next_segment(grown, max_len)
            if monolith:
                new_len = -(-new_len // tt) * tt
            # shared growth helper (same logic as the sharded loops): pads
            # K/V, unpack -> pad -> repacks lane-packed scale planes at the
            # new segment's group, and repacks the packed MEMORY planes when
            # they follow the pack group (k == 1)
            new_group = pallas_monolith.scale_pack_group(
                b * k, new_len, m_len, e, heads, mem_group=k) \
                if packed else group
            carry = {"k": state.k_cache, "v": state.v_cache}
            if state.k_scale is not None:
                carry["ks"], carry["vs"] = state.k_scale, state.v_scale
            memd = {}
            if packed and mem.k_scale is not None and k == 1:
                memd = {"ks": mem.k_scale, "vs": mem.v_scale}
            carry, memd = _grow_sharded_caches(
                carry, memd, grown, new_len, packed, group, new_group,
                pallas_monolith.pack_scales, pallas_monolith.unpack_scales,
                repack_mem=(k == 1))
            state = state._replace(
                k_cache=carry["k"], v_cache=carry["v"],
                k_scale=carry.get("ks"), v_scale=carry.get("vs"))
            if memd:
                mem = mem._replace(k_scale=memd["ks"], v_scale=memd["vs"])
            group = new_group

    out, final_scores = _select_best_beam(state.seqs, state.log_probs,
                                          state.scores, cfg, length_penalty)
    if return_all_beams:
        return out + (state.seqs, final_scores)
    return out


def streamed_generate(params: Params, cfg: DecoderConfig, img_latent,
                      latent_valid, *, max_len: int = 1536,
                      flush_interval: int = 25, compute_dtype=jnp.bfloat16,
                      pe_offset: int = 0):
    """Greedy generation yielding token chunks every ``flush_interval`` steps.

    Generator analogue of ``streamed_cached_greedy_generate``
    (models.py:625-647): yields ("step", np.ndarray tokens) chunks, then a
    final ("finish", (seqs, log_probs, mask)). Single-image batches only.
    """
    import numpy as np

    if img_latent.shape[0] != 1:
        raise ValueError("Streamed generation only supports single image batches")
    from ..ops import pallas_monolith

    cache_len = min(256, max_len)
    monolith = pallas_monolith.use_monolith(
        cfg, 1, cache_len, img_latent.shape[1], compute_dtype, jnp.bfloat16)
    if monolith:
        cache_len = -(-cache_len // 16) * 16
    mem = precompute_memory_kv(params, cfg, img_latent, latent_valid,
                               compute_dtype,
                               layout="te" if monolith else "hd")
    state = init_decode_state(cfg, 1, max_len, cache_len, monolith=monolith)

    start_t = 1  # host mirror of state.t — one device pull per flush
    done = False
    while not done and start_t < max_len:
        if start_t + flush_interval - 1 > cache_len_of(state.k_cache):
            new_len = _next_segment(cache_len_of(state.k_cache), max_len)
            if monolith:
                new_len = -(-new_len // 16) * 16
            state = grow_cache(state, new_len)
        state = decode_segment(params, cfg, state, mem, flush_interval,
                               None, compute_dtype, pe_offset=pe_offset)
        # single device->host round trip per flush (~29 ms each through the
        # axon tunnel): [t, all_finished, flush window of tokens]
        win = min(flush_interval, max_len - start_t)
        status = np.asarray(jnp.concatenate([
            state.t[None], jnp.all(state.finished)[None].astype(jnp.int32),
            jax.lax.dynamic_slice(state.seqs, (0, start_t), (1, win))[0]]))
        t = int(status[0])
        done = t >= max_len or bool(status[1])
        new_tokens = status[None, 2:2 + (t - start_t)]
        start_t = t
        if not done:
            yield ("step", new_tokens)

    yield ("finish", mask_and_clip_seqs(state.seqs, state.log_probs,
                                        cfg.eos_idx, cfg.pad_idx))


def sharded_beam_generate(params: Params, cfg: DecoderConfig, img_latent,
                          latent_valid, mesh, *, axis: str = "data",
                          model_axis: str | None = None,
                          beam_size: int = 4, max_len: int = 1536,
                          length_penalty: float = 0.6,
                          initial_segment: int = 256,
                          segment_steps: int | None = None,
                          compute_dtype=jnp.bfloat16,
                          cache_dtype=jnp.bfloat16, tp_params=None,
                          pe_offset: int = 0):
    """Batch-sharded beam search over a named mesh axis.

    DP analogue of :func:`sharded_generate` for :func:`beam_generate`: each
    device runs the complete beam loop — top-K reordering, parent cache
    gathers, and (on TPU) the monolithic Pallas kernel at per-shard widths —
    on its local batch rows under ``shard_map``. Beam reordering only
    permutes *within* a row's K hypotheses, so shards never exchange beams:
    the decode loop has zero cross-chip traffic and scales linearly, like
    greedy DP decode (SURVEY §2.5(b); reference decode protocol
    kv_caching.py:258-302 — the reference has neither beams nor sharding).

    int8 caches compose exactly as in :func:`beam_generate`: self scale
    planes lane-packed at the PER-SHARD pack group (pack groups never
    straddle shard boundaries because the group divides the per-shard row
    count), memory planes in the grouped shared narrow layout for K>1.
    Tensor-parallel beams (``model_axis``): the per-shard beam loop rides
    the TP monolith kernel — heads/MLP split per shard with the in-kernel
    recursive-doubling ICI all-reduce, beams as grouped memories
    (mem_group=K per-shard slices), int8 scale planes packed PER HEAD-BLOCK
    (``pack_scales_tp``) so each model shard reorders its own valid pack.
    Returns the best beam per row as ``(seqs, log_probs, mask)``, identical
    to :func:`beam_generate` run unsharded (same order of per-row
    reductions).
    """
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec
    from ..ops import pallas_monolith
    from ..parallel import sharding as psharding

    P = PartitionSpec
    n_dev = mesh.shape[axis]
    tp = mesh.shape[model_axis] if model_axis is not None else 1
    b = img_latent.shape[0]
    k = beam_size
    if b % n_dev:
        raise ValueError(f"batch of {b} rows does not shard over {n_dev} "
                         f"devices — pad the batch")
    if tp > 1 and (cfg.num_heads % tp or cfg.mlp_dim % tp):
        raise ValueError(f"tensor-parallel beams need num_heads "
                         f"({cfg.num_heads}) and mlp_dim ({cfg.mlp_dim}) "
                         f"divisible by the model axis size {tp}")
    local_b = b // n_dev
    m_len = img_latent.shape[1]
    e, heads = cfg.hidden_dim, cfg.num_heads
    cache_len = min(initial_segment, max_len)
    tp_mono = (tp in (2, 4)
               and cache_dtype in (jnp.bfloat16, jnp.float32, jnp.int8)
               and heads % tp == 0 and (e // tp) % 128 == 0
               and (cfg.mlp_dim // tp) % 128 == 0)
    # kernel dispatch + scale pack group at PER-SHARD widths
    monolith = (tp == 1 or tp_mono) and pallas_monolith.use_monolith(
        cfg, local_b * k, cache_len, m_len, compute_dtype, cache_dtype)
    tt = pallas_monolith.time_tile(cache_dtype)
    if monolith:
        cache_len = -(-cache_len // tt) * tt
    mem = precompute_memory_kv(params, cfg, img_latent, latent_valid,
                               compute_dtype, cache_dtype,
                               layout="te" if monolith else "hd")
    packed = monolith and cache_dtype == jnp.int8
    group = None
    tp_kern = tp if (tp > 1 and monolith) else 1

    def _pack_group(t_len):
        if tp_kern > 1:
            return pallas_monolith.scale_pack_group(
                local_b * k, t_len, m_len, e // tp, heads // tp,
                mem_group=k,
                w8a8=(pallas_monolith.want_w8a8(jnp.int8)
                      and pallas_monolith.want_tp_w8a8()),
                manual_cdma=False)
        return pallas_monolith.scale_pack_group(local_b * k, t_len, m_len,
                                                e, heads, mem_group=k)

    def _pack(sc, grp):
        if tp_kern > 1:
            return pallas_monolith.pack_scales_tp(sc, grp, tp)
        return pallas_monolith.pack_scales(sc, grp)

    def _unpack(sc, grp):
        if tp_kern > 1:
            return pallas_monolith.unpack_scales_tp(sc, grp, tp)
        return pallas_monolith.unpack_scales(sc, grp)

    if packed:
        group = _pack_group(cache_len)
        if k == 1:
            mem = mem._replace(
                k_scale=_pack(mem.k_scale.astype(jnp.bfloat16), group),
                v_scale=_pack(mem.v_scale.astype(jnp.bfloat16), group))
        else:
            mem = mem._replace(k_scale=mem.k_scale.astype(jnp.bfloat16),
                               v_scale=mem.v_scale.astype(jnp.bfloat16))
    state = init_beam_state(cfg, b, k, max_len, cache_len, cache_dtype,
                            monolith=monolith, scale_group=group)

    def cache_p(x):
        # monolith layouts put heads on lanes (last dim) — model axis there;
        # per-op layouts carry heads at dim 2
        if tp > 1 and monolith:
            return P(*((None, axis) + (None,) * (x.ndim - 3) + (model_axis,)))
        if tp > 1:
            return P(*((None, axis, model_axis) + (None,) * (x.ndim - 3)))
        return P(*((None, axis) + (None,) * (x.ndim - 2)))

    carry = {"seqs": state.seqs, "lps": state.log_probs,
             "scores": state.scores, "fin": state.finished,
             "t": jnp.ones((n_dev,), jnp.int32),
             "k": state.k_cache, "v": state.v_cache}
    carry_p = {"seqs": P(axis, None, None), "lps": P(axis, None, None),
               "scores": P(axis, None), "fin": P(axis, None), "t": P(axis),
               "k": cache_p(state.k_cache), "v": cache_p(state.v_cache)}
    if state.k_scale is not None:
        carry["ks"], carry["vs"] = state.k_scale, state.v_scale
        carry_p["ks"] = carry_p["vs"] = cache_p(state.k_scale)
    memd = {"k": mem.k, "v": mem.v}
    mem_p = {"k": cache_p(mem.k), "v": cache_p(mem.v)}
    if mem.bias is not None:
        memd["bias"], mem_p["bias"] = mem.bias, P(axis, None)
    if mem.k_scale is not None:
        memd["ks"], memd["vs"] = mem.k_scale, mem.v_scale
        mem_p["ks"] = mem_p["vs"] = cache_p(mem.k_scale)
    if tp > 1:
        params = tp_params if tp_params is not None else \
            psharding.tp_shuffle_decoder_params(params, heads, cfg.head_dim,
                                                tp)
        param_p = psharding.tp_decode_param_specs(params, model_axis)
    else:
        param_p = jax.tree.map(lambda _: P(), params)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params_s = jax.tree.map(put, params, param_p)
    carry = jax.tree.map(put, carry, carry_p)
    memd = jax.tree.map(put, memd, mem_p)

    steps = segment_steps or max_len

    def seg_fn(p, c, md):
        st = BeamState(c["seqs"], c["lps"], c["scores"], c["fin"], c["t"][0],
                       c["k"], c["v"], c.get("ks"), c.get("vs"))
        mm = MemoryKV(md["k"], md["v"], md.get("bias"), md.get("ks"),
                      md.get("vs"))
        tp_peer = _tp_peers(mesh, model_axis, tp) if tp_kern > 1 else None
        s = beam_decode_segment(p, cfg, st, mm, steps, compute_dtype,
                                mem_group=k, pe_offset=pe_offset,
                                tp_axis=model_axis if tp > 1 else None,
                                tp_peer=tp_peer)
        out = {"seqs": s.seqs, "lps": s.log_probs, "scores": s.scores,
               "fin": s.finished, "t": s.t[None], "k": s.k_cache,
               "v": s.v_cache, "done": jnp.all(s.finished)[None]}
        if s.k_scale is not None:
            out["ks"], out["vs"] = s.k_scale, s.v_scale
        return out

    out_p = dict(carry_p, done=P(axis))
    seg = jax.jit(shard_map(seg_fn, mesh=mesh,
                            in_specs=(param_p, carry_p, mem_p),
                            out_specs=out_p, check_vma=False))
    while True:
        carry = seg(params_s, carry, memd)
        done = carry.pop("done")
        # one pull: per-shard t + per-shard all-finished flags
        status = np.asarray(jnp.concatenate(
            [carry["t"], done.astype(jnp.int32)]))
        t_all, fin = status[:n_dev], status[n_dev:].astype(bool)
        if fin.all():
            break
        t_max = int(t_all[~fin].max())
        if t_max >= max_len:
            break
        if t_max > cache_len:
            new_len = _next_segment(cache_len, max_len)
            if monolith:
                new_len = -(-new_len // tt) * tt
            new_group = _pack_group(new_len) if packed else group
            carry, memd = _grow_sharded_caches(
                carry, memd, cache_len, new_len, packed, group, new_group,
                _pack, _unpack, repack_mem=(k == 1))
            group = new_group
            cache_len = new_len

    out, _ = _select_best_beam(carry["seqs"], carry["lps"], carry["scores"],
                               cfg, length_penalty)
    return out
