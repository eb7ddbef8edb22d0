"""Functional NN primitives on explicit parameter pytrees.

This is the substrate of the whole framework: every model is a pure function
``apply(params, inputs, ...) -> outputs`` over nested dicts of jnp arrays, so
``jax.jit`` / ``pjit`` / ``jax.grad`` / ``jax.checkpoint`` compose freely and
sharding rules can be expressed as tree-path -> PartitionSpec maps.

Numerics deliberately match the PyTorch modules the reference builds on
(``nn.Linear``, ``nn.LayerNorm``, ``nn.MultiheadAttention`` — reference:
acai_omr/models/models.py:29-34) so that weight-transfer parity tests are
meaningful:

* dense kernels are stored ``(in, out)`` (JAX layout; torch stores the
  transpose),
* attention uses a fused qkv projection of shape ``(E, 3E)`` mirroring torch's
  ``in_proj_weight`` (reference: acai_omr/models/kv_caching.py:193-194),
* GELU is the exact erf form (torch's default for ``activation="gelu"``),
* softmax/layernorm run in fp32 regardless of the compute dtype.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

Params = dict

# Large negative additive-mask value. Finite (not -inf) so fully-masked rows
# produce a uniform distribution instead of NaNs; fp32 softmax makes the
# surviving probability mass < 1e-38, indistinguishable from zero.
NEG_INF = -1e9


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.1, dtype=jnp.float32):
    """Truncated-normal init matching torch.nn.init.trunc_normal_.

    torch's a=-2, b=2 are ABSOLUTE cutoffs, not sigmas: at std=0.1 that is
    ±20σ (effectively untruncated N(0, std²)). jax.random.truncated_normal
    takes σ-bounds, so divide the cutoffs by std (round-4 review: the old
    ±2σ truncation discarded ~4.6% tail mass and shrank the effective std
    to ~0.88·std on every positional embedding and mask token)."""
    return std * jax.random.truncated_normal(key, -2.0 / std, 2.0 / std,
                                             shape, dtype)


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch.nn.Linear default weight init: kaiming_uniform_(a=sqrt(5)) gives
    # bound = sqrt(3)*gain/sqrt(fan_in) with gain = sqrt(2/(1+5)) = 1/sqrt(3)
    # -> the sqrt(3) factors CANCEL to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    # (A stray *sqrt(3) here gave every kernel 3x the reference's init
    # variance until round 4 — weight-transfer parity never exercises init,
    # which is why nothing caught it.)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """nn.Linear-equivalent init: kaiming-uniform kernel, uniform bias."""
    kkey, bkey = jax.random.split(key)
    kernel = _kaiming_uniform(kkey, (in_dim, out_dim), in_dim, dtype)
    bound = 1.0 / math.sqrt(in_dim)
    bias = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def layernorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def embedding_init(key, vocab_size: int, dim: int, pad_idx: int | None = None,
                   dtype=jnp.float32) -> Params:
    """nn.Embedding init: N(0, 1), padding row zeroed."""
    table = jax.random.normal(key, (vocab_size, dim), dtype)
    if pad_idx is not None:
        table = table.at[pad_idx].set(0.0)
    return {"table": table}


def mha_init(key, dim: int, dtype=jnp.float32) -> Params:
    """nn.MultiheadAttention-equivalent params.

    in_proj kernel is (E, 3E): columns [0:E)=q, [E:2E)=k, [2E:3E)=v, matching
    the row blocks of torch's (3E, E) in_proj_weight after transpose. torch
    initializes in_proj_weight with xavier_uniform and biases to zero.
    """
    ikey, okey = jax.random.split(key)
    # torch xavier_uniform over the (3E, E) in_proj matrix: fan_in=E, fan_out=3E
    limit = math.sqrt(6.0 / (dim + 3 * dim))
    in_kernel = jax.random.uniform(ikey, (dim, 3 * dim), dtype, -limit, limit)
    out = {"kernel": _kaiming_uniform(okey, (dim, dim), dim, dtype),
           "bias": jnp.zeros((dim,), dtype)}
    return {
        "in_kernel": in_kernel,
        "in_bias": jnp.zeros((3 * dim,), dtype),
        "out": out,
    }


# ---------------------------------------------------------------------------
# forward primitives
# ---------------------------------------------------------------------------

def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, params["kernel"].astype(x.dtype)) + params["bias"].astype(x.dtype)


def layernorm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm in fp32 (biased variance, matching torch)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def embed(params: Params, idxs: jnp.ndarray, dtype=None) -> jnp.ndarray:
    table = params["table"]
    if dtype is not None:
        table = table.astype(dtype)
    v = table.shape[0]
    # Small tables are gathered with a one-hot MXU matmul: a one-hot operand
    # makes the product an exact row copy, and the VJP becomes a GEMM instead
    # of an HBM-bound scatter-add (the gather+scatter pair measured ~6 ms/step
    # for the (227, 1024) LMX table at flagship seq2seq shapes).
    if v <= 4096 and idxs.ndim >= 1:
        oh = jax.nn.one_hot(idxs, v, dtype=table.dtype)
        return jnp.matmul(oh, table)
    return jnp.take(table, idxs, axis=0)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(..., T, E) -> (..., H, T, Dh)."""
    *lead, t, e = x.shape
    x = x.reshape(*lead, t, num_heads, e // num_heads)
    return jnp.swapaxes(x, -3, -2)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, T, Dh) -> (..., T, E)."""
    x = jnp.swapaxes(x, -3, -2)
    *lead, t, h, d = x.shape
    return x.reshape(*lead, t, h * d)


def masked_softmax(logits: jnp.ndarray, bias: jnp.ndarray | None) -> jnp.ndarray:
    """Softmax over the last axis in fp32 with an optional additive bias."""
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: (B, H, Tq, Dh), k/v: (B, H, Tk, Dh), bias broadcastable to
    (B, H, Tq, Tk) additive in fp32. Returns (B, H, Tq, Dh) in q.dtype.

    KNOWN DIVERGENCE (documented, round-5 review): torch's
    nn.MultiheadAttention additionally applies dropout to the softmax
    WEIGHTS during training; neither this op nor the fused training
    kernels implement that site (the residual/FFN dropout1/2/3 sites all
    match exactly). With dropout active the port therefore trains with
    slightly less regularization than the reference; deterministic
    numerics (dropout off — all parity proofs) are unaffected. Adding the
    site to the fused kernels means materializing/regenerating (T, S)
    masks per head inside the grid — a measured-cost decision deferred
    with this note rather than silently skipped.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = masked_softmax(logits, bias)
    out = jnp.einsum("...qk,...kd->...qd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


from typing import NamedTuple


class MaskSpec(NamedTuple):
    """Structured attention mask: key validity + causal flag.

    Carrying the structure (instead of a materialized additive bias) lets the
    flash-attention path express masking as segment ids, never building the
    (B, H, Tq, Tk) bias tensor.
    """
    key_valid: jnp.ndarray | None = None  # (B, Tk) True = attendable
    causal: bool = False

    def to_bias(self, tq: int) -> jnp.ndarray | None:
        parts = []
        if self.causal:
            parts.append(causal_bias(tq))
        if self.key_valid is not None:
            parts.append(valid_to_bias(self.key_valid))
        return combine_bias(*parts)


def _flash_ok(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    # Opt-in: the flash kernel's forward is verified on v5e (1.3e-4 vs the
    # fused-bias path) but its backward compiles pathologically slowly through
    # the axon remote-compile tunnel. Enable per-deployment once verified.
    import os
    if os.environ.get("ACAI_FLASH_ATTENTION", "0") != "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    b, h, tq, dh = q.shape
    tk = k.shape[2]

    def _blocks_ok(t):
        # the wrapper uses block = min(512, t); flash_attention requires the
        # block to divide the length, so 128-multiples that are neither
        # <=512 nor 512-multiples (640, 768, ...) must fall back to XLA
        return t % 128 == 0 and (t <= 512 or t % 512 == 0)

    return _blocks_ok(tq) and _blocks_ok(tk) and dh >= 32 and dh % 8 == 0


def _flash_attention(q, k, v, mask: MaskSpec) -> jnp.ndarray:
    """Pallas TPU flash attention with segment-id padding masks — O(T) memory,
    no (B, H, T, T) materialization in either pass."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, tq, dh = q.shape
    tk = k.shape[2]
    seg = None
    if mask.key_valid is not None:
        # padding keys live in segment 1, everything else in 0: valid queries
        # never attend to padding, identical outputs at valid positions.
        # Queries always ride segment 0 — padded QUERIES then attend the
        # valid keys and produce ignored outputs, which is correct for self
        # AND cross attention. (The old `if tq == tk: q_seg = kv_seg`
        # self-attention shortcut misfired on cross-attention whenever the
        # lmx and latent buckets coincided, placing VALID decoder tokens in
        # the memory's padding segment — round-4 review.)
        kv_seg = (~mask.key_valid).astype(jnp.int32)
        q_seg = jnp.zeros((b, tq), dtype=jnp.int32)
        seg = fa.SegmentIds(q=q_seg, kv=kv_seg)

    bq = min(512, tq)
    bk = min(512, tk)
    block_sizes = fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    return fa.flash_attention(q, k, v, segment_ids=seg, causal=mask.causal,
                              sm_scale=1.0 / math.sqrt(dh),
                              block_sizes=block_sizes)


def mha(params: Params, x_q: jnp.ndarray, x_kv: jnp.ndarray, num_heads: int,
        bias=None, precomputed_kv: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full multi-head attention block (projections + SDPA + out proj).

    Mirrors torch nn.MultiheadAttention with a fused in_proj: when
    ``x_q is x_kv`` a single (E, 3E) matmul produces q,k,v; otherwise the
    kernel is sliced into its q and kv column blocks (reference slices the
    same fused weight for cached cross-attention,
    acai_omr/models/kv_caching.py:212-216, 241-244).

    ``bias`` may be an additive array (legacy) or a :class:`MaskSpec`; with a
    MaskSpec on TPU the Pallas flash-attention kernel runs (segment-id
    masking), falling back to the fused-bias XLA path elsewhere.

    ``precomputed_kv``: (B, Tk, 2E) already-projected+biased cross K/V
    (:func:`acai_omr_tpu.ops.transformer.precompute_memory_kv`) — the
    training-path analogue of the decode MemoryCache (reference:
    kv_caching.py:227-256); skips the per-call memory projection.
    """
    e = x_q.shape[-1]
    in_kernel = params["in_kernel"].astype(x_q.dtype)
    in_bias = params["in_bias"].astype(x_q.dtype)
    if precomputed_kv is not None:
        q = jnp.dot(x_q, in_kernel[:, :e]) + in_bias[:e]
        k, v = jnp.split(precomputed_kv.astype(x_q.dtype), 2, axis=-1)
    elif x_q is x_kv:
        qkv = jnp.dot(x_q, in_kernel) + in_bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = jnp.dot(x_q, in_kernel[:, :e]) + in_bias[:e]
        kv = jnp.dot(x_kv, in_kernel[:, e:]) + in_bias[e:]
        k, v = jnp.split(kv, 2, axis=-1)
    q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    if isinstance(bias, MaskSpec):
        if _flash_ok(q, k):
            out = _flash_attention(q, k, v, bias)
        else:
            out = attention(q, k, v, bias.to_bias(q.shape[2]))
    else:
        out = attention(q, k, v, bias)
    out = merge_heads(out)
    return dense(params["out"], out)


# ---------------------------------------------------------------------------
# mask helpers
# ---------------------------------------------------------------------------

def valid_to_bias(valid: jnp.ndarray) -> jnp.ndarray:
    """(B, Tk) bool validity -> (B, 1, 1, Tk) additive bias (0 / NEG_INF)."""
    return jnp.where(valid, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)


def causal_bias(t: int) -> jnp.ndarray:
    """(1, 1, T, T) additive causal bias."""
    mask = jnp.tril(jnp.ones((t, t), dtype=bool))
    return jnp.where(mask, 0.0, NEG_INF)[None, None, :, :].astype(jnp.float32)


def combine_bias(*biases) -> jnp.ndarray | None:
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out


def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# sequence-parallel activation sharding hook (GSPMD training)
# ---------------------------------------------------------------------------

_ACT_SHARD = None


class activation_sharding:
    """Install a sharding constraint applied to every (B, T, E) layer output
    inside the transformer stacks (Megatron sequence parallelism when the
    constraint puts T over the model axis — see
    ``parallel.sharding.sequence_parallel``).

    Trace-time: wrap the call that TRACES the jitted step; the constraint is
    baked into the compiled program and later cached calls keep it. This hook
    exists for the GSPMD-autopartitioned DP x TP training mode;
    :func:`shard_activations` detects manual (shard_map) tracing contexts —
    the DP trainer / pipeline bodies, where a GSPMD constraint is illegal —
    and skips the constraint there.
    """

    def __init__(self, fn):
        self.fn = fn

    def __enter__(self):
        global _ACT_SHARD
        self.prev = _ACT_SHARD
        _ACT_SHARD = self.fn
        return self

    def __exit__(self, *exc):
        global _ACT_SHARD
        _ACT_SHARD = self.prev
        return False


def _in_manual_ctx() -> bool:
    """True when tracing under shard_map (manual mesh axes), where GSPMD
    sharding constraints are rejected."""
    try:
        from jax._src import mesh as _mesh
        return bool(_mesh.get_abstract_mesh().manual_axes)
    except Exception:
        return False


def shard_activations(x: jnp.ndarray) -> jnp.ndarray:
    """Apply the installed activation constraint (identity when none, or
    inside a shard_map body where the constraint would be illegal)."""
    if _ACT_SHARD is None or _in_manual_ctx():
        return x
    return _ACT_SHARD(x)


def gspmd_activation_constraint_active() -> bool:
    """True when an activation_sharding constraint is installed AND we are
    in a GSPMD (non-shard_map) tracing context. The fused Pallas stacks
    must not dispatch then: an opaque pallas_call cannot be GSPMD-
    partitioned, and taking the fused fast path would silently drop the
    per-layer constraint the XLA scan applies (round-5 review)."""
    return _ACT_SHARD is not None and not _in_manual_ctx()
