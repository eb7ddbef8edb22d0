"""Stacked post-norm transformer blocks driven by ``lax.scan``.

The reference uses ``nn.TransformerEncoder`` / ``nn.TransformerDecoder`` with
post-norm layers, exact GELU, per-layer LayerNorm eps 1e-5 and a final norm
with eps 1e-6 (reference: acai_omr/models/models.py:30-34, 412-426). We keep
those numerics but store each stack's parameters as a single pytree whose
leaves carry a leading ``num_layers`` axis, and run the stack with
``lax.scan``. That gives O(1) compile cost in depth, lets remat
(`jax.checkpoint`) wrap exactly one layer (the reference's per-layer
``checkpoint_sequential``, models.py:470-478), and makes tensor-parallel
sharding a single PartitionSpec per leaf.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import nn

Params = dict

# lax.scan cannot overlap one layer's weight DMA with the previous layer's
# compute across iterations; unrolling gives XLA that freedom at the cost of
# program size. A/B'd via ACAI_SCAN_UNROLL (read at trace time).
def _scan_unroll() -> int:
    try:
        return max(1, int(os.environ.get("ACAI_SCAN_UNROLL", "1")))
    except ValueError:
        return 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def encoder_layer_init(key, dim: int, mlp_dim: int, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 3)
    return {
        "self_attn": nn.mha_init(keys[0], dim, dtype),
        "norm1": nn.layernorm_init(dim, dtype),
        "linear1": nn.dense_init(keys[1], dim, mlp_dim, dtype),
        "linear2": nn.dense_init(keys[2], mlp_dim, dim, dtype),
        "norm2": nn.layernorm_init(dim, dtype),
    }


def decoder_layer_init(key, dim: int, mlp_dim: int, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 4)
    return {
        "self_attn": nn.mha_init(keys[0], dim, dtype),
        "norm1": nn.layernorm_init(dim, dtype),
        "cross_attn": nn.mha_init(keys[1], dim, dtype),
        "norm2": nn.layernorm_init(dim, dtype),
        "linear1": nn.dense_init(keys[2], dim, mlp_dim, dtype),
        "linear2": nn.dense_init(keys[3], mlp_dim, dim, dtype),
        "norm3": nn.layernorm_init(dim, dtype),
    }


def stack_init(layer_init, key, num_layers: int, *args, **kwargs) -> Params:
    """Init ``num_layers`` layers and stack leaves along a leading axis."""
    layers = [layer_init(k, *args, **kwargs) for k in jax.random.split(key, num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def stack_slice(stacked: Params, lo: int, hi: int) -> Params:
    """Sub-stack [lo, hi) of a stacked layer pytree (for frozen/fine-tune splits)."""
    return jax.tree.map(lambda x: x[lo:hi], stacked)


def stack_concat(a: Params, b: Params) -> Params:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def num_stacked_layers(stacked: Params) -> int:
    return jax.tree.leaves(stacked)[0].shape[0]


# ---------------------------------------------------------------------------
# single-layer forwards (post-norm, torch semantics)
# ---------------------------------------------------------------------------

def encoder_layer(params: Params, x: jnp.ndarray, bias, num_heads: int,
                  dropout_rate: float = 0.0, rng=None,
                  deterministic: bool = True) -> jnp.ndarray:
    """x = norm1(x + SA(x)); x = norm2(x + FF(x)). bias: additive attn bias."""
    if rng is None:
        rngs = (None,) * 3
    else:
        rngs = jax.random.split(rng, 3)
    sa = nn.mha(params["self_attn"], x, x, num_heads, bias)
    sa = nn.dropout(rngs[0], sa, dropout_rate, deterministic)
    x = nn.layernorm(params["norm1"], x + sa, eps=1e-5)
    h = nn.gelu(nn.dense(params["linear1"], x))
    h = nn.dropout(rngs[1], h, dropout_rate, deterministic)
    h = nn.dense(params["linear2"], h)
    h = nn.dropout(rngs[2], h, dropout_rate, deterministic)
    return nn.layernorm(params["norm2"], x + h, eps=1e-5)


def decoder_layer(params: Params, x: jnp.ndarray, memory: jnp.ndarray,
                  self_bias, cross_bias, num_heads: int,
                  dropout_rate: float = 0.0, rng=None,
                  deterministic: bool = True,
                  mem_kv: jnp.ndarray | None = None,
                  cross_group: int = 1) -> jnp.ndarray:
    """Post-norm decoder layer: SA -> norm1, CA -> norm2, FF -> norm3.

    ``mem_kv``: optional (B, Tm, 2E) precomputed cross K/V for this layer
    (see :func:`precompute_memory_kv`); skips the in-layer memory projection.

    ``cross_group``: G > 1 declares that ``x``'s rows are G contiguous
    rollouts per unique memory row (GRPO's ``jnp.repeat`` latent expansion,
    reference models.py:883-891): ``memory``/``mem_kv``/``cross_bias`` carry
    only the B/G unique rows and the G rollouts fold into the cross
    query axis — identical attention output, 1/G the K/V projection work.
    """
    if rng is None:
        rngs = (None,) * 4
    else:
        rngs = jax.random.split(rng, 4)
    sa = nn.mha(params["self_attn"], x, x, num_heads, self_bias)
    sa = nn.dropout(rngs[0], sa, dropout_rate, deterministic)
    x = nn.layernorm(params["norm1"], x + sa, eps=1e-5)
    if cross_group > 1:
        r, t, e = x.shape
        xq = x.reshape(r // cross_group, cross_group * t, e)
        ca = nn.mha(params["cross_attn"], xq, memory, num_heads, cross_bias,
                    precomputed_kv=mem_kv).reshape(r, t, e)
    else:
        ca = nn.mha(params["cross_attn"], x, memory, num_heads, cross_bias,
                    precomputed_kv=mem_kv)
    ca = nn.dropout(rngs[1], ca, dropout_rate, deterministic)
    x = nn.layernorm(params["norm2"], x + ca, eps=1e-5)
    h = nn.gelu(nn.dense(params["linear1"], x))
    h = nn.dropout(rngs[2], h, dropout_rate, deterministic)
    h = nn.dense(params["linear2"], h)
    h = nn.dropout(rngs[3], h, dropout_rate, deterministic)
    return nn.layernorm(params["norm3"], x + h, eps=1e-5)


# ---------------------------------------------------------------------------
# stacked forwards
# ---------------------------------------------------------------------------

def _remat_wrap(run_layer, remat):
    """remat=False: no rematerialization. True: full per-layer recompute
    (reference checkpoint_sequential semantics, minimum memory). "dots":
    save matmul outputs, recompute attention internals/elementwise in the
    backward — the standard transformer policy; measured ~10-15% faster
    training steps than full recompute at seq2seq scale while still
    avoiding the O(T^2) attention-probs residuals."""
    if not remat:
        return run_layer
    if remat == "dots":
        return jax.checkpoint(
            run_layer,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(run_layer)


def encoder_stack(stacked: Params, x: jnp.ndarray, bias, num_heads: int,
                  dropout_rate: float = 0.0, rng=None,
                  deterministic: bool = True, remat=False) -> jnp.ndarray:
    """Run a stack of encoder layers with lax.scan over the layer axis.

    On TPU with qualifying shapes the stack runs as one fused Pallas grid
    per pass (ops/pallas_train_layer.py, default-on;
    ``ACAI_FUSED_TRAIN_LAYER=0`` opts out), like the decoder stack below.
    """
    if isinstance(bias, nn.MaskSpec) and not bias.causal \
            and not nn.gspmd_activation_constraint_active():
        from . import pallas_train_layer as ptl
        b, t, e = x.shape
        f = stacked["linear1"]["kernel"].shape[2]
        itemsize = jnp.dtype(x.dtype).itemsize
        # saves_fit: the decoder gate's HBM guard applies here too — large
        # encoder batches otherwise dispatch fused with backward saves
        # exceeding HBM instead of falling back to the rematerializing
        # XLA stack (round-5 review; the formula over-counts the encoder's
        # cross-free saves slightly, which only makes the guard safer)
        if ptl.enabled_for_enc(b, t, e, num_heads) \
                and ptl.saves_fit(b, t, e, f, num_stacked_layers(stacked),
                                  itemsize) \
                and ptl.fwd_vmem_fits(b, t, 0, e, f, itemsize, cross=False):
            valid = (bias.key_valid if bias.key_valid is not None
                     else jnp.ones((b, t), bool))
            return ptl.encoder_stack_fused(
                stacked, x, valid, num_heads, dropout_rate, rng,
                deterministic)

    n = num_stacked_layers(stacked)
    layer_rngs = None if rng is None else jax.random.split(rng, n)

    def run_layer(layer_params, carry, layer_rng):
        out = encoder_layer(layer_params, carry, bias, num_heads,
                            dropout_rate, layer_rng, deterministic)
        return nn.shard_activations(out)

    run_layer = _remat_wrap(run_layer, remat)

    if layer_rngs is None:
        def body(carry, layer_params):
            return run_layer(layer_params, carry, None), None
        out, _ = jax.lax.scan(body, x, stacked, unroll=_scan_unroll())
    else:
        def body(carry, xs):
            layer_params, layer_rng = xs
            return run_layer(layer_params, carry, layer_rng), None
        out, _ = jax.lax.scan(body, x, (stacked, layer_rngs),
                              unroll=_scan_unroll())
    return out


def precompute_memory_kv(stacked: Params, memory: jnp.ndarray) -> jnp.ndarray:
    """All layers' cross-attention K/V projections of ``memory`` in one
    batched matmul -> (L, B, Tm, 2E).

    The training-path analogue of the decode path's per-layer MemoryCache
    (reference: acai_omr/models/kv_caching.py:227-256). Scheduled sampling's
    two decoder passes consume the *same* memory with the same weights —
    computing the K/V once and passing them to both passes removes a full
    set of memory projections (~1.2 TFLOP/step at flagship shapes, fwd+bwd).
    """
    e = memory.shape[-1]
    kern = stacked["cross_attn"]["in_kernel"][:, :, e:].astype(memory.dtype)
    bias = stacked["cross_attn"]["in_bias"][:, e:].astype(memory.dtype)
    kv = jnp.einsum("bte,lef->lbtf", memory, kern,
                    preferred_element_type=memory.dtype)
    return kv + bias[:, None, None, :]


def decoder_stack(stacked: Params, x: jnp.ndarray, memory: jnp.ndarray,
                  self_bias, cross_bias, num_heads: int,
                  dropout_rate: float = 0.0, rng=None,
                  deterministic: bool = True, remat=False,
                  mem_kv: jnp.ndarray | None = None,
                  cross_group: int = 1) -> jnp.ndarray:
    """Run a stack of decoder layers with lax.scan over the layer axis.

    ``remat=True`` recomputes each layer's activations in the backward pass —
    the TPU-native analogue of the reference's layer-wise
    ``checkpoint_sequential`` used to fit GRPO rollouts in memory
    (reference: acai_omr/models/models.py:470-478).

    ``mem_kv``: optional (L, B, Tm, 2E) precomputed cross K/V
    (:func:`precompute_memory_kv`); each layer consumes its slice instead of
    projecting ``memory`` in-layer. The remat wrapper treats the slice as a
    layer input, so it is saved (not recomputed) in the backward pass.

    On TPU with qualifying shapes the stack runs as one fused Pallas grid
    per pass (ops/pallas_train_layer.py, default-on;
    ``ACAI_FUSED_TRAIN_LAYER=0`` opts out) — its backward kernel subsumes
    ``remat`` (activations are re-derived in VMEM).
    """
    if (mem_kv is not None
            and isinstance(self_bias, nn.MaskSpec) and self_bias.causal
            and (cross_bias is None or isinstance(cross_bias, nn.MaskSpec))
            and not nn.gspmd_activation_constraint_active()):
        from . import pallas_train_layer as ptl
        b, t, e = x.shape
        m = mem_kv.shape[2]
        f = stacked["linear1"]["kernel"].shape[2]
        nl = num_stacked_layers(stacked)
        itemsize = jnp.dtype(x.dtype).itemsize
        if (ptl.enabled_for(b, t, m, e, num_heads)
                and ptl.saves_fit(b, t, e, f, nl, itemsize)
                and ptl.fwd_vmem_fits(b, t, m, e, f, itemsize)):
            self_valid = (self_bias.key_valid if self_bias.key_valid is not None
                          else jnp.ones((b, t), bool))
            mkv = mem_kv
            if cross_group > 1:
                # G rollouts per unique memory row (GRPO updates): the K/V
                # are already projected once per unique row; replicate only
                # the projected rows so each rollout carries its group's
                # K/V window (2.07x/rollout-row vs the grouped XLA stack,
                # tools/fused_grpo_ab.py; d(mem_kv) segment-sums back
                # through the repeat).
                mkv = jnp.repeat(mem_kv, cross_group, axis=1)
            if cross_bias is not None and cross_bias.key_valid is not None:
                mem_valid = cross_bias.key_valid
                if cross_group > 1:
                    mem_valid = jnp.repeat(mem_valid, cross_group, axis=0)
            else:
                mem_valid = jnp.ones((b, m), bool)
            return ptl.decoder_stack_fused(
                stacked, x, mkv, self_valid, mem_valid, num_heads,
                dropout_rate, rng, deterministic)

    n = num_stacked_layers(stacked)
    layer_rngs = None if rng is None else jax.random.split(rng, n)

    def run_layer(layer_params, carry, layer_rng, mem_kv_l):
        out = decoder_layer(layer_params, carry, memory, self_bias, cross_bias,
                            num_heads, dropout_rate, layer_rng, deterministic,
                            mem_kv=mem_kv_l, cross_group=cross_group)
        return nn.shard_activations(out)

    run_layer = _remat_wrap(run_layer, remat)

    xs = (stacked, layer_rngs, mem_kv)
    present = tuple(x_ is not None for x_ in xs)

    def body(carry, packed):
        it = iter(packed)
        layer_params = next(it)
        layer_rng = next(it) if present[1] else None
        mem_kv_l = next(it) if present[2] else None
        return run_layer(layer_params, carry, layer_rng, mem_kv_l), None

    out, _ = jax.lax.scan(body, x,
                          tuple(x_ for x_ in xs if x_ is not None),
                          unroll=_scan_unroll())
    return out
