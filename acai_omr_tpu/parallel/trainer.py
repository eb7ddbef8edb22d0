"""Sharded functional training: optimizers, train states, pjit'd steps.

Replaces the reference's single-GPU torch loops (reference:
acai_omr/train/pre_train.py:46-71, omr_teacher_force_train.py:104-142) with
jitted, mesh-sharded train steps:

* params + optimizer state live as sharded pytrees (DP-replicated /
  TP-partitioned per parallel.sharding rules),
* the per-batch step is one compiled function — forward, loss, backward,
  optimizer — with donated state,
* gradient accumulation is a ``lax.scan`` over microbatches inside the step
  (reference: 8x accumulation, omr_teacher_force_train.py:126-130),
* layer-wise LR decay and layer freezing act on the *layer axis* of stacked
  block parameters via :func:`layerwise_lr_scale` — the TPU-native analogue of
  the reference's per-layer param groups (models.py:761-781), which can't be
  expressed as optax leaf masks because layers share one leaf,
* frozen subtrees (MAE->OMR frozen prefix, GRPO's encoder+head,
  models.py:668-677, 850-859) use ``optax.masked`` over whole leaves.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Params = Any


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params
    opt_state: Any


# ---------------------------------------------------------------------------
# optimizer building blocks
# ---------------------------------------------------------------------------

def layerwise_lr_scale(scale_tree_fn: Callable[[Params], Params]) -> optax.GradientTransformation:
    """Multiply updates elementwise by per-leaf (broadcastable) factors.

    ``scale_tree_fn(params)`` returns a pytree matching ``params`` whose
    leaves are scalars or arrays broadcastable against the leaf — e.g. a
    (num_layers, 1, 1) vector over a stacked block leaf implementing LLRD, or
    0.0 to freeze. Applied after the optimizer core, so weight decay is scaled
    (and fully suppressed for frozen layers) too.
    """

    def init_fn(params):
        return scale_tree_fn(params)

    def update_fn(updates, state, params=None):
        updates = jax.tree.map(lambda u, s: u * s, updates, state)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_mask_zeros(mask_tree: Params) -> Callable:
    """Convert a {True: train, False: freeze} pytree into a scale tree fn."""
    def fn(params):
        return jax.tree.map(lambda m: 1.0 if m else 0.0, mask_tree)
    return fn


def adamw(learning_rate, betas=(0.9, 0.95), weight_decay: float = 0.05,
          max_grad_norm: float | None = None,
          scale_tree_fn: Callable | None = None) -> optax.GradientTransformation:
    """AdamW matching the reference settings (pre_train.py:32-35), with
    optional grad clipping and per-layer/frozen scaling."""
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                             weight_decay=weight_decay))
    if scale_tree_fn is not None:
        chain.append(layerwise_lr_scale(scale_tree_fn))
    return optax.chain(*chain)


def key_path_names(kp) -> tuple:
    """jax key-path -> tuple of name strings (shared by the scale-tree
    builders here and train/omr_grpo_train.grpo_frozen_scales)."""
    return tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def encoder_llrd_scales(params: Params, cfg, fine_tune_lr_ratio: float,
                        decay_factor: float) -> Params:
    """Scale tree implementing the reference's fine-tune param groups
    (models.py:761-781) on stacked leaves.

    Base LR applies to decoder + transition head (scale 1). Encoder fine-tune
    layer i (deepest = num_layers-1) is scaled by
    ``fine_tune_lr_ratio * decay^(num_layers-1-i)``; frozen prefix layers get
    0. PE grid + projection get the minimum layer scale; the encoder final
    norm gets ``fine_tune_lr_ratio``.
    """
    enc_cfg = cfg.encoder
    n = enc_cfg.num_layers
    # fine_tune_depth=0 freezes the WHOLE encoder: n_frozen must be n, not 0
    # (the old `if depth else 0` trained every block at fine-tune LRs while
    # zeroing pos-embedding/projection/final_norm — round-4 review)
    n_frozen = n - enc_cfg.fine_tune_depth

    layer_scale = jnp.zeros((n,))
    for i in range(n_frozen, n):
        depth_from_top = n - 1 - i
        layer_scale = layer_scale.at[i].set(
            fine_tune_lr_ratio * decay_factor ** depth_from_top)
    min_scale = float(fine_tune_lr_ratio * decay_factor ** (enc_cfg.fine_tune_depth - 1)) \
        if enc_cfg.fine_tune_depth else 0.0

    def scale_for(path_names, leaf):
        if path_names[0] != "encoder":
            return 1.0
        if "blocks" in path_names:
            extra = (1,) * (leaf.ndim - 1)
            return layer_scale.reshape((n,) + extra)
        if path_names[1] == "final_norm":
            return fine_tune_lr_ratio if enc_cfg.fine_tune_depth else 0.0
        # pos_embedding, projection — lowest fine-tune LR (models.py:776-777)
        return min_scale if enc_cfg.fine_tune_depth else 0.0

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: scale_for(key_path_names(kp), leaf), params)


# ---------------------------------------------------------------------------
# train state + steps
# ---------------------------------------------------------------------------

def create_train_state(params: Params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    donate: bool = True):
    """Build a jitted train step.

    ``loss_fn(params, batch, rng) -> (loss, aux)``; batch is any pytree of
    arrays (already device-resident / sharded). Returns
    ``step(state, batch, rng) -> (state, metrics)``.
    """

    def step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_grad_fn(loss_fn: Callable):
    """Jitted (loss, grads) evaluator — the building block for host-driven
    gradient accumulation across *differently-shaped* bucketed batches (a
    lax.scan can't span shape buckets; summing grads on device can)."""

    @jax.jit
    def grad_fn(params, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        return loss, grads

    return grad_fn


def make_grad_acc_fn(loss_fn: Callable):
    """Jitted (loss, acc + grads) evaluator with a DONATED accumulator.

    `grad_fn` + the eager `accumulate_grads` tree-add costs a full
    grad-tree round trip per microbatch (write grads, re-read both trees,
    write the sum — ~2.6 GB of fp32 HBM traffic at flagship scale) plus a
    few hundred eager op dispatches. Fusing the add into the same jit lets
    XLA write the summed gradients straight into the donated accumulator
    buffer: measured ~4 ms/microbatch at the flagship seq2seq shape.
    Use for every window microbatch after the first (the first microbatch's
    plain `grad_fn` output IS the initial accumulator). Numerics are
    identical to `accumulate_grads` (same fp32 adds, same order).
    """

    @functools.partial(jax.jit, donate_argnums=(3,))
    def grad_acc_fn(params, batch, rng, acc):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        return loss, jax.tree.map(jnp.add, acc, grads)

    return grad_acc_fn


def make_apply_fn(tx: optax.GradientTransformation, donate: bool = True):
    """Jitted optimizer application for accumulated gradients.

    ``scale`` rescales the summed window gradients before the update; the
    reference steps on the raw SUM of per-batch mean gradients
    (loss.backward() x8 then step, omr_teacher_force_train.py:118-127), so
    its parity value is 1.0.

    ``donate=True`` (default) donates the state and the gradients: callers
    always rebind ``state = apply_fn(state, grads, ...)`` and drop the grads,
    and without donation a chain of async-dispatched steps holds every
    in-flight step's ~3 GB state + grads live at once (observed TPU OOM at
    ~20 chained flagship seq2seq steps). Pass ``donate=False`` only if the
    old state or the grads are reused after the call.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def apply_fn(state: TrainState, grads, scale):
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state)

    return apply_fn


def accumulate_grads(acc, grads):
    """Device-side pytree add (None acc starts the window)."""
    if acc is None:
        return grads
    return jax.tree.map(jnp.add, acc, grads)


def make_window_step_fn(loss_fn: Callable, tx: optax.GradientTransformation,
                        accum: int):
    """One jitted optimizer WINDOW: ``lax.scan`` over ``accum`` same-shaped
    microbatches, grads accumulated in the scan carry, optimizer applied
    once — all inside a single dispatch.

    vs the host-driven grad_fn/grad_acc_fn/apply_fn window this removes the
    per-microbatch dispatch gap (~3 ms each through the axon tunnel) and
    lets XLA's while-loop invariant code motion hoist the loop-invariant
    fp32->bf16 weight-pack casts for the fused Pallas kernels out of the
    microbatch body (re-cast per microbatch otherwise — ~1.4 GB of HBM
    traffic at flagship scale). Numerics are identical: zeros + g1 + ... +
    g_n in the same fp32 add order, then the update on the raw sum
    (reference regime: 8x loss.backward() then step,
    omr_teacher_force_train.py:118-127).

    ``step(state, batches, rng, scale) -> (state, losses)`` where
    ``batches`` is the microbatch pytree stacked on a leading ``(accum,)``
    axis (use :func:`stack_microbatches`) — a scan cannot span bucket
    shapes; fall back to the host-driven window for mixed-bucket windows.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batches, rng, scale):
        rngs = jax.random.split(rng, accum)

        def body(acc, xs):
            batch, sk = xs
            (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, sk)
            return jax.tree.map(jnp.add, acc, grads), loss

        acc0 = jax.tree.map(jnp.zeros_like, state.params)
        grads, losses = jax.lax.scan(body, acc0, (batches, rngs))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), losses

    return step


def stack_microbatches(batches):
    """Stack a list of same-shaped microbatch pytrees on a new leading axis
    (the ``batches`` input of :func:`make_window_step_fn`)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


# ---------------------------------------------------------------------------
# shard_map data parallelism (keeps Pallas kernels per shard)
# ---------------------------------------------------------------------------
#
# GSPMD auto-partitioning cannot split a Pallas custom call, so sharding a
# batch through a plain jitted step silently de-optimizes (or rejects) the
# fused training-layer / flash-attention kernels. These builders run the
# per-shard computation under shard_map — each device executes the full
# single-chip step, kernels included, on its local rows — and reduce with an
# EXACT global masked mean: the loss fns return (sum, weight); psum of both
# then one divide equals the single-device masked mean regardless of how
# valid tokens distribute across shards.

def _batch_specs(batch, axis):
    from jax.sharding import PartitionSpec as P
    return {k: (P() if jnp.ndim(v) == 0 else P(axis))
            for k, v in batch.items()}


def _sharded_loss_and_grads(sum_loss_fn: Callable, axis: str):
    """Per-shard (loss, grads) body: value_and_grad of the local SUM, psum'd
    sums/weights/grads, one divide — exact global masked mean. The PRNG is
    folded by shard index so dropout/sampling draws are independent across
    devices."""

    def local(params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def s_fn(p):
            s, n = sum_loss_fn(p, batch, rng)
            return s, n

        (s, n), grads = jax.value_and_grad(s_fn, has_aux=True)(params)
        s = jax.lax.psum(s, axis)
        n = jnp.maximum(jax.lax.psum(n, axis), 1.0)  # all-padding batch: 0 grads, not NaN
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis) / n, grads)
        return s / n, grads

    return local


def make_sharded_grad_fn(sum_loss_fn: Callable, mesh, axis: str = "data"):
    """DP analogue of :func:`make_grad_fn`.

    ``sum_loss_fn(params, batch, rng) -> (loss_sum, weight)``. Returns
    ``grad_fn(params, batch, rng) -> (global mean loss, grads of it)`` —
    drop-in for the host-accumulation loop.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local = _sharded_loss_and_grads(sum_loss_fn, axis)

    @jax.jit
    def grad_fn(params, batch, rng):
        f = shard_map(local, mesh=mesh,
                      in_specs=(P(), _batch_specs(batch, axis), P()),
                      out_specs=(P(), P()), check_vma=False)
        return f(params, batch, rng)

    return grad_fn


def make_sharded_grad_acc_fn(sum_loss_fn: Callable, mesh, axis: str = "data"):
    """DP analogue of :func:`make_grad_acc_fn` (donated accumulator fused
    into the grad step — see that docstring for why)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local = _sharded_loss_and_grads(sum_loss_fn, axis)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def grad_acc_fn(params, batch, rng, acc):
        f = shard_map(local, mesh=mesh,
                      in_specs=(P(), _batch_specs(batch, axis), P()),
                      out_specs=(P(), P()), check_vma=False)
        loss, grads = f(params, batch, rng)
        return loss, jax.tree.map(jnp.add, acc, grads)

    return grad_acc_fn


def make_sharded_train_step(sum_loss_fn: Callable,
                            tx: optax.GradientTransformation, mesh,
                            axis: str = "data", donate: bool = True):
    """DP analogue of :func:`make_train_step`: shard_map'd grads (Pallas
    kernels run per shard), replicated optimizer apply."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local = _sharded_loss_and_grads(sum_loss_fn, axis)

    def step(state: TrainState, batch, rng):
        f = shard_map(local, mesh=mesh,
                      in_specs=(P(), _batch_specs(batch, axis), P()),
                      out_specs=(P(), P()), check_vma=False)
        loss, grads = f(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_eval_fn(sum_eval_fn: Callable, mesh, axis: str = "data"):
    """DP eval: ``sum_eval_fn(params, batch[, rng]) -> (sum, weight)`` →
    global mean per batch (one scalar, replicated)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(params, batch, rng):
        if rng is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        s, n = sum_eval_fn(params, batch, rng)
        s = jax.lax.psum(s, axis)
        n = jax.lax.psum(n, axis)
        return s / jnp.maximum(n, 1.0)

    @jax.jit
    def eval_fn(params, batch, rng=None):
        f = shard_map(local, mesh=mesh,
                      in_specs=(P(), _batch_specs(batch, axis), P()),
                      out_specs=P(), check_vma=False)
        return f(params, batch, rng)

    return eval_fn


def make_accum_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                          num_microbatches: int, donate: bool = True):
    """Gradient-accumulation variant: ``batch`` leaves carry a leading
    (num_microbatches, ...) axis; grads are averaged over microbatches with a
    lax.scan before one optimizer step (reference: 8-step accumulation,
    omr_teacher_force_train.py:40,126)."""

    def step(state: TrainState, batch, rng):
        rngs = jax.random.split(rng, num_microbatches)

        def micro(carry, xs):
            grads_acc, loss_acc = carry
            mb, r = xs
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb, r)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), None

        zero = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), (batch, rngs))
        grads = jax.tree.map(lambda g: g / num_microbatches, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss_sum / num_microbatches,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
