"""Pipeline-parallel decoder training over a named mesh axis.

The reference has no parallelism of any kind (SURVEY §2.5); DP and TP are
covered by ``parallel/trainer.py`` / ``parallel/sharding.py``. This module
adds the pipeline dimension the TPU-native way: the decoder's stacked layer
axis is split into S contiguous stages sharded over a mesh axis, and a
GPipe-style microbatch schedule is expressed as a ``lax.scan`` over
``n_micro + S - 1`` ticks under ``shard_map``, with activations hopping
stage i -> i+1 via ``lax.ppermute`` each tick. Because every collective has
a transpose rule, ``jax.grad`` differentiates straight through the schedule
— the backward pass is pipelined in reverse automatically, with no
hand-written 1F1B state machine.

Scale notes (scaling-book mental model): stage hops are point-to-point
ppermutes that ride neighbouring ICI links; bubble fraction is
(S - 1) / (n_micro + S - 1), so pick ``n_micro >= 4 * S`` for real runs.
Embedding/unembed/final-norm params are replicated and the embed/loss math
runs redundantly on every stage (masked to the boundary stages), which
keeps control flow mesh-uniform — the redundant FLOPs are a few percent of
a layer stack at these shapes. Composes with a data axis (each data row of
the mesh pipelines its own batch shard; loss is the exact (sum, weight)
psum reduction used by ``parallel.trainer``).

For a 305M-parameter model pipeline parallelism is a capability, not a
necessity — DP (+TP for latency decode) is the recommended deployment; this
exists so the framework covers the axis when models outgrow one chip's HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

Params = dict


def split_stages(stacked: Params, n_stages: int) -> Params:
    """(L, ...) stacked layer leaves -> (S, L/S, ...) stage-major."""
    def f(leaf):
        l = leaf.shape[0]
        if l % n_stages:
            raise ValueError(f"{l} layers do not split into {n_stages} stages")
        return leaf.reshape(n_stages, l // n_stages, *leaf.shape[1:])
    return jax.tree.map(f, stacked)


def merge_stages(stacked: Params) -> Params:
    """Inverse of :func:`split_stages`."""
    return jax.tree.map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), stacked)


def pp_param_specs(params: Params, stage_axis: str) -> Params:
    """Decoder param specs: blocks stage-sharded on the leading (stage)
    axis, everything else (embeddings, final norm, unembed) replicated."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["blocks"] = jax.tree.map(lambda _: P(stage_axis), params["blocks"])
    return specs


def stage_params(params: Params, cfg, mesh, stage_axis: str) -> Params:
    """Split the decoder blocks into mesh.shape[stage_axis] stages and place
    the pytree on the mesh (blocks stage-sharded, the rest replicated)."""
    out = dict(params)
    out["blocks"] = split_stages(params["blocks"], mesh.shape[stage_axis])
    specs = pp_param_specs(out, stage_axis)
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), out, specs)


def unstage_params(params: Params) -> Params:
    """Back to the standard (L, ...) stacked layout (e.g. for checkpoints)."""
    out = dict(params)
    out["blocks"] = merge_stages(params["blocks"])
    return out


def make_pp_loss_fn(cfg, mesh, *, stage_axis: str, data_axis: str | None = None,
                    n_micro: int = 4, label_smoothing: float = 0.0,
                    compute_dtype=jnp.float32, remat=False):
    """Pipelined teacher-forced decoder CE loss (reference: models.py:722-736
    + 784-796 semantics, pipelined).

    Returns ``loss_fn(params_pp, seqs_in, seqs_tgt, lmx_valid, latent,
    latent_valid) -> scalar mean CE`` — jit-able and differentiable
    (``jax.value_and_grad`` pipelines the backward through the ppermute
    transposes). ``params_pp`` comes from :func:`stage_params`. The batch
    (local to each data shard) must divide by ``n_micro``. Dropout is not
    applied (pipeline training runs deterministic layers; the reference's
    dropout lives in the DP/TP paths).
    """
    from ..models import omr_decoder, vitomr
    from ..ops import nn, transformer

    s = mesh.shape[stage_axis]
    hops = [(i, i + 1) for i in range(s - 1)]

    def shard_fn(p, seqs_in, seqs_tgt, lmx_valid, latent, latent_valid):
        blocks = jax.tree.map(lambda x: x[0], p["blocks"])  # (L/S, ...)
        idx = jax.lax.axis_index(stage_axis)
        b, t = seqs_in.shape[0], seqs_in.shape[1]
        if b % n_micro:
            raise ValueError(f"local batch {b} does not divide into "
                             f"{n_micro} microbatches")
        mb = b // n_micro

        def micros(x):
            return (None if x is None
                    else x.reshape(n_micro, mb, *x.shape[1:]))

        x = omr_decoder.embed_tokens(p, seqs_in, compute_dtype)
        xm, tgt = micros(x), micros(seqs_tgt)
        lv, mem, mv = micros(lmx_valid), micros(
            latent.astype(compute_dtype)), micros(latent_valid)

        def dyn(arr, i):
            return (None if arr is None
                    else jax.lax.dynamic_index_in_dim(arr, i, 0,
                                                      keepdims=False))

        def tick(buf, tick_i):
            # stage `idx` processes microbatch `tick_i - idx` this tick
            mi = jnp.clip(tick_i - idx, 0, n_micro - 1)
            x_in = jnp.where(idx == 0, dyn(xm, mi), buf)
            lv_i, mv_i = dyn(lv, mi), dyn(mv, mi)
            self_bias = nn.MaskSpec(key_valid=lv_i, causal=True)
            cross_bias = (nn.MaskSpec(key_valid=mv_i)
                          if mv_i is not None else None)
            out = transformer.decoder_stack(
                blocks, x_in, dyn(mem, mi), self_bias, cross_bias,
                cfg.num_heads, 0.0, None, True, remat)
            return jax.lax.ppermute(out, stage_axis, hops), out

        buf0 = jnp.zeros((mb, t, cfg.hidden_dim), compute_dtype)
        _, outs = jax.lax.scan(tick, buf0, jnp.arange(n_micro + s - 1))
        ys = outs[s - 1:]                 # (n_micro, mb, T, E), real on last
        h = nn.layernorm(p["final_norm"], ys, eps=1e-6)
        logits = nn.dense(p["unembed"], h).astype(jnp.float32)
        nll, cnt = vitomr.omr_ce_loss(logits, tgt, cfg.pad_idx,
                                      label_smoothing, reduction="sum")
        last = (idx == s - 1).astype(jnp.float32)
        nll = jax.lax.psum(nll * last, stage_axis)
        cnt = jax.lax.psum(cnt * last, stage_axis)
        if data_axis is not None:
            nll = jax.lax.psum(nll, data_axis)
            cnt = jax.lax.psum(cnt, data_axis)
        return nll / jnp.maximum(cnt, 1.0)

    from jax import shard_map

    def batch_spec(_):
        return P(data_axis) if data_axis is not None else P()

    def loss_fn(params_pp, seqs_in, seqs_tgt, lmx_valid, latent,
                latent_valid):
        args = (seqs_in, seqs_tgt, lmx_valid, latent, latent_valid)
        f = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(pp_param_specs(params_pp, stage_axis),)
            + tuple(batch_spec(a) for a in args),
            out_specs=P(), check_vma=False)
        return f(params_pp, *args)

    return loss_fn


def make_pp_grad_fn(cfg, mesh, *, stage_axis: str,
                    data_axis: str | None = None, n_micro: int = 4,
                    label_smoothing: float = 0.0,
                    compute_dtype=jnp.float32, remat=False):
    """jitted ``grad_fn(params_pp, batch) -> (mean loss, grads_pp)`` where
    ``batch = (seqs_in, seqs_tgt, lmx_valid, latent, latent_valid)``; grads
    carry the stage-sharded layout (feed optax directly — updates stay
    sharded — or :func:`unstage_params` them for checkpoints)."""
    loss_fn = make_pp_loss_fn(cfg, mesh, stage_axis=stage_axis,
                              data_axis=data_axis, n_micro=n_micro,
                              label_smoothing=label_smoothing,
                              compute_dtype=compute_dtype, remat=remat)

    @jax.jit
    def grad_fn(params_pp, batch):
        return jax.value_and_grad(
            lambda p: loss_fn(p, *batch))(params_pp)

    return grad_fn


def make_pp_train_step(cfg, tx, mesh, *, stage_axis: str,
                       data_axis: str | None = None, n_micro: int = 4,
                       label_smoothing: float = 0.0,
                       compute_dtype=jnp.float32, remat=False,
                       donate: bool = True):
    """Pipelined train step: ``step(state, batch) -> (state, metrics)``.

    ``state.params`` / ``state.opt_state`` keep the stage-sharded layout
    from :func:`stage_params` throughout (optax transforms are elementwise,
    so updates stay sharded); the loss metric is the exact global mean CE.
    """
    import optax
    from .trainer import TrainState

    loss_fn = make_pp_loss_fn(cfg, mesh, stage_axis=stage_axis,
                              data_axis=data_axis, n_micro=n_micro,
                              label_smoothing=label_smoothing,
                              compute_dtype=compute_dtype, remat=remat)

    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, *batch))(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
