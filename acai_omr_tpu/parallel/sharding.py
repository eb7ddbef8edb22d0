"""Parameter partition rules: pytree path -> PartitionSpec.

Tensor-parallel layout follows the Megatron pattern expressed as XLA sharding
constraints (scaling-book recipe: pick a mesh, annotate, let XLA insert the
collectives):

* fused qkv / linear1 kernels shard their *output* features over ``model``
  (head-parallel attention, column-parallel MLP up-projection),
* out-proj / linear2 kernels shard their *input* features (row-parallel, XLA
  inserts the psum on the residual add),
* embeddings/unembed shard the vocab/feature dim where profitable,
* everything else (norms, biases of row-parallel layers, PE grids) replicates.

Stacked layer leaves carry a leading num_layers axis which is never sharded.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# rules keyed by (parent container name, leaf name) with wildcards; evaluated
# on the flattened tree path.


def _spec_for_path(path: tuple[str, ...]) -> P:
    """PartitionSpec for one parameter leaf, identified by its tree path."""
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    grandparent = path[-3] if len(path) >= 3 else ""
    stacked = "blocks" in path  # leading layer axis present

    def with_layer(*dims):
        return P(None, *dims) if stacked else P(*dims)

    # attention projections
    if parent in ("self_attn", "cross_attn"):
        if name == "in_kernel":
            return with_layer(None, MODEL_AXIS)   # (E, 3E): shard heads
        if name == "in_bias":
            return with_layer(MODEL_AXIS)
    if grandparent in ("self_attn", "cross_attn") and parent == "out":
        if name == "kernel":
            return with_layer(MODEL_AXIS, None)   # row-parallel
        return with_layer(None) if stacked else P()

    # MLP
    if parent == "linear1":
        if name == "kernel":
            return with_layer(None, MODEL_AXIS)
        return with_layer(MODEL_AXIS)
    if parent == "linear2":
        if name == "kernel":
            return with_layer(MODEL_AXIS, None)
        return with_layer(None) if stacked else P()

    # output head
    if parent == "unembed" and name == "kernel":
        return P(None, MODEL_AXIS)

    return P()  # replicate: norms, embeddings, PE grids, scalars


def _path_names(key_path) -> tuple[str, ...]:
    names = []
    for k in key_path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def param_specs(params) -> dict:
    """Pytree of PartitionSpec matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: _spec_for_path(_path_names(kp)), params)


def param_shardings(mesh: Mesh, params) -> dict:
    """Pytree of NamedSharding for placing params on ``mesh``.

    qkv sharding over 3E assumes per-block head counts divide the model-axis
    size; when they don't (tiny test configs), the spec falls back to
    replicated for that leaf.
    """
    def to_sharding(spec, leaf):
        # validate divisibility; fall back to replication on mismatch
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else 1
            if leaf.shape[dim] % size != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    specs = param_specs(params)
    return jax.tree.map(to_sharding, specs, params)


def shard_params(mesh: Mesh, params):
    """Place a parameter pytree onto the mesh according to the rules."""
    return jax.tree.map(jax.device_put, params, param_shardings(mesh, params))


# ---------------------------------------------------------------------------
# tensor-parallel decode (explicit shard_map layout)
# ---------------------------------------------------------------------------
#
# The decode loop runs under shard_map (GSPMD cannot partition the Pallas
# kernels, and the per-op loop wants deterministic collective placement), so
# each model shard must receive a *contiguous, self-consistent* local slice.
# The fused qkv kernels store columns as [q | k | v] (each E wide,
# head-major); plain last-dim sharding would hand shard 0 a slab of q only.
# ``tp_shuffle_decoder_params`` permutes the columns to
# [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] so that sharding the last dim over the
# model axis gives every shard a locally-fused [q_i|k_i|v_i] block that the
# unmodified step code can split into thirds.


def tp_shuffle_decoder_params(params, num_heads: int, head_dim: int,
                              tp: int):
    """Reorder fused-qkv columns of every attention block for ``tp``-way
    tensor-parallel decode. Non-qkv leaves are shared, not copied."""
    import jax.numpy as jnp

    def shuffle(blocks):
        blocks = dict(blocks)
        for name in ("self_attn", "cross_attn"):
            blk = dict(blocks[name])
            kern, bias = blk["in_kernel"], blk["in_bias"]
            l, e, _ = kern.shape
            k6 = kern.reshape(l, e, 3, tp, num_heads // tp, head_dim)
            blk["in_kernel"] = jnp.transpose(
                k6, (0, 1, 3, 2, 4, 5)).reshape(l, e, 3 * e)
            b5 = bias.reshape(l, 3, tp, num_heads // tp, head_dim)
            blk["in_bias"] = jnp.transpose(
                b5, (0, 2, 1, 3, 4)).reshape(l, 3 * e)
            blocks[name] = blk
        return blocks

    out = dict(params)
    out["blocks"] = shuffle(params["blocks"])
    return out


def tp_decode_param_specs(params, model_axis: str):
    """PartitionSpec pytree for shard_map tensor-parallel decode.

    Head-parallel attention + column/row-parallel MLP like the training
    rules, with two decode-specific differences: specs name ``model_axis``
    (the caller's mesh axis) and the unembed stays replicated — each shard
    computes the full (B, V) logits so greedy/sampled selection needs no
    collective (V is tiny: 227)."""

    def spec(path):
        name, parent = path[-1], path[-2] if len(path) >= 2 else ""
        grandparent = path[-3] if len(path) >= 3 else ""
        stacked = "blocks" in path

        def with_layer(*dims):
            return P(None, *dims) if stacked else P(*dims)

        if parent in ("self_attn", "cross_attn"):
            if name == "in_kernel":
                return with_layer(None, model_axis)
            if name == "in_bias":
                return with_layer(model_axis)
        if grandparent in ("self_attn", "cross_attn") and parent == "out":
            if name == "kernel":
                return with_layer(model_axis, None)
            return with_layer(None) if stacked else P()
        if parent == "linear1":
            if name == "kernel":
                return with_layer(None, model_axis)
            return with_layer(model_axis)
        if parent == "linear2" and name == "kernel":
            return with_layer(model_axis, None)
        return P()  # norms, embeddings, unembed, linear2 bias

    return jax.tree_util.tree_map_with_path(
        lambda kp, _: spec(_path_names(kp)), params)


def sequence_parallel(mesh: Mesh, data_axis: str | None = None,
                      model_axis: str | None = None):
    """Megatron sequence parallelism as a GSPMD hint.

    Returns a constraint fn for ``ops.nn.activation_sharding``: every
    (B, T, E) layer output inside the transformer stacks is constrained to
    (B: data, T: model) — the elementwise regions between the TP matmuls
    (LayerNorm / dropout / residual adds) then compute on 1/tp of the
    tokens per chip and XLA materializes the TP boundary collectives as
    reduce-scatter / all-gather pairs instead of full all-reduces
    (scaling-book recipe; the constraint is the hint, XLA picks the
    collectives). Usage::

        with nn.activation_sharding(sequence_parallel(mesh)):
            loss, grads = grad_step(params, batch, rng)   # tracing call

    Non-3D arrays pass through untouched.
    """
    from .mesh import DATA_AXIS, MODEL_AXIS
    sh = NamedSharding(mesh, P(data_axis or DATA_AXIS,
                               model_axis or MODEL_AXIS, None))

    def constrain(x):
        if x.ndim != 3:
            return x
        return jax.lax.with_sharding_constraint(x, sh)

    return constrain
