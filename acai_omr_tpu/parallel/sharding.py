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
