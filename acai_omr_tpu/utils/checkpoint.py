"""Orbax-backed checkpointing with the reference's three-stage handoff.

Replaces ``torch.save`` state-dict dicts (reference: pre_train.py:38-44,
omr_teacher_force_train.py:96-102) with orbax pytree checkpoints, and — unlike
the reference, which has no resume path at all (SURVEY.md §5) — supports
restoring full train state (params + optimizer + step) to continue a run.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path, tree) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    _ckptr().save(path, jax.tree.map(np.asarray, tree), force=True)


def load_pytree(path, like=None):
    """Restore a pytree; if ``like`` is given, restores with its structure and
    dtypes/shapes validated."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    if like is not None:
        ref = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(ocp.utils, "to_shape_dtype_struct")
            else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), like)
        try:
            return _ckptr().restore(path, item=ref)
        except TypeError:
            return _ckptr().restore(path)
    return _ckptr().restore(path)


def save_train_state(path, state) -> None:
    """Save a parallel.trainer.TrainState (step/params/opt_state)."""
    save_pytree(path, {"step": state.step, "params": state.params,
                       "opt_state": state.opt_state})


def load_params(path):
    """Load just the model params from a train-state or bare-params checkpoint."""
    tree = load_pytree(path)
    if isinstance(tree, dict) and "params" in tree:
        return tree["params"]
    return tree


def load_train_state(path, like_state):
    """Restore a full TrainState for resume (capability the reference lacks —
    SURVEY.md §5 notes no resume path exists there).

    ``like_state`` provides the pytree structure (opt_state trees are
    optimizer-specific); restored leaves are converted to jax arrays.
    """
    import jax.numpy as jnp
    tree = load_pytree(path)
    restored = {"step": tree["step"], "params": tree["params"],
                "opt_state": tree["opt_state"]}
    # rebuild the TrainState namedtuple with the original opt_state structure
    flat_saved, _ = jax.tree_util.tree_flatten(restored["opt_state"])
    flat_like, treedef = jax.tree_util.tree_flatten(like_state.opt_state)
    if len(flat_saved) != len(flat_like):
        raise ValueError("checkpoint optimizer state does not match optimizer")
    opt_state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in flat_saved])
    return like_state._replace(step=jnp.asarray(restored["step"]),
                               params=jax.tree.map(jnp.asarray, restored["params"]),
                               opt_state=opt_state)
