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
