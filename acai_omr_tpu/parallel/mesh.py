"""Device-mesh construction and axis conventions.

The reference trains on exactly one CUDA device (SURVEY.md §2.5 — no
torch.distributed anywhere); parallelism here is greenfield and built on
``jax.sharding``: a named mesh with

* ``data``  — batch dimension (pure DP; the only axis needed for capability
  parity, grad all-reduce rides ICI),
* ``model`` — tensor parallelism over attention heads / MLP hidden dim
  (optional; off when the axis has size 1).

All collectives are XLA-inserted from NamedSharding constraints — no explicit
psum plumbing in model code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis. ``n_data * n_model`` must equal
    the device count used.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, jax.devices()[:1])


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for activations/inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
