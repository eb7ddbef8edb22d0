"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so every sharding/mesh codepath is
exercised without TPU hardware (the multi-chip strategy SURVEY.md §4 calls
for). Must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU through the config API.
jax.config.update("jax_platforms", "cpu")

# Flask is optional in production (serving/routes.py gates on import) but the
# blueprint branch must still be CI-exercised (VERDICT r4 #7): when the real
# flask isn't installed, fall back to the vendored test shim in _vendor/.
import sys  # noqa: E402

try:  # pragma: no cover - environment probe
    import flask  # noqa: F401
except ImportError:
    sys.path.append(os.path.join(os.path.dirname(__file__), "_vendor"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
