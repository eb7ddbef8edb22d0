"""Persistent-compilation-cache setup (acai_omr_tpu/__init__.py).

Importing the package must point JAX's persistent compilation cache at a
writable directory (cross-process compile reuse — remote axon compiles take
minutes for the big programs), and ``ACAI_JAX_CACHE=0`` must leave the JAX
config untouched. Run in subprocesses so this test doesn't depend on (or
mutate) the suite's own JAX config.
"""

import os
import subprocess
import sys

_PROBE = (
    "import jax, acai_omr_tpu;"
    "print(jax.config.jax_compilation_cache_dir or '')"
)


def _run(env_overrides):
    env = dict(os.environ)
    # An ambient cache config would leak into the probe and mask the behavior
    # under test (ADVICE r1).
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.pop("ACAI_JAX_CACHE_DIR", None)
    env.pop("ACAI_JAX_CACHE", None)
    env.update(env_overrides)
    out = subprocess.run([sys.executable, "-c", _PROBE], check=True,
                         capture_output=True, text=True, env=env)
    return out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""


def test_cache_enabled_by_default(tmp_path):
    d = str(tmp_path / "jc")
    assert _run({"ACAI_JAX_CACHE_DIR": d}) == d


def test_cache_opt_out():
    assert _run({"ACAI_JAX_CACHE": "0"}) == ""


def test_native_jax_env_var_wins(tmp_path):
    # JAX's own JAX_COMPILATION_CACHE_DIR must not be clobbered by our default.
    d = str(tmp_path / "native")
    assert _run({"JAX_COMPILATION_CACHE_DIR": d}) == d
