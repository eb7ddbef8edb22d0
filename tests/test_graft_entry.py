"""Driver-contract test for __graft_entry__.dryrun_multichip.

Round-1 failure mode (VERDICT.md "What's missing" #1): the driver imports the
module and calls ``dryrun_multichip(n_devices=8)`` in-process, where jax has
already initialized on ONE device — the virtual-mesh bootstrap only lived
under ``__main__``, so the 4x2 mesh reshape crashed. This test reproduces the
driver's call exactly: a fresh process pinned to a single CPU device imports
the module and calls the function; it must self-bootstrap and exit 0 printing
the ok line.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    env = dict(os.environ)
    # Simulate the driver's world: jax initializes with a single device before
    # dryrun_multichip is called (here: 1 virtual CPU device instead of the
    # 1 axon TPU chip — same failure shape).
    flags = re.sub(r"--xla_force_host_platform_device_count=\S+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()
    env.pop("ACAI_DRYRUN_MULTICHIP_CHILD", None)
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + ":" + REPO).lstrip(":")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout
    assert "4 data x 2 model" in proc.stdout, proc.stdout
