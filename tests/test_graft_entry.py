"""Driver-gate regression: dryrun_multichip must not depend on env pins.

Round 1's multichip gate failed because the dryrun dispatched ops to the
process-default backend, which on the bench host was a broken TPU runtime
(libtpu version mismatch). The dryrun must run end-to-end on the CPU backend
with no JAX_PLATFORMS pin — exactly how the driver invokes it — so this test
launches it in a subprocess with only the driver's XLA_FLAGS set.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_without_cpu_pin():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "8 devices OK" in proc.stdout
