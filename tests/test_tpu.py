"""Hardware smoke test: compiled Pallas kernels on a real TPU.

The regular suite pins JAX to 8 virtual CPU devices (conftest), so this
runs the TPU checks in a subprocess with a clean platform environment.
Opt in with ABFT_TPU_SMOKE=1 (set by `make test-tpu`); skipped otherwise
— the bench/TPU host is the intended runner, not CI CPU workers.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("ABFT_TPU_SMOKE") != "1",
                    reason="TPU smoke test (set ABFT_TPU_SMOKE=1 on a TPU host)")
def test_pallas_kernels_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "TPU SMOKE OK" in proc.stdout
