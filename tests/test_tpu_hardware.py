"""Opt-in hardware tests: compiled Mosaic kernels on the real chip.

The regular suite pins JAX to a virtual CPU mesh (conftest.py) and runs
the Pallas kernels in interpret mode; this file re-runs the same parity
checks with the COMPILED kernels on the live accelerator.  Gated behind
``SAT_TPU_TESTS=1`` because the first run pays a multi-minute Mosaic
compile and needs the (shared) device:

    SAT_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SAT_TPU_TESTS"),
    reason="hardware test; set SAT_TPU_TESTS=1 (needs a live TPU)",
)


def test_onchip_kernel_parity():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "--xla_force_host_platform_device_count" not in f)
    script = os.path.join(os.path.dirname(__file__), "onchip_check.py")
    res = subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True,
        timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "ONCHIP OK" in res.stdout
