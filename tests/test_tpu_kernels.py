"""Opt-in real-chip Pallas kernel tests.

The CPU-backend suite cannot exercise Mosaic kernels (they are gated
off on cpu, `mtf.py:_use_pallas`, `bwt/driver.py:_PALLAS_DECODE`).
Set TPULC_TEST_TPU=1 with a TPU attached to run the kernel-vs-XLA-twin
checks; the script is also directly runnable:

    TPULC_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
    python tests/tpu_kernels_check.py          # one-command form
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    not os.environ.get("TPULC_TEST_TPU"),
    reason="set TPULC_TEST_TPU=1 with a TPU attached",
)
def test_pallas_kernels_match_xla_twins_on_tpu():
    # subprocess: this suite's conftest pins the CPU backend; the check
    # needs the real TPU platform selection from the environment.
    here = os.path.dirname(os.path.abspath(__file__))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, os.path.join(here, "tpu_kernels_check.py")],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "TPU-KERNELS-OK" in r.stdout or "SKIP" in r.stdout, r.stdout
