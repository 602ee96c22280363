"""Opt-in real-hardware lane: `pytest -m tpu`.

These tests spawn subprocesses WITHOUT the suite's forced-CPU env so the
box's default platform (the tunneled TPU via the axon sitecustomize)
serves them; they skip cleanly when no TPU backend comes up. Default test
runs deselect this module entirely (tests/conftest.py).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(script: str, timeout: int = 1800):
    # generous: fresh compiles through the tunnel run 30-60s EACH and the
    # shared chip drifts; a 900s budget flaked when caches were cold
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)  # let the box's TPU platform win
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", script)],
        env=env, cwd=REPO, capture_output=True, timeout=timeout,
    )
    if proc.returncode == 3:
        pytest.skip("no TPU backend: %s" % proc.stdout.decode().strip())
    assert proc.returncode == 0, (
        "%s failed:\n%s\n%s"
        % (script, proc.stdout.decode(), proc.stderr.decode())
    )
    return proc.stdout.decode()


def test_pallas_kernels_real_dims_on_chip():
    out = _run_on_tpu("tpu_kernel_check.py")
    assert "fused_ctx_pool ok" in out
    assert "gather_masked_sum ok" in out


def test_train_step_optimizes_on_chip():
    out = _run_on_tpu("tpu_train_check.py")
    assert "tpu train ok" in out
