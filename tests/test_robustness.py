"""Determinism + crash-resilience guarantees (the aux subsystems the
reference approximates with global seeding only, SURVEY.md §5.2-5.3)."""

import os.path as ops

import numpy as np
import pytest


DIMS = ["--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
        "--joint-dim", "16", "--compute-dtype", "float32",
        "--batch-size", "8", "--quiet"]


def test_training_is_deterministic(synth_root, tmp_path):
    from lirec_tpu.cli.common import run_entry

    losses = []
    for run in range(2):
        out = run_entry(
            "int_ch",
            ["--data-root", synth_root,
             "--store-root", str(tmp_path / ("s%d" % run)),
             "--train", "--epochs", "2"] + DIMS,
        )
        losses.append(out["train"]["losses"])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_auto_resume_from_latest(synth_root, tmp_path):
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / "store")
    run_entry(
        "int_ch",
        ["--data-root", synth_root, "--store-root", store, "--train",
         "--epochs", "2", "--checkpoint-every", "1"] + DIMS,
    )
    assert ops.exists(ops.join(store, "latest.ckpt"))
    out = run_entry(
        "int_ch",
        ["--data-root", synth_root, "--store-root", store, "--train",
         "--auto-resume", "--epochs", "4"] + DIMS,
    )
    assert len(out["train"]["losses"]) == 2  # epochs 2..3 only


def test_step_timer_and_trace_noop():
    from lirec_tpu.utils.profiling import StepTimer, trace

    timer = StepTimer()
    with timer.span("a"):
        pass
    with timer.span("a"):
        pass
    summary = timer.summary()
    assert summary["a"]["count"] == 2
    with trace(None):  # no-op path
        pass
