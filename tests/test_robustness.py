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


def test_prefetch_to_device_preserves_batches(synth_root):
    import jax

    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset, first_choice
    from lirec_tpu.data.pipeline import BatchIterator, prefetch_to_device

    base = synthetic.make_config(synth_root)
    cfg = (
        config_lib.preset("int_ch", data_root=synth_root)
        .replace(dims=base.dims, paths=base.paths)
    )
    ds = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
    ds.cache()
    plain = list(BatchIterator(ds, 8))
    pre = list(prefetch_to_device(BatchIterator(ds, 8)))
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        assert set(a) == set(b)
        np.testing.assert_array_equal(
            np.asarray(a["feat_idx"]), np.asarray(b["feat_idx"])
        )
    # empty iterator -> empty generator, no crash
    assert list(prefetch_to_device(iter([]))) == []


def test_meters_and_logger(tmp_path):
    import json

    from lirec_tpu.utils.meters import Averaging, MetricsLogger, stack_join

    m = Averaging()
    m.update(2.0, n=2)
    m.update(4.0)
    assert m.avg == pytest.approx(8.0 / 3)
    log = MetricsLogger(str(tmp_path / "m.jsonl"))
    log.log({"epoch": 0, "loss": 1.5})
    rec = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert rec["loss"] == 1.5 and "ts" in rec
    a = np.ones((2, 3))
    assert stack_join(None, a) is a
    assert stack_join(a, None) is a
    assert stack_join(a, a).shape == (4, 3)


def test_atomic_np_save(tmp_path):
    """Shared-cache writes publish atomically (multi-process warming:
    concurrent writers must never expose a torn .npy)."""
    import numpy as np

    from lirec_tpu.utils.io import atomic_np_save

    path = str(tmp_path / "row.npy")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    atomic_np_save(path, a)
    np.testing.assert_array_equal(np.load(path), a)
    # overwrite in place (a second process losing the race)
    atomic_np_save(path, a * 2)
    np.testing.assert_array_equal(np.load(path), a * 2)
    # no temp droppings
    import os
    assert os.listdir(tmp_path) == ["row.npy"]


def test_profile_flag_captures_trace(synth_root, tmp_path):
    """--profile wraps the work in a jax profiler trace (SURVEY §5.1: the
    reference had no profiler at all)."""
    import os

    from lirec_tpu.cli.common import run_entry

    prof = str(tmp_path / "trace")
    run_entry(
        "int_rel_ch",
        ["--data-root", synth_root, "--store-root", str(tmp_path / "s"),
         "--train", "--epochs", "1", "--batch-size", "8", "--quiet",
         "--profile", prof,
         "--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
         "--joint-dim", "16", "--compute-dtype", "float32"],
    )
    found = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(prof) for f in fs
    ]
    assert found, "no profiler trace files written under --profile dir"
