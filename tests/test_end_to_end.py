"""End-to-end smoke: CLI entry points train + evaluate on synthetic data
through the public surface (the reference's sanity_check-equivalent,
SURVEY.md §4)."""

import numpy as np
import pytest

DIM_ARGS = [
    "--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
    "--joint-dim", "16", "--compute-dtype", "float32",
]


def test_train_then_eval_int_rel_ch(synth_root, tmp_path):
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / "store")
    out = run_entry(
        "int_rel_ch",
        ["--data-root", synth_root, "--store-root", store, "--train",
         "--epochs", "3", "--batch-size", "8", "--quiet",
         # the reference lr (3e-5) moves the loss less than the per-epoch
         # context-resampling noise on tiny data — train hot so the
         # decrease assertion reflects optimization, not mask-stream luck
         "--lr", "1e-3"] + DIM_ARGS,
    )
    losses = out["train"]["losses"]
    assert len(losses) == 3
    assert losses[-1] < losses[0], "loss should decrease on tiny data"

    out_eval = run_entry(
        "int_rel_ch",
        ["--data-root", synth_root, "--store-root", store,
         "--resume-path", store + "/2.ckpt", "--batch-size", "8",
         "--quiet"] + DIM_ARGS,
    )
    for split in ("val", "test"):
        m = out_eval[split]
        for key in ("total", "ints", "rels", "tracks", "joint", "loss"):
            assert key in m
        assert np.isfinite(m["loss"])


def test_training_cadence_packed_eval_matches_host(synth_root, tmp_path):
    """The training-time eval cadence (every test_fr epochs) through the
    packed device sweep must record the same saver metrics as the host
    loop (ref mlp/train.py:75-91 is on the training critical path)."""
    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train.loop import train

    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    ).with_optim(batch_size=8, epochs=3, save_model=False)

    def build():
        datasets = {}
        for mode in ("train", "val", "test"):
            ds = InteractionDataset(cfg, mode=mode)
            if mode != "train":
                ds.n_classes = datasets["train"].n_classes
            ds.cache()
            ds.init_relships()
            datasets[mode] = ds
        bundle = create_model(
            cfg, datasets["train"].n_classes,
            n_rels=max(len(datasets["train"].rels_list) - 1, 0),
        )
        return datasets, bundle

    results = {}
    for host_eval in (True, False):
        datasets, bundle = build()
        out = train(
            cfg, bundle, datasets["train"], val_dataset=datasets["val"],
            test_dataset=datasets["test"], verbose=False,
            host_eval=host_eval,
        )
        results[host_eval] = out
    host, packed = results[True], results[False]
    assert dict(host["saver"].eval), "cadence never evaluated"
    assert dict(host["saver"].eval) == dict(packed["saver"].eval)
    np.testing.assert_allclose(host["losses"], packed["losses"], rtol=1e-6)


def test_modalities_train_smoke(synth_root, tmp_path):
    from lirec_tpu.cli.common import run_entry

    out = run_entry(
        "modalities",
        ["--data-root", synth_root, "--store-root", str(tmp_path / "s2"),
         "--train", "--epochs", "2", "--batch-size", "8", "--quiet"]
        + DIM_ARGS,
    )
    assert len(out["train"]["losses"]) == 2


def test_int_rels_train_smoke(synth_root, tmp_path):
    """MidFusionMultiClip training (the remaining untrained preset)."""
    from lirec_tpu.cli.common import run_entry

    out = run_entry(
        "int_rels",
        ["--data-root", synth_root, "--store-root", str(tmp_path / "s3"),
         "--train", "--epochs", "2", "--batch-size", "8", "--quiet"]
        + DIM_ARGS,
    )
    losses = out["train"]["losses"]
    assert len(losses) == 2 and np.isfinite(losses).all()


@pytest.mark.parametrize("preset", ["modalities", "int_rels"])
def test_eval_resume_remaining_presets(synth_root, tmp_path, preset):
    """Train -> checkpoint -> eval-resume through the CLI for the presets
    not already covered by the other e2e tests."""
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / ("st_" + preset))
    run_entry(
        preset,
        ["--data-root", synth_root, "--store-root", store, "--train",
         "--epochs", "1", "--batch-size", "8", "--quiet"] + DIM_ARGS,
    )
    out = run_entry(
        preset,
        ["--data-root", synth_root, "--store-root", store,
         "--resume-path", store + "/0.ckpt", "--batch-size", "8",
         "--quiet"] + DIM_ARGS,
    )
    for split in ("val", "test"):
        assert np.isfinite(out[split]["loss"])
        assert 0 <= out[split]["ints"] <= 1
