"""Serialized ingest artifact: cold eval start without re-mining
(SURVEY.md §7.2 — emitted fixed-shape records instead of the reference's
lazy per-row .npy memoization, ref classification_dataloader.py:139-186)."""

import numpy as np
import pytest

DIM_ARGS = [
    "--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
    "--joint-dim", "16", "--compute-dtype", "float32",
]
INGEST_DIMS = ["--text-dim", "16", "--visual-dim", "32",
               "--text-layers", "4", "--joint-dim", "16"]


def test_ingest_artifact_roundtrip_metrics(synth_root, tmp_path):
    """Eval through a loaded artifact must produce the byte-identical
    metric dict of a fresh ingest (which also writes the artifact)."""
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / "store")
    art = str(tmp_path / "ingest.npz")
    run_entry(
        "int_rel_ch",
        ["--data-root", synth_root, "--store-root", store, "--train",
         "--epochs", "1", "--batch-size", "8", "--quiet"] + DIM_ARGS,
    )
    resume = ["--data-root", synth_root, "--store-root", store,
              "--resume-path", store + "/0.ckpt", "--batch-size", "8",
              "--quiet", "--ingest-cache", art] + DIM_ARGS
    fresh = run_entry("int_rel_ch", resume)   # ingests + writes artifact
    import os
    assert os.path.exists(art)
    cached = run_entry("int_rel_ch", resume)  # loads artifact, no mining
    for split in ("val", "test"):
        assert fresh[split] == cached[split], split
    # the host eval loop drives PackedSplit through BatchIterator's
    # materialized fast path — same metrics again
    hosted = run_entry("int_rel_ch", resume + ["--host-eval"])
    for split in ("val", "test"):
        for key, val in fresh[split].items():
            np.testing.assert_allclose(
                hosted[split][key], val, rtol=1e-5, atol=1e-6,
                err_msg="%s/%s" % (split, key),
            )


def test_ingest_cli_command_matches_live_datasets(synth_root, tmp_path):
    """`lirec-tpu ingest` output round-trips byte-identically to the live
    datasets' materialized arrays and tables."""
    from lirec_tpu import config as config_lib
    from lirec_tpu.cli import ingest
    from lirec_tpu.cli.common import build_datasets
    from lirec_tpu.data.artifact import load_ingest

    art = str(tmp_path / "ingest_cmd.npz")
    ingest.main(["--data-root", synth_root, "--preset", "int_rel_ch",
                 "--out", art] + INGEST_DIMS)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root).with_dims(
        text_dim=16, visual_dim=32, text_layers=4, joint_dim=16
    )
    splits = load_ingest(art, cfg)
    live = dict(zip(("train", "val", "test"),
                    build_datasets(cfg, "int_rel_ch")))
    for role, ds in live.items():
        packed = splits[role]
        assert packed.n_classes == ds.n_classes
        assert packed.n_rels == ds.n_rels
        assert packed.rels_list == list(ds.rels_list)
        assert len(packed.hashidx_rels) == len(
            getattr(ds, "hashidx_rels", ()) or ()
        )
        a, b = packed.materialize(), ds.materialize()
        assert set(a) == set(b)
        for key in a:
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)
        ta, tb = packed.tables.as_dict(), ds.tables.as_dict()
        for key in ta:
            np.testing.assert_array_equal(ta[key], tb[key], err_msg=key)


def test_ingest_artifact_rejects_mismatched_config(synth_root, tmp_path):
    from lirec_tpu import config as config_lib
    from lirec_tpu.cli import ingest
    from lirec_tpu.data.artifact import load_ingest

    art = str(tmp_path / "ingest_fp.npz")
    ingest.main(["--data-root", synth_root, "--preset", "modalities",
                 "--out", art] + INGEST_DIMS)
    other = config_lib.preset("modalities", data_root=synth_root).with_dims(
        text_dim=32, visual_dim=32, text_layers=4, joint_dim=16
    )
    with pytest.raises(ValueError, match="different config"):
        load_ingest(art, other)


def test_ingest_cache_refused_for_training(synth_root, tmp_path):
    from lirec_tpu.cli.common import run_entry

    with pytest.raises(SystemExit, match="eval"):
        run_entry(
            "int_rel_ch",
            ["--data-root", synth_root, "--train", "--quiet",
             "--ingest-cache", str(tmp_path / "x.npz")] + DIM_ARGS,
        )
