"""Text-only pipeline: dataset semantics + end-to-end train/eval."""

import numpy as np
import pytest

from lirec_tpu.data.text_dataset import TextOnlyDataset, preset_text_only


def _cfg(synth_root, **kw):
    cfg = preset_text_only(data_root=synth_root, **kw)
    return cfg.with_dims(text_dim=16, visual_dim=0, text_layers=4,
                         joint_dim=16).with_runtime(compute_dtype="float32")


def test_dataset_basics(synth_root):
    cfg = _cfg(synth_root)
    ds = TextOnlyDataset(cfg, mode="val")
    ds.cache()
    assert len(ds) > 0
    sample = ds[0]
    assert sample["feat_idx"].shape == (1, 3)
    dense = ds.to_dense(sample)
    assert dense["features"].shape == (1, 16)
    # pooled text row equals max over the window tokens
    inter = ds.interactions[0]
    key = (inter.video_descr["movie"], inter.video_descr["scene"][0])
    tokens = ds.readers[key].get_features_by_time(inter.time_node)
    np.testing.assert_allclose(
        dense["features"][0], tokens.max(axis=0), rtol=1e-6
    )
    # labels are LOCAL per-class indices
    assert 0 <= sample["labels"] < ds.n_classes


def test_sanity_movie(synth_root):
    cfg = _cfg(synth_root, sanity_check=True)
    ds = TextOnlyDataset(cfg, mode="train")
    assert ds.movie_idxs == ["tt1454029"]


def test_text_only_cli_train(synth_root, tmp_path):
    from lirec_tpu.cli.text_only import main

    out = main(
        ["--data-root", synth_root, "--store-root", str(tmp_path / "st"),
         "--train", "--epochs", "2", "--batch-size", "8",
         "--text-dim", "16", "--text-layers", "4", "--joint-dim", "16",
         "--quiet"]
    )
    assert len(out["train"]["losses"]) == 2
