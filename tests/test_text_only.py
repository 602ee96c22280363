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


def test_html_debug_mode(synth_root):
    """html=True: samples carry dialog/fname meta + idx2inter reverse map
    (ref text_utils/classification_dataloader.py:18-25,59-70; the
    reference's own html path is broken — see data/text.py docstring)."""
    from lirec_tpu.data.text_dataset import TextOnlyDataset, preset_text_only

    cfg = preset_text_only(data_root=synth_root)
    from lirec_tpu.data import synthetic

    base = synthetic.make_config(synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths)
    ds = TextOnlyDataset(cfg, mode="val", html=True)
    ds.cache()
    assert ds.idx2inter  # reverse label map (ref :21)
    sample = ds[0]
    meta = sample["meta"]
    assert set(meta) == {"dialog", "fname"}
    assert "_" in meta["fname"]
    # the reverse map round-trips the sample's local label
    inter = ds.interactions[0]
    cls_letter = "tvm"[ds.inter2idx[inter.inter_node["name"]][1]]
    assert ds.idx2inter[(cls_letter, sample["labels"])] == (
        inter.inter_node["name"]
    )
