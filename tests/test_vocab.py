import numpy as np
import pytest

from lirec_tpu.data import synthetic, vocab


def test_interaction_names(synth_cfg):
    interactions, inter2idx = vocab.load_interaction_names(
        synth_cfg.paths.labeled_interactions
    )
    assert set(interactions) == {"t", "v", "m", "all"}
    assert len(interactions["all"]) == len(synthetic.RAW_INTERACTIONS)
    # global idx unique, local idx within class, class idx correct
    globals_seen = set()
    for name, (gidx, cidx, lidx) in inter2idx.items():
        assert gidx not in globals_seen
        globals_seen.add(gidx)
        cls = "tvm"[cidx]
        assert interactions[cls][lidx] == name
    assert globals_seen == set(range(len(inter2idx)))


def test_merged_interactions(synth_cfg):
    inter2mgd, mgd2idx = vocab.load_merged_interactions(
        synth_cfg.paths.merged_interactions
    )
    assert len(mgd2idx) == len(synthetic.MERGED_GROUPS)
    for raw, merged in inter2mgd.items():
        assert raw in [n for n, _ in synthetic.RAW_INTERACTIONS]
        assert merged in mgd2idx
    # merged indices are line numbers
    assert sorted(mgd2idx.values()) == list(range(len(mgd2idx)))


def test_split_and_sanity(synth_cfg):
    assert vocab.load_split(synth_cfg.paths.split, "train") == ["tt0108160"]
    assert vocab.load_split(synth_cfg.paths.split, "test") == ["tt0120338"]
    assert vocab.load_split("", "test", sanity_check=True) == ["tt0120338"]
    assert vocab.load_split("", "train", sanity_check=True) == ["tt0108160"]


def test_relships(synth_cfg):
    to15, opp = vocab.load_relships(
        synth_cfg.paths.relships2_15, synth_cfg.paths.relships_opp
    )
    assert to15["good friend"] == "friend"
    assert opp["parent"] == "child" and opp["child"] == "parent"
    for cls in to15.values():
        assert cls in opp


def test_iou_maps(synth_cfg):
    any_map = vocab.load_iou2_any(synth_cfg.paths.intersected)
    assert any_map
    clip_maps = vocab.load_iou2_clips(synth_cfg.paths.intersected)
    assert all(isinstance(k[1], int) for k in clip_maps)
    movie_maps = vocab.load_iou2_movies(synth_cfg.paths.intersected)
    assert "tt0108160" in movie_maps


def test_interidx_to_mgdidx(synth_cfg):
    interactions, inter2idx = vocab.load_interaction_names(
        synth_cfg.paths.labeled_interactions
    )
    inter2mgd, mgd2idx = vocab.load_merged_interactions(
        synth_cfg.paths.merged_interactions
    )
    arr = vocab.build_interidx_to_mgdidx(inter2idx, inter2mgd, mgd2idx, "all")
    for name, (gidx, _, _) in inter2idx.items():
        assert arr[gidx] == mgd2idx[inter2mgd[name]]


def test_orig_resolutions(synth_cfg):
    res = vocab.load_orig_resolutions(synth_cfg.paths.orig_res)
    assert res["tt0108160"] == [240, 320]
