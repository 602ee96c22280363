import numpy as np
import pytest

from lirec_tpu.data import synthetic, text, visual, vocab
from lirec_tpu.data.mixed import MixedFeatureReader


def _first_scene(cfg, movie="tt0108160", scene=2):
    fname = "scene-%03d.ss-0000.es-%04d.mp4" % (scene, 12)
    return movie, scene, fname


def make_visual(cfg, movie="tt0108160", scene=2):
    movie, scene, fname = _first_scene(cfg, movie, scene)
    res = vocab.load_orig_resolutions(cfg.paths.orig_res)[movie]
    return visual.VisualFeatureReader(
        movie,
        scene,
        fname,
        visual_dir=cfg.paths.visual_features,
        frame2time_dir=cfg.paths.frame2time,
        visual_dim=cfg.dims.visual_dim,
        sampling_fr=cfg.runtime.sampling_fr,
        resolution=res,
    )


def test_visual_time_window(synth_cfg):
    reader = make_visual(synth_cfg)
    full = reader.get_features_by_time(None)
    assert full.ndim == 2 and full.shape[1] == synth_cfg.dims.visual_dim
    # spatial mean pooling matches a manual computation
    raw = reader._load()
    manual = raw.reshape(raw.shape[0], raw.shape[1], -1).mean(axis=2)
    np.testing.assert_allclose(full, manual, rtol=1e-6)

    window = reader.get_features_by_time({"start": 2, "end": 6})
    # with sampling_fr=0.0625 and 16 fps, frames scale to ~seconds
    start = int(reader.time2frame[2][0] * 0.0625)
    end = int(reader.time2frame[6][-1] * 0.0625)
    np.testing.assert_allclose(window, manual[start : end + 1], rtol=1e-6)


def test_visual_window_clamps_at_end(synth_cfg):
    reader = make_visual(synth_cfg)
    pooled = reader.get_features_by_time({"start": 0, "end": 12})
    assert pooled.shape[0] <= reader._load().shape[0]


def test_roi_pooling_matches_manual(synth_cfg):
    reader = make_visual(synth_cfg)
    track = [
        {"x": 100.0, "y": 50.0, "w": 40.0, "h": 40.0, "frame": 32, "timestamp": 2.0}
    ]
    out = reader.get_features_by_track(track)
    assert out.shape == (1, synth_cfg.dims.visual_dim)
    # manual: face bbox -> person bbox -> grid -> mean
    feats = reader._load()
    hgrid, wgrid = feats.shape[2], feats.shape[3]
    sh, sw = hgrid / 240, wgrid / 320
    fx, fy, fw, fh = 50.0, 25.0, 20.0, 20.0
    pw, ph = fw / 0.30, fh / 0.15
    px, py = fx - 0.35 * pw, fy - 0.10 * ph
    x0 = max(0, int(np.floor(px * sw)))
    x1 = min(wgrid, int(np.ceil((px + pw) * sw)))
    y0 = max(0, int(np.floor(py * sh)))
    y1 = min(hgrid, int(np.ceil((py + ph) * sh)))
    frame_idx = int(32 * 0.0625)
    manual = feats[frame_idx][:, y0:y1, x0:x1].reshape(
        synth_cfg.dims.visual_dim, -1
    ).mean(axis=1)
    np.testing.assert_allclose(out[0], manual, rtol=1e-5)


def test_roi_pooling_out_of_range_frame(synth_cfg):
    reader = make_visual(synth_cfg)
    n_feat = reader._load().shape[0]
    track = [
        {
            "x": 10.0,
            "y": 10.0,
            "w": 30.0,
            "h": 30.0,
            "frame": int(n_feat / 0.0625),
            "timestamp": 11.0,
        }
    ]
    out = reader.get_features_by_track(track)
    # frame beyond features -> row stays zero (ref visual_features.py:130-131)
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_webvtt_parsing():
    vtt = (
        "WEBVTT\n\n"
        "00:00:01.000 --> 00:00:03.000\nHello there...\n\n"
        "00:00:04.000 --> 00:00:06.000\ncontinued line\n\n"
        "00:00:08.000 --> 00:00:09.500\n- Hi.\n- Hello.\n"
    )
    times = text.parse_webvtt_times(vtt)
    # the `...` block merges with the next timestamp range
    assert [(t.start, t.end) for t in times] == [(1, 6), (8, 9)]
    blocks = list(text.split_dialog_blocks(vtt))
    cleaned = [text.clean_dialog_block(b) for b in blocks if b != [""]]
    assert any("[CLS]" in " ".join(c) for c in cleaned if c)


def test_contextualization_modes():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((5, 4, 8))
    np.testing.assert_array_equal(
        text.contextualize(raw, "second-to-last", 8), raw[:, -2, :]
    )
    np.testing.assert_array_equal(text.contextualize(raw, "last", 8), raw[:, -1, :])
    np.testing.assert_allclose(
        text.contextualize(raw, "sum-all", 8), raw.sum(axis=1)
    )
    np.testing.assert_allclose(
        text.contextualize(raw, "sum-last-4", 8), raw[:, -4:, :].sum(axis=1)
    )
    assert text.contextualize(raw, "cat-last-4", 8).shape == (5, 32)


def test_text_reader(synth_cfg):
    movie, scene, fname = _first_scene(synth_cfg)
    reader = text.TextFeatureReader(
        movie,
        scene,
        fname,
        text_dir=synth_cfg.paths.text_features,
        dialogs_dir=synth_cfg.paths.dialogs,
        text_dim=synth_cfg.dims.text_dim,
        text_layers=synth_cfg.dims.text_layers,
        cache_to_disk=False,
    )
    full = reader.get_features_by_time(None)
    assert full.shape[1] == synth_cfg.dims.text_dim
    window = reader.get_features_by_time({"start": 0, "end": 4})
    assert window.shape[0] >= 1
    # a window with no dialog -> zero row
    nothing = reader.get_features_by_time({"start": 500, "end": 600})
    np.testing.assert_array_equal(nothing, np.zeros((1, synth_cfg.dims.text_dim)))


def test_mixed_rows(synth_cfg):
    movie, scene, fname = _first_scene(synth_cfg)
    res = vocab.load_orig_resolutions(synth_cfg.paths.orig_res)[movie]
    mixed = MixedFeatureReader(
        movie, scene, fname, cfg=synth_cfg, resolution=res
    )
    row = mixed.get_features_by_time({"start": 1, "end": 5}, idx=0)
    d = synth_cfg.dims
    assert row.shape == (1, d.text_dim + d.visual_dim)
    # layout is [text | visual]
    txt = mixed.textual.get_features_by_time({"start": 1, "end": 5})
    np.testing.assert_allclose(row[0, : d.text_dim], np.max(txt, axis=0), rtol=1e-6)
    # memoized by idx
    assert mixed.get_features_by_time(None, idx=0) is row

    empty_track = mixed.get_features_by_track([], idx=("x", 1))
    np.testing.assert_array_equal(empty_track, np.zeros((1, d.track_dim)))

    track = [
        {"x": 30.0, "y": 30.0, "w": 30.0, "h": 30.0, "frame": 16, "timestamp": 1.0}
    ]
    trow = mixed.get_features_by_track(track, idx=("y", 2))
    assert trow.shape == (1, d.track_dim)

    mat = mixed.create_pair_context_mat([(0, ("x", 1), ("y", 2))])
    assert mat.shape == (1, d.mlp_dim)
    np.testing.assert_allclose(mat[0, : d.text_dim + d.visual_dim], row[0])
    np.testing.assert_allclose(mat[0, -d.track_dim :], trow[0])
    assert mixed.create_pair_context_mat([]) is None

    mixed.free()
    assert mixed.visual.features is None
