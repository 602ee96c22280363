"""Native C++ ingest ops must match the numpy implementations exactly."""

import numpy as np
import pytest

from lirec_tpu.data.visual import roi_pool_tracks as np_roi
from lirec_tpu.native import bindings as native


@pytest.fixture(scope="module", autouse=True)
def _built():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")


def _track(rng, n, res, fps=16, dur=12):
    return [
        {
            "x": float(rng.uniform(0, res[1])),
            "y": float(rng.uniform(0, res[0])),
            "w": float(rng.uniform(10, 60)),
            "h": float(rng.uniform(10, 60)),
            "frame": int(rng.integers(0, dur * fps)),
            "timestamp": 0.0,
        }
        for _ in range(n)
    ]


def test_roi_pool_matches_numpy():
    rng = np.random.default_rng(0)
    C, H, W = 32, 3, 4
    feats = rng.standard_normal((13, C, H, W)).astype(np.float32)
    res = [240, 320]
    track = _track(rng, 9, res)
    a = np_roi(feats, track, res, 0.0625, C)
    b = native.roi_pool_tracks(feats, track, res, 0.0625, C)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_roi_pool_out_of_range_frame():
    rng = np.random.default_rng(1)
    C = 8
    feats = rng.standard_normal((5, C, 3, 4)).astype(np.float32)
    res = [240, 320]
    track = [
        {"x": 10.0, "y": 10.0, "w": 30.0, "h": 30.0, "frame": 80,
         "timestamp": 0.0}
    ]  # int(80*0.0625)=5 == T -> zero row (ref visual_features.py:130-131)
    out = native.roi_pool_tracks(feats, track, res, 0.0625, C)
    np.testing.assert_array_equal(out, np.zeros((1, C), np.float32))


def test_temporal_max():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((7, 33)).astype(np.float32)
    np.testing.assert_allclose(native.temporal_max(x), x.max(axis=0))


def test_pack_rows_matches_numpy():
    rng = np.random.default_rng(3)
    text = rng.standard_normal((10, 16)).astype(np.float32)
    visual = rng.standard_normal((10, 32)).astype(np.float32)
    track = rng.standard_normal((20, 32)).astype(np.float32)
    idx = np.stack(
        [
            rng.integers(0, 10, (4, 5)),
            rng.integers(0, 20, (4, 5)),
            rng.integers(0, 20, (4, 5)),
        ],
        axis=-1,
    ).astype(np.int32)
    out = native.pack_rows(text, visual, track, idx)
    manual = np.concatenate(
        [text[idx[..., 0]], visual[idx[..., 0]], track[idx[..., 1]],
         track[idx[..., 2]]],
        axis=-1,
    )
    np.testing.assert_allclose(out, manual)
