"""ctypes bindings for the native ingest library, with lazy build and
graceful numpy fallback (callers check `available()`)."""

from __future__ import annotations

import ctypes
import os
from typing import List

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LIREC_TPU_NO_NATIVE"):
        return None
    try:
        from lirec_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        i64, f32 = ctypes.c_int64, ctypes.c_float
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.roi_pool_tracks.argtypes = [
            fp, i64, i64, i64, i64, fp, i64, f32, f32, f32, fp,
        ]
        lib.temporal_max.argtypes = [fp, i64, i64, fp]
        lib.pack_rows.argtypes = [fp, i64, fp, i64, fp, i64, ip, i64, fp]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def roi_pool_tracks(
    features: np.ndarray,
    track: List[dict],
    resolution: List[int],
    sampling_fr: float,
    visual_dim: int,
) -> np.ndarray:
    """Drop-in for data.visual.roi_pool_tracks (same semantics)."""
    lib = _load()
    feats = np.ascontiguousarray(features, dtype=np.float32)
    elems = np.array(
        [[e["x"], e["y"], e["w"], e["h"], e["frame"]] for e in track],
        dtype=np.float32,
    ).reshape(-1, 5)
    out = np.zeros((len(track), visual_dim), dtype=np.float32)
    if len(track) == 0:
        return out
    T, C, H, W = feats.shape
    lib.roi_pool_tracks(
        feats, T, C, H, W,
        np.ascontiguousarray(elems), len(track),
        float(resolution[0]), float(resolution[1]), float(sampling_fr),
        out,
    )
    return out


def temporal_max(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape[1], dtype=np.float32)
    lib.temporal_max(x, x.shape[0], x.shape[1], out)
    return out


def pack_rows(
    text: np.ndarray,
    visual: np.ndarray,
    track: np.ndarray,
    idx: np.ndarray,
) -> np.ndarray:
    lib = _load()
    text = np.ascontiguousarray(text, dtype=np.float32)
    visual = np.ascontiguousarray(visual, dtype=np.float32)
    track = np.ascontiguousarray(track, dtype=np.float32)
    flat_idx = np.ascontiguousarray(idx.reshape(-1, 3), dtype=np.int32)
    n = flat_idx.shape[0]
    row_dim = text.shape[1] + visual.shape[1] + 2 * track.shape[1]
    out = np.empty((n, row_dim), dtype=np.float32)
    lib.pack_rows(
        text, text.shape[1], visual, visual.shape[1], track, track.shape[1],
        flat_idx, n, out,
    )
    return out.reshape(idx.shape[:-1] + (row_dim,))
