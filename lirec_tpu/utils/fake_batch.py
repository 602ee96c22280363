"""In-memory fake packed batches/tables (no disk), for compile checks,
sharding dry runs, and benchmarks."""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["make_tables", "make_batch"]


def make_tables(
    spec, n_clips: int, n_tracks: int, seed: int = 0, dtype=np.float32
) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    return {
        "text": rng.standard_normal((n_clips, spec.text_dim)).astype(dtype),
        "visual": rng.standard_normal((n_clips, spec.visual_dim)).astype(dtype),
        "track": rng.standard_normal((n_tracks, spec.track_dim)).astype(dtype),
    }


def make_batch(
    spec,
    batch_size: int,
    n_clips: int,
    n_tracks: int,
    rels_n_clips: int = 18,
    n_hypotheses: int = 20,
    seed: int = 1,
) -> Dict[str, np.ndarray]:
    """A packed batch with the full int_rel_ch key set and plausible masks."""
    rng = np.random.default_rng(seed)
    B, T, R = batch_size, n_hypotheses, rels_n_clips
    C, NR = spec.n_classes, spec.n_rels
    feat_idx = np.stack(
        [
            rng.integers(0, n_clips, (B, T, R + 1)),
            rng.integers(0, n_tracks, (B, T, R + 1)),
            rng.integers(0, n_tracks, (B, T, R + 1)),
        ],
        axis=-1,
    ).astype(np.int32)
    mem_mask = np.zeros((B, T), np.float32)
    for i in range(B):
        mem_mask[i, : rng.integers(3, T + 1)] = 1
    rels_mask = (rng.random((B, T, R)) < 0.4).astype(np.int32)
    rels_mask[:, :, 0] = 1
    gt_tracks = np.zeros((B, 2), np.int32)
    second = rng.random(B) < 0.4
    gt_tracks[second, 1] = rng.integers(1, 6, int(second.sum()))
    return {
        "feat_idx": feat_idx,
        "mem_mask": mem_mask,
        "rels_mask": rels_mask,
        "labels": rng.integers(0, C, B).astype(np.int32),
        "rels_label": rng.integers(0, NR + 1, (B, T)).astype(np.int32),
        "gt_tracks": gt_tracks,
        "just_zeros": (rng.random(B) < 0.1),
        "hash_rel": rng.integers(-1, 50, B).astype(np.int32),
        "multilab_weights": (rng.random((B, C)) < 0.95).astype(np.float32),
    }
