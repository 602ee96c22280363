"""Device-side metric reductions.

The grounding metrics only need a handful of per-sample argmaxes/maxima of
the (sigmoided, masked) logits; computing them inside the eval jit and
shipping back a few int/bool vectors replaces the 3.5 ms/batch host numpy
pass with ~0.1 ms of counting. `MetricAccumulator.update_from_predictions`
consumes the result with counting semantics identical to
`update_probs_max_tracks[_rels]` (equivalence is tested against them, which
are themselves golden-tested against the reference).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.ops.select import select_along_axis

__all__ = ["grounding_predictions"]


def grounding_predictions(
    pr_probs_cl: jnp.ndarray,
    mask: jnp.ndarray,
    gt_classes: jnp.ndarray,
    pr_probs_rels: Optional[jnp.ndarray] = None,
    gt_rels: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-sample predictions for the grounding metrics.

    pr_probs_cl: [B, T, C] logits; mask: [B, T]; gt_classes: [B];
    pr_probs_rels: [B, T, R] logits or None; gt_rels: [B, T] or None.
    Returns small per-sample vectors (argmaxes over masked sigmoids).
    """
    B, T, C = pr_probs_cl.shape
    valid = mask[:, :, None] > 0
    cl = jnp.where(valid, pr_probs_cl.astype(jnp.float32), -jnp.inf)
    s_cl = jax.nn.sigmoid(cl)

    out: Dict[str, jnp.ndarray] = {}
    # class argmax per hypothesis row (for the GT-slot lookups)
    out["cls_argmax"] = jnp.argmax(s_cl, axis=2)  # [B, T]

    if pr_probs_rels is None:
        col = select_along_axis(
            s_cl, gt_classes[:, None].astype(jnp.int32), axis=2
        )
        out["pr_track"] = jnp.argmax(col, axis=1)
        max_c = s_cl.max(axis=2)
        out["t_star"] = jnp.argmax(max_c, axis=1)
        out["c_star"] = jnp.argmax(
            select_along_axis(s_cl, out["t_star"][:, None], axis=1), axis=1
        )
        return out

    rl = jnp.where(valid, pr_probs_rels.astype(jnp.float32), -jnp.inf)
    s_rl = jax.nn.sigmoid(rl)
    # 'None' column appended after the sigmoid (score 0, ref evaluation.py:220)
    s_rlp = jnp.concatenate(
        [s_rl, jnp.zeros((B, T, 1), s_rl.dtype)], axis=2
    )
    out["rels_argmax"] = jnp.argmax(rl, axis=2)  # [B, T] over R (no pad)

    rel0 = gt_rels[:, 0].astype(jnp.int32)
    col = select_along_axis(
        s_cl, gt_classes[:, None].astype(jnp.int32), axis=2
    ) + select_along_axis(s_rlp, rel0[:, None], axis=2)
    out["pr_track"] = jnp.argmax(col, axis=1)
    # separable joint argmax (see evaluation/metrics.py)
    max_c = s_cl.max(axis=2)
    max_r = s_rlp.max(axis=2)
    out["t_star"] = jnp.argmax(max_c + max_r, axis=1)
    t_row = out["t_star"][:, None]
    out["c_star"] = jnp.argmax(select_along_axis(s_cl, t_row, axis=1), axis=1)
    out["r_star"] = jnp.argmax(select_along_axis(s_rlp, t_row, axis=1), axis=1)
    return out
