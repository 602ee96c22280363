"""Multi-task losses (ref `mlp/model.py:357-575`), as pure jit-able functions.

Rewrites relative to the reference:
- in-place ``x[~mask] = -inf`` becomes ``jnp.where`` (ref :460,512,524);
- dynamic boolean subsetting (``x[rel_mask]``) becomes masked sums with
  ``sum/max(count,1)`` means — identical values, static shapes;
- ``torch.multinomial`` sampling becomes ``jax.random.categorical`` with an
  explicit key (ref :470-471, 543).

All losses take ``outputs`` (model dict) and ``batch`` (collated arrays) and
return a scalar f32.

An optional ``batch['loss_weight']`` ([B] float, 0/1) excludes padded rows
from every per-sample mean — the train loop pads the ragged leftover batch
to the full batch size under a device mesh so one compiled shape serves
every step; a weight of 1 for all rows is exactly the unweighted mean.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.ops.select import select_along_axis

__all__ = [
    "max_margin_ce_loss",
    "multitask_max_margin_loss",
    "multitask_ce_loss",
    "margin_loss",
    "margin_track_rels_loss",
]

NEG_INF = -jnp.inf


def _one_hot(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    return jax.nn.one_hot(idx, n, dtype=jnp.float32)


def _batch_weight(batch: Dict) -> Optional[jnp.ndarray]:
    w = batch.get("loss_weight")
    return None if w is None else jnp.asarray(w, jnp.float32).reshape(-1)


def _wmean(per_sample: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over real rows: padded rows (weight 0) drop out of both the sum
    and the divisor, so values and grads match the unpadded batch."""
    if w is None:
        return per_sample.mean()
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)


def _pair_margin(
    scores: jnp.ndarray, pos: jnp.ndarray, neg_mask: jnp.ndarray, margin: float
) -> jnp.ndarray:
    """sum_j relu(margin - pos + neg_j) over masked negatives, per sample
    (the reference's shared max-margin shape, e.g. ref :439)."""
    neg = scores * neg_mask
    flat_neg = neg.reshape(neg.shape[0], -1)
    flat_mask = neg_mask.reshape(neg.shape[0], -1)
    terms = jax.nn.relu((margin - pos)[:, None] + flat_neg) * flat_mask
    return terms.sum(axis=1)


def max_margin_ce_loss(
    outputs: Dict, batch: Dict, *, margin: float
) -> jnp.ndarray:
    """MaxMarginCrossEntropyLoss (ref mlp/model.py:422-441)."""
    logits = outputs["inters"]
    if logits.ndim == 3:  # [B, 1, C] row from single-hypothesis layouts
        logits = logits.reshape(logits.shape[0], -1)
    target = batch["labels"].reshape(-1).astype(jnp.int32)
    n_classes = logits.shape[-1]
    neg_mask = (1.0 - _one_hot(target, n_classes)) * batch[
        "multilab_weights"
    ].astype(jnp.float32)
    s = jax.nn.sigmoid(logits.astype(jnp.float32))
    pos = select_along_axis(s, target, axis=1)
    return _wmean(_pair_margin(s, pos, neg_mask, margin), _batch_weight(batch))


def multitask_max_margin_loss(
    outputs: Dict,
    batch: Dict,
    n_rels: int,
    *,
    margin: float,
    lymbda: float,
    ints: bool = True,
    ctx: bool = True,
) -> jnp.ndarray:
    """MultiTaskMaxMargin (ref mlp/model.py:381-419)."""
    loss = jnp.float32(0.0)
    bw = _batch_weight(batch)
    if ints:
        inters = outputs["inters"]
        inters = inters.reshape(inters.shape[0], -1, inters.shape[-1])[:, 0]
        target = batch["labels"][:, 0].reshape(-1).astype(jnp.int32)
        n_classes = inters.shape[-1]
        neg_mask = (1.0 - _one_hot(target, n_classes)) * batch[
            "multilab_weights"
        ].astype(jnp.float32)
        s = jax.nn.sigmoid(inters.astype(jnp.float32))
        pos = select_along_axis(s, target, axis=1)
        loss = loss + lymbda * _wmean(
            _pair_margin(s, pos, neg_mask, margin), bw
        )
    if ctx:
        target_rels = batch["rels_label"].reshape(-1).astype(jnp.int32)
        valid = (target_rels != n_rels).astype(jnp.float32)
        if bw is not None:
            valid = valid * bw
        rels = outputs["rels"].astype(jnp.float32)
        safe_target = jnp.clip(target_rels, 0, rels.shape[-1] - 1)
        neg_mask = 1.0 - _one_hot(safe_target, rels.shape[-1])
        s = jax.nn.sigmoid(rels)
        pos = select_along_axis(s, safe_target, axis=1)
        per_sample = _pair_margin(s, pos, neg_mask, margin)
        count = jnp.maximum(valid.sum(), 1.0)
        loss = loss + (per_sample * valid).sum() / count
    return loss


def multitask_ce_loss(
    outputs: Dict,
    batch: Dict,
    n_rels: int,
    *,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MultiTaskCrossEntropyLoss (ref mlp/model.py:357-378)."""
    logits = outputs["inters"].astype(jnp.float32)
    target = batch["labels"].reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -select_along_axis(logp, target, axis=1)
    bw = _batch_weight(batch)
    if weights is not None:
        w = weights[target]
        if bw is not None:
            w = w * bw
        loss = (nll * w).sum() / jnp.maximum(w.sum(), 1e-12)
    else:
        loss = _wmean(nll, bw)
    target_rels = batch["rels_label"].reshape(-1).astype(jnp.int32)
    valid = (target_rels != n_rels).astype(jnp.float32)
    if bw is not None:
        valid = valid * bw
    rels = outputs["rels"].astype(jnp.float32)
    safe_target = jnp.clip(target_rels, 0, rels.shape[-1] - 1)
    logp_r = jax.nn.log_softmax(rels, axis=-1)
    nll_r = -select_along_axis(logp_r, safe_target, axis=1)
    count = valid.sum()
    loss = loss + jnp.where(
        count > 0, (nll_r * valid).sum() / jnp.maximum(count, 1.0), 0.0
    )
    return loss


def margin_loss(
    outputs: Dict,
    batch: Dict,
    *,
    tr_margin: float,
    tr_correct: bool,
    tr_cat_distr: bool = False,
    tr_max_neg: bool = False,
    tr_sum_max_flag: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """MarginLoss — weak/GT character grounding (ref mlp/model.py:444-494)."""
    x = outputs["inters"].astype(jnp.float32)  # [B, T, C]
    B, T, C = x.shape
    target = batch["labels"].reshape(-1).astype(jnp.int32)
    mem = batch["mem_mask"].astype(jnp.float32)  # [B, T]
    valid = mem[:, :, None] > 0
    x = jnp.where(valid, x, NEG_INF)

    neg_mask = valid.astype(jnp.float32) * batch["multilab_weights"].astype(
        jnp.float32
    )[:, None, :]
    cls_oh = _one_hot(target, C)  # [B, C]
    if tr_correct:
        gt = batch["gt_tracks"].astype(jnp.int32)  # [B, 2]
        slot_oh = _one_hot(gt[:, 0], T) + _one_hot(gt[:, 1], T)
        slot_oh = jnp.minimum(slot_oh, 1.0)
        neg_mask = neg_mask * (1.0 - slot_oh[:, :, None] * cls_oh[:, None, :])
    else:
        neg_mask = neg_mask * (1.0 - cls_oh[:, None, :])

    col = select_along_axis(x, target[:, None], axis=2)  # [B, T] at GT class
    s = jax.nn.sigmoid(x)
    if tr_cat_distr:
        max_idxs = jax.random.categorical(rng, col, axis=1)
    elif tr_correct:
        max_idxs = jnp.zeros(B, jnp.int32)
    else:
        s_col = jax.nn.sigmoid(col)
        max_idxs = jnp.argmax(s_col * mem, axis=1)
    pos = select_along_axis(jax.nn.sigmoid(col), max_idxs, axis=1)

    if tr_max_neg and tr_sum_max_flag:
        neg_max = (s * neg_mask).max(axis=2)  # [B, T]
        loss = jax.nn.relu((tr_margin - pos)[:, None] + neg_max).sum(axis=1)
    else:
        loss = _pair_margin(s, pos, neg_mask, tr_margin)
    return _wmean(loss, _batch_weight(batch))


def margin_track_rels_loss(
    outputs: Dict,
    batch: Dict,
    n_rels: int,
    *,
    tr_margin: float,
    lymbda: float,
    tr_correct: bool,
    tr_cat_distr: bool = False,
    tr_max_neg: bool = False,
    tr_sum_max_flag: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """MarginTrackRelsLoss — joint grounding + relationships
    (ref mlp/model.py:497-575)."""
    ints = outputs["inters"].astype(jnp.float32)  # [B, T, C]
    rels = outputs["rels"].astype(jnp.float32)  # [B, T, R]
    B, T, C = ints.shape
    R = rels.shape[-1]
    target = batch["labels"].reshape(-1).astype(jnp.int32)
    target_rels = batch["rels_label"].astype(jnp.int32)  # [B, T]
    mem = batch["mem_mask"].astype(jnp.float32)
    gt = batch["gt_tracks"].astype(jnp.int32)

    valid = mem[:, :, None] > 0
    ints = jnp.where(valid, ints, NEG_INF)
    neg_mask_ints = valid.astype(jnp.float32)

    rel_valid = (target_rels != n_rels)[:, :, None]  # [B, T, 1]
    mask_rels = valid & rel_valid  # [B, T, 1] broadcastable over R
    # append the 'None' column: zero scores, never a negative (ref :521-522)
    rels_p = jnp.concatenate([rels, jnp.zeros((B, T, 1))], axis=-1)
    mask_rels_p = jnp.concatenate(
        [jnp.broadcast_to(mask_rels, (B, T, R)), jnp.zeros((B, T, 1), bool)],
        axis=-1,
    )
    rels_p = jnp.where(mask_rels_p, rels_p, NEG_INF)
    neg_mask_rels = mask_rels_p.astype(jnp.float32)

    neg_mask_ints = neg_mask_ints * batch["multilab_weights"].astype(
        jnp.float32
    )[:, None, :]
    cls_oh = _one_hot(target, C)
    if tr_correct:
        slot_oh = jnp.minimum(_one_hot(gt[:, 0], T) + _one_hot(gt[:, 1], T), 1.0)
        neg_mask_ints = neg_mask_ints * (
            1.0 - slot_oh[:, :, None] * cls_oh[:, None, :]
        )
        # zero each hypothesis row's own rel label (ref :531-533)
        rel_oh = _one_hot(target_rels, R + 1)  # [B, T, R+1]
        neg_mask_rels = neg_mask_rels * (1.0 - rel_oh)
    else:
        neg_mask_ints = neg_mask_ints * (1.0 - cls_oh[:, None, :])
        rel_at_gt0 = select_along_axis(target_rels, gt[:, 0], axis=1)
        rel_at_gt1 = select_along_axis(target_rels, gt[:, 1], axis=1)
        gt_rel_oh = jnp.minimum(
            _one_hot(rel_at_gt0, R + 1) + _one_hot(rel_at_gt1, R + 1), 1.0
        )
        neg_mask_rels = neg_mask_rels * (1.0 - gt_rel_oh[:, None, :])

    rel_at_gt0 = select_along_axis(target_rels, gt[:, 0], axis=1)
    col_ints = select_along_axis(ints, target[:, None], axis=2)  # [B, T]
    col_rels = select_along_axis(
        rels_p, rel_at_gt0[:, None], axis=2
    )  # [B, T]

    s_ints = jax.nn.sigmoid(ints)
    s_rels = jax.nn.sigmoid(rels_p)
    s_col_ints = jax.nn.sigmoid(col_ints)
    s_col_rels = jax.nn.sigmoid(col_rels)

    if tr_cat_distr:
        probs_cl = jax.nn.softmax(col_ints, axis=1)
        probs_rels = jnp.nan_to_num(jax.nn.softmax(col_rels, axis=1))
        weights = (probs_cl + probs_rels) / 2.0
        max_idxs = jax.random.categorical(rng, jnp.log(weights), axis=1)
    elif tr_correct:
        max_idxs = jnp.zeros(B, jnp.int32)
    else:
        mat = s_col_ints + s_col_rels
        max_idxs = jnp.argmax(mat * mem, axis=1)

    pos = select_along_axis(s_col_ints, max_idxs, axis=1)
    pos_rels = select_along_axis(s_col_rels, max_idxs, axis=1)

    bw = _batch_weight(batch)
    if tr_max_neg and tr_sum_max_flag:
        neg_max = (s_ints * neg_mask_ints).max(axis=2)
        neg_max_rels = (s_rels * neg_mask_rels).max(axis=2)
        loss_ints = _wmean(
            jax.nn.relu((tr_margin - pos)[:, None] + neg_max).sum(axis=1), bw
        )
        loss_rels = _wmean(
            jax.nn.relu(
                (tr_margin - pos_rels)[:, None] + neg_max_rels
            ).sum(axis=1),
            bw,
        )
    else:
        loss_ints = _wmean(
            _pair_margin(s_ints, pos, neg_mask_ints, tr_margin), bw
        )
        loss_rels = _wmean(
            _pair_margin(s_rels, pos_rels, neg_mask_rels, tr_margin), bw
        )
    return lymbda * loss_ints + loss_rels
