"""Evaluation loop (ref `mlp/test.py:17-145`).

Batches flow through the jit-compiled model; metric accumulation runs on
host numpy (cheap: [B, 20, C] per batch). Printed lines and the returned
metric dict mirror the reference so downstream tooling (ModelSaver keys,
logs) is interchangeable.
"""

from __future__ import annotations

import collections
from typing import Dict, Optional

import jax
import numpy as np

from lirec_tpu.data.pipeline import BatchIterator
from lirec_tpu.evaluation.metrics import MetricAccumulator, RelationshipsAcc

__all__ = ["evaluate", "evaluate_rels_only", "summarize_metrics"]


def evaluate_rels_only(
    dataset, bundle, params, cfg, verbose: bool = True,
    batch_size: int = 0,
) -> Dict[str, float]:
    """Relationship-only eval over (pair, rel) hashes with ALL their clips
    (ref `test_rels_multi_clip` mode, classification_dataloader.py:293-303).

    The reference's DataLoader cannot actually batch this mode (items have
    variable clip counts); here items stream one at a time into
    fixed-shape pow2 buckets (padded rows are table index 0 = zeros with
    mask 0, invisible to the masked mean) that flush at ``batch_size``.
    Memory stays O(buckets x batch) instead of O(dataset), and compiles
    stay O(buckets) — one shape per bucket regardless of the split size.
    """
    import jax.numpy as jnp

    from lirec_tpu.evaluation.metrics import RelationshipsAcc

    B = batch_size or cfg.optim.batch_size
    was = dataset.test_rels_multi_clip
    dataset.test_rels_multi_clip = True
    try:
        tables = jax.tree.map(jnp.asarray, dataset.tables.as_dict())
        acc = RelationshipsAcc(n_rels=dataset.n_rels)

        import dataclasses

        from lirec_tpu.models.tabular import midfusion_tabular

        # items here are [B, L+1, 3] regardless of preset; force the
        # non-maxtracks forward (the maxtracks dispatch expects a
        # 4-D hypothesis layout)
        flat_spec = dataclasses.replace(bundle.spec, tr_maximize=False)

        @jax.jit
        def step(p, feat_idx, rels_mask, tbls):
            out = midfusion_tabular(
                p, flat_spec, tbls, feat_idx, rels_mask
            )
            return out["rels"]

        class _Bucket:
            def __init__(self, padded: int):
                self.feat = np.zeros((B, padded + 1, 3), np.int32)
                self.mask = np.zeros((B, padded, 1), np.int32)
                self.labels = np.zeros(B, int)
                self.hashes = np.zeros(B, int)
                self.n = 0

            def add(self, i, item):
                L = item["feat_idx"].shape[0] - 1
                row = self.n
                self.feat[row, : L + 1] = item["feat_idx"]
                self.feat[row, L + 1 :] = 0
                self.mask[row] = 0
                self.mask[row, :L, 0] = item["rels_mask"][:, 0]
                self.labels[row] = item["rels_label"]
                self.hashes[row] = i
                self.n += 1

            def flush(self):
                if not self.n:
                    return
                # fixed [B, ...] shape: pad rows beyond n are sliced off
                # before the accumulator sees them
                rels = np.asarray(
                    step(params, self.feat, self.mask, tables)
                )
                acc.update(
                    rels[: self.n], self.labels[: self.n],
                    self.hashes[: self.n],
                )
                self.n = 0

        buckets: Dict[int, _Bucket] = {}
        for i in range(len(dataset)):
            item = dataset[i]
            L = item["feat_idx"].shape[0] - 1
            padded = 1 << max(1, (L - 1)).bit_length()  # next pow2 >= L
            bucket = buckets.get(padded)
            if bucket is None:
                bucket = buckets[padded] = _Bucket(padded)
            bucket.add(i, item)
            if bucket.n == B:
                bucket.flush()
        for padded in sorted(buckets):
            buckets[padded].flush()
        out = {"rels_top1": acc.top1(), "rels_top3": acc.top3()}
        if verbose:
            print("RELS-ONLY rels@top1: %f" % out["rels_top1"])
            print("RELS-ONLY rels@top3: %f" % out["rels_top3"])
        return out
    finally:
        dataset.test_rels_multi_clip = was


def evaluate(
    dataset,
    bundle,
    params,
    cfg,
    mode: str = "val",
    tables: Optional[Dict] = None,
    batch_iterator: Optional[BatchIterator] = None,
    dense: bool = False,
    verbose: bool = True,
    jit_apply=None,
    return_details: bool = False,
) -> Dict[str, float]:
    """Run one evaluation pass; returns the ModelSaver metric dict
    {'total', 'ints'[, 'rels'][, 'tracks', 'joint']} (ref test.py:138-145)."""
    t = cfg.tasks
    n_rels = dataset.n_rels
    prec = MetricAccumulator(n_rels=n_rels)
    prec_rels = RelationshipsAcc(n_rels=n_rels) if t.rels_multitask else None
    conf_mat = np.zeros((dataset.n_classes, dataset.n_classes))
    losses = []

    if tables is None and not dense:
        tables = dataset.tables.as_dict()
    if tables is not None:
        tables = jax.tree.map(jax.numpy.asarray, tables)
    it = batch_iterator or BatchIterator(
        dataset, cfg.optim.batch_size, shuffle=False, dense=dense
    )

    model_keys = ("features", "feat_idx", "rels_mask")

    # Branch embeddings of the feature tables are computed ONCE per sweep
    # (models/tabular.embed_all) — params are frozen during eval.
    embedded = None
    if tables is not None and not dense:
        from lirec_tpu.models.tabular import embed_all

        embedded = jax.jit(
            lambda p, tb: embed_all(p, bundle.spec, tb)
        )(params, tables)

    def _step(p, b, tb, emb):
        model_batch = {k: b[k] for k in model_keys if k in b}
        out = bundle.apply(p, model_batch, tables=tb, embedded=emb)
        preds = None
        if t.tr_maximize and t.ints and not t.soft_gt:
            # (soft_gt needs the raw logits on host; its branch runs first)
            from lirec_tpu.evaluation.device_metrics import (
                grounding_predictions,
            )

            # metric argmaxes on device: a few small vectors come back
            # instead of [B, T, C(+R)] logits
            preds = grounding_predictions(
                out["inters"],
                b["mem_mask"],
                b["labels"],
                pr_probs_rels=out["rels"] if t.ctx else None,
                gt_rels=b["rels_label"] if t.ctx else None,
            )
        # fixed key: only tr_cat_distr-style losses sample, and eval uses a
        # deterministic draw
        return out, bundle.loss(out, b, rng=jax.random.PRNGKey(0)), preds

    # jit_apply contract: (params, batch, tables, embedded) ->
    # (outputs, loss, device_predictions_or_None); preds=None falls back to
    # the host metric accumulators below.
    step_fn = jit_apply or jax.jit(_step)

    # Bounded pipeline: keep a few batches in flight so device compute
    # overlaps host metric accumulation, without holding O(dataset) device
    # outputs live at once.
    PIPELINE_DEPTH = 4
    in_flight = collections.deque()

    def _drain_one():
        batch, outputs, loss, preds = in_flight.popleft()
        losses.append(float(loss))
        if preds is not None:
            preds = {k: np.asarray(v) for k, v in preds.items()}
            return batch, None, preds
        outputs = {
            k: (np.asarray(v) if v is not None else None)
            for k, v in outputs.items()
        }
        return batch, outputs, None

    def _batches():
        for batch in it:
            if len(np.atleast_1d(batch["labels"])) == 1:
                continue  # ref test.py:38-39
            result = step_fn(params, batch, tables, embedded)
            if len(result) == 2:  # legacy 2-tuple jit_apply
                result = result + (None,)
            in_flight.append((batch,) + tuple(result))
            if len(in_flight) >= PIPELINE_DEPTH:
                yield _drain_one()
        while in_flight:
            yield _drain_one()

    for batch, outputs, preds in _batches():

        if t.soft_gt:
            conf_mat = prec.update_probs(
                outputs["inters"].reshape(len(batch["labels"]), -1),
                batch["labels"],
                soft_labels=batch["soft_labels"],
                conf_mat=conf_mat,
            )
        elif t.tr_maximize:
            if t.ints and not t.ctx:
                if preds is not None:
                    prec.update_from_predictions(
                        preds,
                        gt_classes=batch["labels"],
                        gt_tracks=batch["gt_tracks"],
                        just_zeros=batch["just_zeros"],
                    )
                else:  # host fallback (custom jit_apply without preds)
                    prec.update_probs_max_tracks(
                        outputs["inters"],
                        gt_tracks=batch["gt_tracks"],
                        gt_classes=batch["labels"],
                        mask=batch["mem_mask"],
                        just_zeros=batch["just_zeros"],
                    )
            elif t.ints and t.ctx:
                # samples whose GT-slot relationship is labeled
                # (ref test.py:62)
                ridx = np.nonzero(
                    batch["rels_label"][:, 0] - n_rels + 1
                )[0]
                if preds is not None:
                    prec.update_from_predictions(
                        preds,
                        gt_classes=batch["labels"],
                        gt_tracks=batch["gt_tracks"],
                        just_zeros=batch["just_zeros"],
                        gt_rels=batch["rels_label"],
                        rels_sample_idx=ridx,
                    )
                else:
                    prec.update_probs_max_tracks_rels(
                        outputs["inters"],
                        outputs["rels"],
                        gt_classes=batch["labels"],
                        gt_rels=batch["rels_label"],
                        gt_tracks=batch["gt_tracks"],
                        mask=batch["mem_mask"],
                        just_zeros=batch["just_zeros"],
                        rels_sample_idx=ridx,
                    )
        elif t.rels_multitask:
            if t.ints:
                bs = len(batch["labels"])
                inters = outputs["inters"].reshape(bs, -1, dataset.n_classes)[
                    :, 0
                ]
                conf_mat = prec.update_probs(
                    inters, batch["labels"][:, 0].reshape(-1),
                    conf_mat=conf_mat,
                )
            if t.ctx:
                valid = np.nonzero(batch["rels_label"] - n_rels + 1)[0]
                if len(valid):
                    prec_rels.update(
                        outputs["rels"][valid],
                        batch["rels_label"][valid],
                        batch["hash_rel"][valid],
                    )
        else:
            conf_mat = prec.update_probs(
                outputs["inters"].reshape(len(batch["labels"]), -1),
                batch["labels"],
                conf_mat=conf_mat,
            )

    avg_loss = float(np.mean(losses)) if losses else 0.0
    out = summarize_metrics(t, prec, prec_rels, avg_loss, mode, verbose)
    if return_details:
        out["conf_mat"] = conf_mat
        out["accumulator"] = prec
        if prec_rels is not None:
            out["rels_accumulator"] = prec_rels
    return out


def summarize_metrics(
    t, prec, prec_rels, avg_loss: float, mode: str, verbose: bool
) -> Dict[str, float]:
    """Printed lines + ModelSaver metric dict from filled accumulators
    (ref test.py:100-145); shared by the host and packed-device eval paths."""

    def log(msg):
        if verbose:
            print(msg)

    out_val = out_ints = out_rels = out_tr = out_joint = 0.0
    if t.ints:
        log("%s loss: %f" % (mode.upper(), avg_loss))
        log("%s pr@1: %f" % (mode.upper(), prec.top1()))
        if not t.tr_maximize:
            log("%s pr@5: %f" % (mode.upper(), prec.top5()))
        out_ints = prec.top1()
        out_joint = prec.top1()
        out_val += out_ints
    if t.soft_gt:
        log("%s pr soft@1 %f" % (mode.upper(), prec.top1_sf()))
        log("%s pr soft@5 %f" % (mode.upper(), prec.top5_sf()))
    if t.tr_maximize:
        out_ints = prec.cls_top1()
        out_tr = prec.trks_top1()
        out_val = out_val + out_tr + out_ints
        log("%s pr@trks: %f" % (mode.upper(), prec.trks_top1()))
        log("%s pr@cls: %f" % (mode.upper(), prec.cls_top1()))
        if t.ctx:
            out_rels = prec.rels_top1()
            log("%s pr@rels: %f" % (mode.upper(), prec.rels_top1()))
            out_val += out_rels
    if t.rels_multitask and t.ctx and not t.tr_maximize:
        out_rels = prec_rels.top1()
        out_val += out_rels
        log("%s rels@top1: %f" % (mode.upper(), prec_rels.top1()))
        log("%s rels@top3: %f" % (mode.upper(), prec_rels.top3()))
        log("%s rel+int: %f" % (mode.upper(), out_val))

    out = {"total": out_val, "ints": out_ints, "loss": avg_loss}
    if t.rels_multitask:
        out["rels"] = out_rels
    if t.tr_maximize:
        out["tracks"] = out_tr
        out["joint"] = out_joint
    return out
