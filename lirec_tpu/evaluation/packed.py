"""Whole-sweep on-device evaluation.

The host eval loop (runner.evaluate) dispatches one jit call per batch and
counts metrics in numpy between dispatches; through the remote-TPU tunnel
the per-batch round trips dominate. Here the ENTIRE split evaluates in one
dispatch: the packed split (dataset.materialize()) lives on device, a
`lax.fori_loop` steps over full batches, and every metric counter — the
grounding argmax counts of `update_probs_max_tracks[_rels]`
(ref evaluation.py:114-271), the top-k/soft/confusion counters of
`update_probs` (ref :68-107), and the per-(pair,rel)-hash score sums of
`RelationshipsAcc` (ref :367-417, a segment-sum over dense hash ids) —
accumulates in the loop carry. One small fetch returns everything; the host
only finishes divisions and the per-hash argsort (a few hundred rows).

Counting semantics match runner.evaluate exactly (tested per preset in
tests/test_packed_eval.py), including the reference's skip of size-1
batches (ref test.py:38-39): the trailing remainder evaluates at its
natural size in a second small dispatch, or is dropped when it is a single
sample.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lirec_tpu.evaluation.metrics import MetricAccumulator, RelationshipsAcc
from lirec_tpu.evaluation.runner import summarize_metrics

__all__ = [
    "evaluate_packed",
    "device_sweep_builder",
    "finish_from_carry",
    "allreduce_carry",
    "inject_loc",
    "loc_device_tree",
    "loc_apply_data",
]


def allreduce_carry(carry):
    """Combine per-process eval carries into the global one (multi-host
    eval: each process sweeps its own data shard, then counters reduce).

    Counters, loss sums, confusion matrices, and the RelationshipsAcc
    score table are additive across processes. `rels_gt` is a consistent
    label per hash (max over the seen rows); `rels_seen` is an any-reduce.
    No-op single-process.
    """
    if jax.process_count() == 1:
        return carry
    from jax.experimental import multihost_utils

    from lirec_tpu.parallel.mesh import coordination_barrier

    # absorb per-process skew (each process just compiled+swept its own
    # shard) over the coordination service BEFORE the first gloo
    # collective — its context formation has a hard ~30 s deadline
    coordination_barrier("eval_allreduce")
    host = jax.tree.map(np.asarray, carry)
    gathered = multihost_utils.process_allgather(host)
    out = {}
    for key, stacked in gathered.items():
        if key == "rels_seen":
            out[key] = stacked.any(axis=0)
        elif key == "rels_gt":
            seen = gathered["rels_seen"]
            out[key] = np.where(seen, stacked, 0).max(axis=0)
        else:
            out[key] = stacked.sum(axis=0)
    return out


def _topk_counters(logits, gt, n_classes, soft_labels=None):
    """Device mirror of MetricAccumulator.update_probs (ref :68-107).

    logits: [B, C] float32; gt: [B]. Returns int32 counter dict plus the
    top-1 predictions for the confusion matrix scatter.
    """
    k = min(10, n_classes)
    _, top = jax.lax.top_k(logits, k)  # stable: ties -> lower class index
    hit = top == gt[:, None].astype(top.dtype)
    counters = {
        "top1": hit[:, 0].sum(dtype=jnp.int32),
        "top3": hit[:, : min(3, k)].any(axis=1).sum(dtype=jnp.int32),
        "top5": hit[:, : min(5, k)].any(axis=1).sum(dtype=jnp.int32),
        "top10": hit.any(axis=1).sum(dtype=jnp.int32),
        "total": jnp.int32(logits.shape[0]),
    }
    if soft_labels is not None:
        # first top-5 prediction inside the soft set decides both counters
        # (ref :87-94): soft@5 = any of top-5 in the set, soft@1 = top-1 in it
        k5 = min(5, k)
        in_soft = (
            top[:, :k5, None] == soft_labels[:, None, :].astype(top.dtype)
        ).any(axis=2)
        counters["top1_sf"] = in_soft[:, 0].sum(dtype=jnp.int32)
        counters["top5_sf"] = in_soft.any(axis=1).sum(dtype=jnp.int32)
    return counters, top[:, 0]


def _grounding_counters(preds, gt_classes, gt_tracks, just_zeros,
                        gt_rels=None, n_rels=0):
    """Device mirror of MetricAccumulator.update_from_predictions
    (counting semantics of update_probs_max_tracks[_rels], ref :114-271)."""
    B = gt_classes.shape[0]
    rows = jnp.arange(B)
    gt_classes = gt_classes.reshape(-1).astype(jnp.int32)
    nz = ~just_zeros.astype(bool)
    g0 = gt_tracks[:, 0].astype(jnp.int32)
    g1 = gt_tracks[:, 1].astype(jnp.int32)
    has2 = g1 != 0

    l0 = preds["cls_argmax"][rows, g0].astype(jnp.int32)
    l1 = preds["cls_argmax"][rows, g1].astype(jnp.int32)
    correct0 = l0 == gt_classes
    cls_top1 = correct0.sum(dtype=jnp.int32) + (
        ~correct0 & (l1 == gt_classes)
    ).sum(dtype=jnp.int32)

    pr_track = preds["pr_track"].astype(jnp.int32)
    hit0 = pr_track == g0
    hit1 = has2 & ~hit0 & (pr_track == g1)
    trks_top1 = (nz & hit0).sum(dtype=jnp.int32) + (nz & hit1).sum(
        dtype=jnp.int32
    )

    jmatch = preds["c_star"].astype(jnp.int32) == gt_classes
    counters = {
        "total": nz.sum(dtype=jnp.int32),
        "total_cl": jnp.int32(B),
        "cls_top1": cls_top1,
        "trks_top1": trks_top1,
    }
    if gt_rels is not None:
        gt_rels = gt_rels.astype(jnp.int32)
        rel0 = gt_rels[:, 0]
        # reference rels_mask-nonzero sample filter (ref test.py:62)
        rvalid = (rel0 - n_rels + 1) != 0
        counters["total_rels"] = rvalid.sum(dtype=jnp.int32)
        rels_argmax = preds["rels_argmax"].astype(jnp.int32)
        p0 = rels_argmax[rows, g0]
        p1 = rels_argmax[rows, g1]
        rcorrect0 = p0 == gt_rels[rows, g0]
        counters["rels_top1"] = (rvalid & rcorrect0).sum(dtype=jnp.int32) + (
            rvalid & ~rcorrect0 & (p1 == gt_rels[rows, g1])
        ).sum(dtype=jnp.int32)
        jmatch = jmatch & (preds["r_star"].astype(jnp.int32) == rel0)
    t_star = preds["t_star"].astype(jnp.int32)
    joint0 = jmatch & (t_star == g0)
    joint1 = has2 & ~hit0 & jmatch & (t_star == g1)
    counters["top1"] = (nz & joint0).sum(dtype=jnp.int32) + (
        nz & joint1
    ).sum(dtype=jnp.int32)
    return counters


def device_sweep_builder(bundle, t, n_classes: int, n_rels: int,
                         n_hashes: int, use_pallas=None,
                         with_conf_mat: bool = False, data_mesh=None):
    """Build (init_carry, step) for the on-device metric sweep.

    `step(params, tables, embedded, carry, batch)` runs model + loss +
    metric counting for one batch and folds the counts into `carry`;
    it compiles inside a fori_loop body (full batches) and standalone
    (remainder batch). Under SPMD/mesh execution pass ``data_mesh``: the
    fused pallas kernel (which has no GSPMD partitioning rule) then runs
    per-device via shard_map over the mesh's 'data' axis while the rest of
    the step stays GSPMD (models/tabular._ctx_branch). The confusion
    matrix is opt-in — no standard metric reads it (use
    runner.evaluate(return_details=True) when you need one).
    """
    spec = bundle.spec
    maxtracks = t.tr_maximize and t.ints
    plain = not t.tr_maximize and not t.rels_multitask
    conf = with_conf_mat and (
        plain or (t.rels_multitask and t.ints and not t.tr_maximize)
    )

    def init_carry():
        carry = {
            "loss_sum": jnp.float32(0),
            "n_batches": jnp.int32(0),
        }
        zero = jnp.int32(0)
        if maxtracks:
            carry.update(
                total=zero, total_cl=zero, cls_top1=zero, trks_top1=zero,
                top1=zero,
            )
            if t.ctx:
                carry.update(total_rels=zero, rels_top1=zero)
        else:
            carry.update(total=zero, top1=zero, top3=zero, top5=zero,
                         top10=zero)
            if t.soft_gt:
                carry.update(top1_sf=zero, top5_sf=zero)
        if conf:
            carry["conf_mat"] = jnp.zeros(
                (n_classes, n_classes), jnp.int32
            )
        if t.rels_multitask and t.ctx and not t.tr_maximize:
            # RelationshipsAcc state: per-hash sigmoid-score sums (+1 dump
            # row for filtered samples), gt label, and seen flag. Width =
            # the model head (spec.n_rels); dataset.n_rels counts 'None' too
            carry["rels_table"] = jnp.zeros((n_hashes + 1, spec.n_rels),
                                            jnp.float32)
            carry["rels_gt"] = jnp.zeros(n_hashes + 1, jnp.int32)
            carry["rels_seen"] = jnp.zeros(n_hashes + 1, jnp.bool_)
        return carry

    def step(params, tables, embedded, carry, batch):
        model_batch = {
            k: batch[k]
            for k in ("feat_idx", "rels_mask", "ctx_uniq_clip",
                      "ctx_uniq_track", "ctx_tidx", "ctx_triples")
            if k in batch
        }
        out = bundle.apply(
            params, model_batch, tables=tables, embedded=embedded,
            use_pallas=use_pallas, data_mesh=data_mesh,
        )
        loss = bundle.loss(out, batch, rng=jax.random.PRNGKey(0))
        carry = dict(carry)
        carry["loss_sum"] = carry["loss_sum"] + loss.astype(jnp.float32)
        carry["n_batches"] = carry["n_batches"] + 1
        B = batch["labels"].shape[0]

        def fold(counters):
            for key, val in counters.items():
                carry[key] = carry[key] + val

        if maxtracks:
            from lirec_tpu.evaluation.device_metrics import (
                grounding_predictions,
            )

            preds = grounding_predictions(
                out["inters"],
                batch["mem_mask"],
                batch["labels"],
                pr_probs_rels=out["rels"] if t.ctx else None,
                gt_rels=batch["rels_label"] if t.ctx else None,
            )
            fold(
                _grounding_counters(
                    preds,
                    batch["labels"],
                    batch["gt_tracks"],
                    batch["just_zeros"],
                    gt_rels=batch["rels_label"] if t.ctx else None,
                    n_rels=n_rels,
                )
            )
            return carry

        if plain:
            logits = out["inters"].astype(jnp.float32).reshape(B, -1)
            gt = batch["labels"].reshape(-1).astype(jnp.int32)
            counters, top1_pred = _topk_counters(
                logits, gt, n_classes,
                soft_labels=batch["soft_labels"] if t.soft_gt else None,
            )
            fold(counters)
            if conf:
                carry["conf_mat"] = carry["conf_mat"].at[
                    gt, top1_pred
                ].add(1)
            return carry

        # rels_multitask without maxtracks (int_rels preset)
        if t.ints:
            inters = out["inters"].astype(jnp.float32).reshape(
                B, -1, n_classes
            )[:, 0]
            gt = batch["labels"][:, 0].reshape(-1).astype(jnp.int32)
            counters, top1_pred = _topk_counters(inters, gt, n_classes)
            fold(counters)
            if conf:
                carry["conf_mat"] = carry["conf_mat"].at[
                    gt, top1_pred
                ].add(1)
        if t.ctx:
            rels_label = batch["rels_label"].reshape(-1).astype(jnp.int32)
            hashes = batch["hash_rel"].reshape(-1).astype(jnp.int32)
            valid = (rels_label - n_rels + 1) != 0
            probs = jax.nn.sigmoid(out["rels"].astype(jnp.float32))
            h = jnp.where(valid & (hashes >= 0), hashes, n_hashes)
            carry["rels_table"] = carry["rels_table"].at[h].add(
                jnp.where(valid[:, None], probs, 0.0)
            )
            carry["rels_gt"] = carry["rels_gt"].at[h].set(rels_label)
            carry["rels_seen"] = carry["rels_seen"].at[h].max(valid)
        return carry

    return init_carry, step


def inject_loc(batch: Dict, loc: Dict, i):
    """Add batch i's ctx localization ids (no-op on an empty loc tree).
    Shared by both sweeps here and bench.py's slope-timed sweep.
    Triple mode carries per-batch unique index triples instead of
    per-table unique-id lists (the per-sample ``ctx_tidx`` rides in the
    data tree and is sliced with the batch)."""
    if not loc:
        return batch
    if "triples" in loc:
        return dict(batch, ctx_triples=loc["triples"][i])
    return dict(
        batch, ctx_uniq_clip=loc["clip"][i], ctx_uniq_track=loc["track"][i]
    )


def loc_device_tree(loc: Optional[Dict]):
    """The per-batch loc arrays as device arrays keyed for inject_loc
    (empty dict when localization is off). Shared with bench.py."""
    if not loc:
        return {}
    if "triples" in loc:
        return {"triples": jnp.asarray(loc["triples"])}
    return {
        "clip": jnp.asarray(loc["uniq_clip"]),
        "track": jnp.asarray(loc["uniq_track"]),
    }


def loc_apply_data(data: Dict, loc: Optional[Dict]) -> Dict:
    """Merge a loc's per-SAMPLE arrays into the sweep data tree: the
    (possibly remapped) feat_idx, plus ctx_tidx in triple mode (sliced
    alongside the batch; tail rows carry zeros and run the plain path)."""
    if loc is None:
        return data
    data = dict(data, feat_idx=loc["feat_idx"])
    if "ctx_tidx" in loc:
        data["ctx_tidx"] = loc["ctx_tidx"]
    return data


def _maybe_localize_eval_ctx(dataset, data, embedded, B: int, n_full: int,
                             t, use_pallas, override):
    """Decide + compute per-batch ctx localization for the sweep.

    Two tiers (override / ``LIREC_TPU_EVAL_LOCALIZE``: True|'on' and
    'tables' force the per-table tier, 'triple' the triple tier, False|
    'off' disables, None|'auto' decides):

    - 'tables' (localize_eval_ctx): per-batch unique clip/track ids;
      returns {feat_idx (slots 1..R remapped for the first n_full*B
      rows), uniq_clip [n_full, cap_c], uniq_track [n_full, cap_t]}.
    - 'triple' (localize_eval_ctx_triples): per-batch unique
      (clip, tr1, tr2) index TRIPLES — the sweep gathers each batch's
      unique fused rows into one local table and the ctx kernel issues
      one row gather per entry instead of three (the r4-final trace
      showed the VMEM tier gather-issue-bound). Returns {feat_idx
      (UNCHANGED — slot 0 stays global), ctx_tidx [N, (T,) R],
      triples [n_full, cap_u, 3]}.

    Auto policy: localize exactly when the embedded ctx tables exceed
    the kernel's VMEM budget (the HBM-DMA tier would run — BENCH.md
    real-scale table) AND the per-batch local tables fit it; the triple
    tier is preferred (fewer kernel gather issues at the same local
    build cost). The analysis is cached on the dataset — the eval split
    is fixed, so the unique sets never change across cadence evals.
    Decision recorded via ops/dispatch ('eval_ctx_localize'), never
    silent."""
    import os

    from lirec_tpu.ops import dispatch

    if override is None:
        override = {
            "on": True, "off": False,
            "tables": "tables", "triple": "triple",
        }.get(os.environ.get("LIREC_TPU_EVAL_LOCALIZE", "auto"))
    if override is True:
        override = "tables"  # historical 'forced on' = the per-table tier
    ctx = (embedded or {}).get("ctx")
    if not t.ctx or ctx is None or not n_full or "feat_idx" not in data:
        return None  # structurally inapplicable: nothing to decide
    if override is False or use_pallas is False:
        dispatch.record("eval_ctx_localize", "off", "forced", {})
        return None
    from lirec_tpu.ops.gather_pool import VMEM_TABLE_BUDGET

    fi = np.asarray(data["feat_idx"])
    full_bytes = (ctx.clip.size + ctx.tr1.size + ctx.tr2.size) * 4
    mode = override
    if mode is None:  # auto
        # viability first: below this the jnp path would only add a gather
        M = int(np.prod(fi.shape[:-2], dtype=np.int64))
        kernel_viable = (
            jax.default_backend() == "tpu"
            and M % 8 == 0
            and ctx.clip.shape[1] % 128 == 0
            and ctx.tr1.shape[1] % 128 == 0
        )
        if not kernel_viable:
            if full_bytes < VMEM_TABLE_BUDGET:
                return None  # VMEM-resident: the kernel dispatch itself
                # logs the tier that runs
            dispatch.record(
                "eval_ctx_localize", "off",
                "kernel not viable here (backend/shape gates): localizing "
                "would only add a gather", {"M": M},
            )
            return None
        # BELOW the VMEM budget the decision is a measured cost model,
        # not a blanket off (r5 device traces, BENCH.md "r5 roofline":
        # at real-split scale the triple->matmul tier runs the batch in
        # 345 us of device time vs 469 us for the full-table VMEM kernel
        # — the one-hot MXU matmul beats the gather-issue-bound kernel
        # whenever the batch's unique-triple count is low enough). The
        # analysis below is computed once per split (cached on the
        # dataset); _gate_local applies the cost model to its result.
        mode = "triple"
    cache = getattr(dataset, "_eval_ctx_loc_cache", None)
    cache_key = (B, n_full, fi.shape, mode)
    # keyed on the ARRAY OBJECT (materialize() caches and returns the same
    # dict each call) with a content-digest fallback for callers that
    # re-slice fresh arrays each eval (the multi-process recursion) — an
    # address-based key could go stale if a freed array's storage were
    # reused, and recomputing every cadence eval copies the whole split
    digest = None
    if cache is not None and cache[1] == cache_key:
        if cache[0] is fi:
            loc = cache[2]
            return _gate_local(loc, ctx, override, full_bytes, dispatch, B)
        import hashlib

        digest = hashlib.blake2b(
            np.ascontiguousarray(fi), digest_size=16
        ).digest()
        if cache[3] == digest:
            loc = cache[2]
            return _gate_local(loc, ctx, override, full_bytes, dispatch, B)
    if mode == "triple":
        from lirec_tpu.data.localize import localize_eval_ctx_triples

        tidx, triples = localize_eval_ctx_triples(
            fi, B, n_full, ctx.tr1.shape[0]
        )
        loc = {"feat_idx": fi, "ctx_tidx": tidx, "triples": triples}
    else:
        from lirec_tpu.data.localize import localize_eval_ctx

        new_fi, uc, ut = localize_eval_ctx(
            fi, B, n_full, ctx.clip.shape[0], ctx.tr1.shape[0]
        )
        loc = {"feat_idx": new_fi, "uniq_clip": uc, "uniq_track": ut}
    if digest is None:
        import hashlib

        digest = hashlib.blake2b(
            np.ascontiguousarray(fi), digest_size=16
        ).digest()
    try:
        dataset._eval_ctx_loc_cache = (fi, cache_key, loc, digest)
    except AttributeError:
        pass  # dataset without attribute support: recompute per eval
    return _gate_local(loc, ctx, override, full_bytes, dispatch, B)


def _gate_local(loc, ctx, override, full_bytes, dispatch, B=None):
    """Final profitability gate + dispatch record for a computed loc.

    Past the VMEM budget: localize whenever the local tables fit (the
    alternative is the ~3x-slower HBM-DMA kernel tier). BELOW the budget
    (r5): a measured cost model decides — per-batch triple-tier cost
    (min of the MXU one-hot matmul and the local gather kernel, via
    ops.gather_pool.matmul_pool_estimate_us, plus the per-batch
    unique-row gather at the ~300 GB/s measured for that access pattern)
    against the full-table VMEM kernel's issue-bound 9.8 ns/entry. At
    real-split shapes (M=1280, R=18, U~2k) that is ~193 us vs ~226 us —
    and the same-session device traces measured the whole ctx side at
    345 vs 469 us/batch (BENCH.md r5 roofline), so the model is
    conservative in the right direction. IID batches dedup to nothing
    (U ~ M*R), the matmul estimate blows past the kernel's, and the
    gate correctly stays off."""
    from lirec_tpu.ops.gather_pool import (
        VMEM_TABLE_BUDGET, matmul_pool_estimate_us,
    )

    row_w = ctx.clip.shape[1] + 2 * ctx.tr1.shape[1]
    if "triples" in loc:
        local_bytes = loc["triples"].shape[1] * row_w * 4
        shapes = {
            "tier": "triple",
            "caps": (loc["triples"].shape[1],),
            "tables": (ctx.clip.shape[0], ctx.tr1.shape[0]),
        }
    else:
        local_bytes = (
            loc["uniq_clip"].shape[1] * ctx.clip.shape[1]
            + 2 * loc["uniq_track"].shape[1] * ctx.tr1.shape[1]
        ) * 4
        shapes = {
            "tier": "tables",
            "caps": (loc["uniq_clip"].shape[1], loc["uniq_track"].shape[1]),
            "tables": (ctx.clip.shape[0], ctx.tr1.shape[0]),
        }
    forced = override in ("tables", "triple")
    if not forced and local_bytes >= VMEM_TABLE_BUDGET:
        dispatch.record(
            "eval_ctx_localize", "off",
            "local tables %.0f MB still exceed the VMEM budget"
            % (local_bytes / 2**20), shapes,
        )
        return None
    if (
        not forced
        and full_bytes < VMEM_TABLE_BUDGET
        and "triples" in loc
        and B
    ):
        tidx = np.asarray(loc["ctx_tidx"])
        R = int(tidx.shape[-1])
        M_b = int(B) * int(np.prod(tidx.shape[1:-1], dtype=np.int64))
        U = int(loc["triples"].shape[1])
        packed = str(ctx.clip.dtype) == "int32"
        d_logical = 2 * row_w if packed else row_w
        mm_us, kr_us = matmul_pool_estimate_us(M_b, R, U, d_logical)
        # the matmul tier is only auto-selected for packed-bf16 tables
        # (gather_pool.fused_ctx_pool_triple); pricing it in for f32
        # tables would enable localizations that then execute on the
        # strictly-slower local gather kernel
        tier_us = min(mm_us, kr_us) if packed else kr_us
        gather_us = local_bytes / 300e3  # measured unique-row gather BW
        full_kernel_us = M_b * R * 9.8e-3
        est = dict(shapes, est_triple_us=round(tier_us + gather_us),
                   est_kernel_us=round(full_kernel_us))
        if tier_us + gather_us >= full_kernel_us:
            dispatch.record(
                "eval_ctx_localize", "off",
                "cost model: triple est %.0f us/batch >= full-table VMEM "
                "kernel %.0f us" % (tier_us + gather_us, full_kernel_us),
                est,
            )
            return None
        dispatch.record(
            "eval_ctx_localize", "on",
            "cost model: triple est %.0f us/batch < full-table VMEM "
            "kernel %.0f us" % (tier_us + gather_us, full_kernel_us),
            est,
        )
        return loc
    dispatch.record(
        "eval_ctx_localize", "on",
        "forced" if forced else
        "full ctx tables %.0f MB > VMEM budget; local %.0f MB fit"
        % (full_bytes / 2**20, local_bytes / 2**20),
        shapes,
    )
    return loc


def evaluate_packed(
    dataset,
    bundle,
    params,
    cfg,
    mode: str = "val",
    tables: Optional[Dict] = None,
    verbose: bool = True,
    data: Optional[Dict[str, np.ndarray]] = None,
    batch_size: Optional[int] = None,
    mesh=None,
    use_pallas=None,
    localize_ctx: Optional[bool] = None,
) -> Dict[str, float]:
    """One-dispatch evaluation of a whole split; returns the same metric
    dict (and prints the same lines) as runner.evaluate.

    With ``mesh``, each batch's sample axis shards over the mesh's 'data'
    axis (params/tables replicated): the sweep runs SPMD across the mesh's
    devices and XLA inserts the counter-reduction collectives; the fused
    pallas kernel runs per-device via shard_map. Metrics are identical to
    the single-device sweep (tested in test_parallel.py).
    """
    t = cfg.tasks
    n_rels = dataset.n_rels
    n_classes = dataset.n_classes
    n_hashes = len(getattr(dataset, "hashidx_rels", ()) or ())
    B = batch_size or cfg.optim.batch_size

    if data is None:
        data = dataset.materialize()
    N = len(data["labels"])
    n_full, tail = divmod(N, B)
    if tail == 1:
        tail = 0  # ref test.py:38-39: size-1 batches are skipped

    if tables is None:
        tables = dataset.tables.as_dict()

    if mesh is not None and jax.process_count() > 1:
        # Multi-process: a global device_put of the packed split is not
        # possible (non-addressable devices), and batch-granular slicing
        # preserves the reference's batch-boundary quirks exactly — so
        # each process sweeps a contiguous block of full batches on its
        # local devices (the last one also takes the ragged tail) and the
        # counters allreduce across processes below.
        from lirec_tpu.parallel.mesh import host_copy

        nproc, pid = jax.process_count(), jax.process_index()
        lo = (n_full * pid) // nproc
        hi = (n_full * (pid + 1)) // nproc
        local = {
            k: np.asarray(v)[
                lo * B : (hi * B + (tail if pid == nproc - 1 else 0))
            ]
            for k, v in data.items()
        }
        return evaluate_packed(
            dataset, bundle, host_copy(params), cfg, mode=mode,
            tables=host_copy(tables), verbose=verbose, data=local,
            batch_size=B, use_pallas=use_pallas, localize_ctx=localize_ctx,
        )

    tables = jax.tree.map(jnp.asarray, tables)

    from lirec_tpu.models.tabular import embed_all
    from lirec_tpu.utils import aot_cache

    embed_jit = jax.jit(lambda p, tb: embed_all(p, bundle.spec, tb))
    if mesh is None:
        embedded = aot_cache.cached_compile(
            embed_jit, params, tables, label="embed_all"
        )(params, tables)
    else:
        # meshed embeds run on replicated inputs only after the
        # device_put below; the first (host-array) call stays plain jit
        embedded = embed_jit(params, tables)
    init_carry, step = device_sweep_builder(
        bundle, t, n_classes, n_rels, n_hashes,
        use_pallas=use_pallas, data_mesh=mesh,
    )

    # eval ctx localization: remapped feat_idx replaces the sweep rows
    # (tail rows untouched); per-batch unique-id arrays ride a separate
    # [n_full, cap] tree and replicate under a mesh
    loc = _maybe_localize_eval_ctx(
        dataset, data, embedded, B, n_full, t, use_pallas, localize_ctx
    )
    data = loc_apply_data(data, loc)

    if mesh is None:
        # batches staged STACKED [n_full, B, ...]: indexing a[i] in the
        # sweep body feeds the loop measurably better than
        # dynamic_slice_in_dim over a flat array (same-session v5e
        # ablation: 0.268 vs 0.433 ms/batch at identical math — BENCH.md
        # "Multi-chip readiness bench"); the train epoch sweep and the
        # SPMD branch below already use this layout
        def stack_batched(v):
            v = np.asarray(v)
            return jnp.asarray(
                v[: n_full * B].reshape((n_full, B) + v.shape[1:])
            )

        data_dev = {k: stack_batched(v) for k, v in data.items()}
        loc_dev = loc_device_tree(loc)

        @functools.partial(jax.jit, static_argnames=("n_full",))
        def sweep(params, tables, embedded, data, loc, n_full):
            def body(i, carry):
                batch = inject_loc(jax.tree.map(lambda a: a[i], data), loc, i)
                return step(params, tables, embedded, carry, batch)

            return jax.lax.fori_loop(0, n_full, body, init_carry())

        if n_full:
            # AOT executable cache: dodges the remote compile-at-load that
            # dominates cold starts on the axon backend (utils/aot_cache.py)
            carry = aot_cache.cached_compile(
                sweep, params, tables, embedded, data_dev, loc_dev,
                label="eval_sweep", n_full=n_full,
            )(params, tables, embedded, data_dev, loc_dev)
        else:
            # split smaller than one batch (or an empty process slice):
            # the loop body cannot even trace its B-sized slices
            carry = init_carry()
        tail_data = None  # tail rows staged separately below
    else:
        # SPMD sweep: data laid out [n_batches, B, ...] with the B axis
        # sharded over 'data' — slicing batch i hits the UNsharded leading
        # axis, so no resharding happens inside the loop
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard_batched(v):
            v = np.asarray(v)
            batched = v[: n_full * B].reshape((n_full, B) + v.shape[1:])
            spec = P(None, "data", *([None] * (v.ndim - 1)))
            return jax.device_put(batched, NamedSharding(mesh, spec))

        if not n_full:
            # nothing to shard: fall back to the local tail-only sweep
            return evaluate_packed(
                dataset, bundle, params, cfg, mode=mode, tables=tables,
                verbose=verbose, data=data, batch_size=B,
                use_pallas=use_pallas, localize_ctx=localize_ctx,
            )
        data_sh = {k: shard_batched(v) for k, v in data.items()}
        repl = NamedSharding(mesh, P())
        params_r = jax.device_put(params, jax.tree.map(lambda _: repl, params))
        tables_r = jax.device_put(tables, {k: repl for k in tables})
        embedded_r = jax.device_put(
            embedded, jax.tree.map(lambda _: repl, embedded)
        )
        # per-batch unique-id/triple arrays are batch-level (no sample
        # axis): replicate — the local-table gather then stays replicated
        loc_sh = {
            k: jax.device_put(np.asarray(v), repl)
            for k, v in loc_device_tree(loc).items()
        }

        @jax.jit
        def sweep_spmd(params, tables, embedded, data, loc):
            def body(i, carry):
                batch = inject_loc(jax.tree.map(lambda a: a[i], data), loc, i)
                return step(params, tables, embedded, carry, batch)

            n = next(iter(data.values())).shape[0]
            return jax.lax.fori_loop(0, n, body, init_carry())

        # the SPMD sweep rides the AOT executable cache too (r5): the key
        # pins the mesh's device layout and this process's index/count
        carry = aot_cache.cached_compile(
            sweep_spmd, params_r, tables_r, embedded_r, data_sh, loc_sh,
            label="eval_sweep_spmd", mesh=mesh,
        )(params_r, tables_r, embedded_r, data_sh, loc_sh)
        tail_data = {k: jnp.asarray(v) for k, v in data.items()}
        params, tables, embedded = params_r, tables_r, embedded_r

    if tail:
        if tail_data is None:
            tail_batch = {
                k: jnp.asarray(np.asarray(v)[n_full * B :])
                for k, v in data.items()
            }
        else:
            tail_batch = {k: v[n_full * B :] for k, v in tail_data.items()}
        tail_step = step
        if mesh is not None:
            # the ragged tail runs replicated (its row count need not divide
            # the data axis), so it cannot go through the shard_map kernel
            _, tail_step = device_sweep_builder(
                bundle, t, n_classes, n_rels, n_hashes, use_pallas=False,
            )
        tail_jit = jax.jit(tail_step)
        carry = aot_cache.cached_compile(
            tail_jit, params, tables, embedded, carry, tail_batch,
            label="eval_tail", mesh=mesh,
        )(params, tables, embedded, carry, tail_batch)
    # multi-host: each process evaluates its own data shard on its local
    # devices; the counters reduce across processes here (no-op otherwise)
    carry = allreduce_carry(carry)
    return finish_from_carry(carry, t, n_rels, n_hashes, mode, verbose)


def finish_from_carry(
    carry, t, n_rels: int, n_hashes: int, mode: str, verbose: bool
) -> Dict[str, float]:
    """Host finish of the device sweep: fetch counters, fill the
    accumulators, and emit the metric dict (divisions + the per-hash
    argsort of RelationshipsAcc only)."""
    carry = jax.tree.map(np.asarray, carry)
    prec = MetricAccumulator(n_rels=n_rels)
    prec.total = int(carry.get("total", 0))
    prec.total_cl = int(carry.get("total_cl", 0))
    prec.total_rels = int(carry.get("total_rels", 0))
    for host_attr, key in (
        ("_top1", "top1"), ("_top3", "top3"), ("_top5", "top5"),
        ("_top10", "top10"), ("_top1_sf", "top1_sf"),
        ("_top5_sf", "top5_sf"), ("_cls_top1", "cls_top1"),
        ("_trks_top1", "trks_top1"), ("_rels_top1", "rels_top1"),
    ):
        if key in carry:
            setattr(prec, host_attr, int(carry[key]))

    prec_rels = None
    if "rels_table" in carry:
        prec_rels = RelationshipsAcc(n_rels=n_rels)
        for h in np.nonzero(carry["rels_seen"][:n_hashes])[0]:
            prec_rels._pr_probs[int(h)] = carry["rels_table"][h]
            prec_rels._gt[int(h)] = int(carry["rels_gt"][h])

    n_batches = int(carry["n_batches"])
    avg_loss = float(carry["loss_sum"]) / n_batches if n_batches else 0.0
    return summarize_metrics(t, prec, prec_rels, avg_loss, mode, verbose)
