"""Model/loss selection mirroring the reference factory
(ref `mlp/model.py:578-609`), behind a uniform apply/loss interface usable
with dense batches (parity path) or packed index batches + feature tables
(TPU fast path).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.models import losses as losses_lib
from lirec_tpu.models.blocks import slices_from_dense
from lirec_tpu.models.midfusion import (
    init_midfusion,
    midfusion_forward,
    midfusion_maxtracks_forward,
)
from lirec_tpu.models.modalities import init_modalities, modalities_forward
from lirec_tpu.models.spec import ModelSpec

__all__ = ["ModelBundle", "create_model", "apply_model"]


def apply_model(
    params: Dict,
    spec: ModelSpec,
    batch: Dict,
    tables: Optional[Dict] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    use_tabular: Optional[bool] = None,
    use_pallas: Optional[bool] = None,  # None=auto: fused kernel on TPU
    embedded: Optional[Dict] = None,
    context_axis: Optional[str] = None,
    data_mesh=None,  # SPMD: run the fused kernel per-device via shard_map
) -> Dict:
    """Dispatch to the configured architecture.

    batch carries either dense ``features`` (reference layout) or packed
    ``feat_idx`` index triples resolved against ``tables``. At eval with a
    packed batch, the embed-then-gather fast path (models/tabular.py) is
    taken automatically (exact; disable with use_tabular=False).
    """
    if use_tabular is None:
        use_tabular = deterministic and "feat_idx" in batch
    if tables is not None and "uniq_clip" in batch:
        # batch-local tables (data/localize.py): feat_idx is remapped to
        # slots of the batch's unique rows — gather the raw rows once so
        # every table-level first layer (and its backward) runs at
        # batch-unique size instead of table size
        uc = jnp.asarray(batch["uniq_clip"])
        ut = jnp.asarray(batch["uniq_track"])
        tables = {
            "text": jnp.asarray(tables["text"])[uc],
            "visual": jnp.asarray(tables["visual"])[uc],
            "track": jnp.asarray(tables["track"])[ut],
        }
    if use_tabular and "feat_idx" in batch:
        from lirec_tpu.models import tabular

        feat_idx = jnp.asarray(batch["feat_idx"])
        rels_mask = batch.get("rels_mask")
        if rels_mask is not None:
            rels_mask = jnp.asarray(rels_mask)
        ctx_triple = None
        if (
            embedded is not None and "ctx_triples" in batch
            and context_axis is None and spec.ctx
        ):
            # triple tier (data/localize.localize_eval_ctx_triples): gather
            # this batch's unique FUSED [clip|tr1|tr2] rows into one local
            # table so the ctx kernel issues ONE row gather per context
            # entry instead of three (ops/gather_pool.fused_ctx_pool_triple).
            # feat_idx stays global (slot 0 / ints path untouched).
            tri = jnp.asarray(batch["ctx_triples"])
            ctx = embedded["ctx"]
            fused = jnp.concatenate(
                [ctx.clip[tri[:, 0]], ctx.tr1[tri[:, 1]], ctx.tr2[tri[:, 2]]],
                axis=-1,
            )
            ctx_triple = (
                fused,
                jnp.asarray(batch["ctx_tidx"]),
                int(ctx.clip.shape[1]),
                int(ctx.tr1.shape[1]),
            )
        if embedded is not None and "ctx_uniq_clip" in batch:
            # eval ctx localization (data/localize.localize_eval_ctx):
            # feat_idx slots 1..R are already remapped to local positions;
            # gather this batch's unique EMBEDDED ctx rows so the fused
            # kernel sees a small VMEM-resident table at any cardinality.
            # Slot 0 (ints/GT) stays global and reads embedded['ints'].
            uc = jnp.asarray(batch["ctx_uniq_clip"])
            ut = jnp.asarray(batch["ctx_uniq_track"])
            ctx = embedded["ctx"]
            embedded = dict(
                embedded,
                ctx=tabular.EmbeddedTables(
                    clip=ctx.clip[uc], tr1=ctx.tr1[ut], tr2=ctx.tr2[ut]
                ),
            )
        if spec.mod_check:
            return tabular.modalities_tabular(params, spec, tables, feat_idx)
        if spec.tr_maximize:
            return tabular.midfusion_maxtracks_tabular(
                params, spec, tables, feat_idx, rels_mask,
                use_pallas=use_pallas, embedded=embedded,
                context_axis=context_axis, data_mesh=data_mesh,
                ctx_triple=ctx_triple,
            )
        return tabular.midfusion_tabular(
            params, spec, tables, feat_idx, rels_mask,
            use_pallas=use_pallas, embedded=embedded,
            context_axis=context_axis, data_mesh=data_mesh,
            ctx_triple=ctx_triple,
        )

    if "feat_idx" in batch:
        # packed train path: first layers at table level (exact, incl.
        # dropout masks — see models/hybrid.py)
        from lirec_tpu.models import hybrid

        feat_idx = jnp.asarray(batch["feat_idx"])
        rels_mask = batch.get("rels_mask")
        if rels_mask is not None:
            rels_mask = jnp.asarray(rels_mask)
        if spec.mod_check:
            return hybrid.modalities_hybrid(
                params, spec, tables, feat_idx, deterministic, rng
            )
        # the pallas table-grad scatter VJP has no GSPMD partitioning
        # rule; under a mesh its backward runs per-shard via shard_map with
        # a psum of the partial table grads (ops/scatter_accum.gather_h1)
        if spec.tr_maximize:
            return hybrid.midfusion_maxtracks_hybrid(
                params, spec, tables, feat_idx, rels_mask, deterministic,
                rng, data_mesh=data_mesh,
            )
        return hybrid.midfusion_hybrid(
            params, spec, tables, feat_idx, rels_mask, deterministic, rng,
            data_mesh=data_mesh,
        )

    s = slices_from_dense(jnp.asarray(batch["features"]), spec)

    if spec.mod_check:
        if s.text.ndim == 3:  # [B, 1, D] -> GT row
            s = s.index(slice(None), 0)
        return modalities_forward(params, spec, s, deterministic, rng)

    rels_mask = batch.get("rels_mask")
    if rels_mask is not None:
        rels_mask = jnp.asarray(rels_mask)
    if spec.tr_maximize:
        if s.text.ndim == 3:  # ctx-off dense [B, T, D] -> [B, T, 1, D]
            s = type(s)(*(a[:, :, None, :] for a in s))
        return midfusion_maxtracks_forward(
            params, spec, s, rels_mask, deterministic, rng
        )
    return midfusion_forward(params, spec, s, rels_mask, deterministic, rng)


class ModelBundle(NamedTuple):
    spec: ModelSpec
    params: Dict
    apply: Callable  # apply(params, batch, tables=None, deterministic, rng)
    loss: Callable  # loss(outputs, batch, rng=None, tr_sum_max_flag=None)


def create_model(cfg, n_classes: int, n_rels: int = 0, key=None) -> ModelBundle:
    """Build (spec, params, apply, loss) for a config
    (model/loss table: ref mlp/model.py:578-597)."""
    spec = ModelSpec.from_config(cfg, n_classes, n_rels)
    key = key if key is not None else jax.random.PRNGKey(cfg.optim.seed)
    if spec.mod_check:
        params = init_modalities(key, spec)
    else:
        params = init_midfusion(key, spec)

    t, o = cfg.tasks, cfg.optim

    if t.tr_maximize and t.rels_multitask:
        def loss(outputs, batch, rng=None, tr_sum_max_flag=None):
            return losses_lib.margin_track_rels_loss(
                outputs,
                batch,
                n_rels,
                tr_margin=o.tr_margin,
                lymbda=o.lymbda,
                tr_correct=t.tr_correct,
                tr_cat_distr=t.tr_cat_distr,
                tr_max_neg=t.tr_max_neg,
                tr_sum_max_flag=(
                    t.tr_sum_max_flag
                    if tr_sum_max_flag is None
                    else tr_sum_max_flag
                ),
                rng=rng,
            )
    elif t.tr_maximize:
        def loss(outputs, batch, rng=None, tr_sum_max_flag=None):
            return losses_lib.margin_loss(
                outputs,
                batch,
                tr_margin=o.tr_margin,
                tr_correct=t.tr_correct,
                tr_cat_distr=t.tr_cat_distr,
                tr_max_neg=t.tr_max_neg,
                tr_sum_max_flag=(
                    t.tr_sum_max_flag
                    if tr_sum_max_flag is None
                    else tr_sum_max_flag
                ),
                rng=rng,
            )
    elif t.rels_multitask:
        def loss(outputs, batch, rng=None, tr_sum_max_flag=None):
            return losses_lib.multitask_max_margin_loss(
                outputs,
                batch,
                n_rels,
                margin=o.margin,
                lymbda=o.lymbda,
                ints=t.ints,
                ctx=t.ctx,
            )
    else:
        def loss(outputs, batch, rng=None, tr_sum_max_flag=None):
            return losses_lib.max_margin_ce_loss(outputs, batch, margin=o.margin)

    def apply_fn(params, batch, tables=None, deterministic=True, rng=None,
                 **kw):
        return apply_model(
            params, spec, batch, tables=tables,
            deterministic=deterministic, rng=rng, **kw,
        )

    return ModelBundle(spec=spec, params=params, apply=apply_fn, loss=loss)
