"""Embed-then-gather eval forwards (TPU fast path).

At eval (no dropout) the per-modality MLPs are applied ONCE per unique
feature-table row, and per-(sample, hypothesis, clip) work reduces to
gathers + masked means + the gate/heads. This is exact — tanh and masked
mean are elementwise/linear and commute with concatenation — and cuts the
MLP FLOPs from O(B*20*19) rows to O(n_unique_rows) (ARCHITECTURE.md §2).

Layout note: embeddings are stored per modality ([n, joint] / [n, joint/2])
and concatenated only after pooling, so gathers move the minimum bytes.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.models.blocks import gate_apply
from lirec_tpu.models.layers import compute_dtype, DropoutRng, linear

__all__ = [
    "embed_tables",
    "midfusion_maxtracks_tabular",
    "midfusion_tabular",
    "modalities_tabular",
]


class EmbeddedTables(NamedTuple):
    # txt and vis are indexed by the SAME clip id, so their embeddings are
    # stored pre-concatenated: one wide gather instead of two
    clip: jnp.ndarray  # [n_clips, 2*joint] = [txt | vis]
    tr1: jnp.ndarray  # [n_tracks, joint//2]
    tr2: jnp.ndarray  # [n_tracks, joint//2]


def _two_layer(params, n1, n2, x, cdt):
    h = linear(params[n1], x, cdt)
    return linear(params[n2], jax.nn.relu(h), cdt)


def embed_tables(params: Dict, prefix: str, tables: Dict, spec) -> EmbeddedTables:
    """Per-modality MLPs over the deduplicated tables (eval: dropout = id)."""
    cdt = compute_dtype(spec)
    txt = _two_layer(params, "txt_%s" % prefix, "txt2_%s" % prefix,
                     tables["text"], cdt)
    vis = _two_layer(params, "vis_%s" % prefix, "vis2_%s" % prefix,
                     tables["visual"], cdt)
    return EmbeddedTables(
        clip=jnp.concatenate([txt, vis], axis=-1),
        tr1=_two_layer(params, "tracks1_%s" % prefix, "tracks12_%s" % prefix,
                       tables["track"], cdt),
        tr2=_two_layer(params, "tracks2_%s" % prefix, "tracks22_%s" % prefix,
                       tables["track"], cdt),
    )


def _gather_row(emb: EmbeddedTables, idx: jnp.ndarray) -> jnp.ndarray:
    """Fused row embedding for index triples idx[..., 3] -> [..., 3*joint].
    Output order [txt | vis | tr1 | tr2] is preserved by the clip concat."""
    return jnp.concatenate(
        [
            emb.clip[idx[..., 0]],
            emb.tr1[idx[..., 1]],
            emb.tr2[idx[..., 2]],
        ],
        axis=-1,
    )


def _constrain_context(x: jnp.ndarray, context_axis: Optional[str]):
    """Shard the gathered [N, R, d] intermediate over the context-clip axis
    (sequence parallelism): XLA partitions the masked-sum reduction over the
    mesh axis and inserts the psum. No-op outside a matching mesh."""
    if not context_axis:
        return x
    try:
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, P(None, context_axis, None)
        )
    except Exception:
        return x


def _pooled_ctx(
    emb: EmbeddedTables, idx: jnp.ndarray, mask: jnp.ndarray,
    guard_zero_divide: bool,
    context_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Masked mean over the context axis of gathered embeddings.

    idx: [N, R, 3]; mask: [N, R] -> [N, 3*joint]. (The pallas variant —
    ops/gather_pool.fused_ctx_pool — also folds in the divide + tanh.)
    """
    if emb.clip.dtype == jnp.int32:  # packed-bf16 tables (r4 cast policy)
        from lirec_tpu.ops.gather_pool import unpack_bf16_table

        emb = EmbeddedTables(
            clip=unpack_bf16_table(emb.clip),
            tr1=unpack_bf16_table(emb.tr1),
            tr2=unpack_bf16_table(emb.tr2),
        )
    m = mask
    divider = m.sum(axis=-1, keepdims=True)
    if guard_zero_divide:
        divider = jnp.where(divider == 0, 1.0, divider)
    w = m[..., None]

    def pool(tab, which):
        g = tab[idx[..., which]]  # [N, R, d]
        g = _constrain_context(g, context_axis)
        return (g * w.astype(g.dtype)).sum(axis=-2)

    pooled = jnp.concatenate(
        [pool(emb.clip, 0), pool(emb.tr1, 1), pool(emb.tr2, 2)],
        axis=-1,
    )
    return pooled / divider.astype(pooled.dtype)


def _ctx_branch(
    emb: EmbeddedTables,
    idx: jnp.ndarray,
    mask: jnp.ndarray,
    guard_zero_divide: bool,
    use_pallas,
    context_axis: Optional[str],
    data_mesh=None,
    data_axis: str = "data",
) -> jnp.ndarray:
    """tanh(masked-mean(pooled concat)) of the ctx branch.

    use_pallas: None = auto (the fused pallas kernel on TPU when shapes
    fit — 0.89 -> 0.58 ms/step at real dims, BENCH.md r2 ablation; the jnp
    path elsewhere), True = force the kernel, "interpret" = the kernel in
    interpreter mode (CPU tests), False = force jnp (required for
    context-axis sharding, which partitions the jnp reduction).

    data_mesh: under SPMD execution (rows of ``idx``/``mask`` sharded over
    ``data_axis`` of this mesh, tables replicated) pallas_call cannot be
    GSPMD-partitioned — instead the kernel runs per-device via
    ``jax.shard_map``: each shard pools its local rows from the replicated
    (VMEM-resident) tables; no collectives are needed because the pooled
    output is data-parallel. The surrounding program stays GSPMD.
    """
    if use_pallas is not False and not context_axis:
        from lirec_tpu.ops.gather_pool import fused_ctx_pool

        force = (
            "interpret" if use_pallas == "interpret"
            else "pallas" if use_pallas else "auto"
        )
        if data_mesh is not None:
            from jax.sharding import PartitionSpec as P

            def local_pool(emb_l, idx_l, mask_l):
                return fused_ctx_pool(
                    emb_l, idx_l, mask_l,
                    guard_zero_divide=guard_zero_divide, force=force,
                )

            return jax.shard_map(
                local_pool,
                mesh=data_mesh,
                in_specs=(P(), P(data_axis), P(data_axis)),
                out_specs=P(data_axis),
                # no collectives inside; pallas_call's out_shape carries no
                # varying-mesh-axes annotation, so the vma check must be off
                check_vma=False,
            )(emb, idx, mask)
        return fused_ctx_pool(
            emb, idx, mask, guard_zero_divide=guard_zero_divide, force=force,
        )
    return jnp.tanh(
        _pooled_ctx(
            emb, idx, mask, guard_zero_divide=guard_zero_divide,
            context_axis=context_axis,
        )
    )


def _ctx_branch_triple(
    fused: jnp.ndarray,
    tidx: jnp.ndarray,
    mask: jnp.ndarray,
    wc: int,
    wt: int,
    guard_zero_divide: bool,
    use_pallas,
    data_mesh=None,
    data_axis: str = "data",
) -> jnp.ndarray:
    """Triple-tier ctx branch: one fused-row gather per context entry.

    fused: the batch's unique [clip|tr1|tr2] rows gathered into one local
    table (models/factory.apply_model builds it from ``ctx_triples``);
    tidx: [N, R] positions into it. Identical numerics to _ctx_branch
    (same per-column adds in the same r order), 3x fewer dynamic gathers
    in the kernel (ops/gather_pool.fused_ctx_pool_triple).
    """
    from lirec_tpu.ops.gather_pool import fused_ctx_pool_triple

    force = (
        "reference" if use_pallas is False
        else "interpret" if use_pallas == "interpret"
        else "pallas" if use_pallas else "auto"
    )
    if data_mesh is not None:
        from jax.sharding import PartitionSpec as P

        def local_pool(fused_l, tidx_l, mask_l):
            return fused_ctx_pool_triple(
                fused_l, tidx_l, mask_l, wc, wt,
                guard_zero_divide=guard_zero_divide, force=force,
            )

        return jax.shard_map(
            local_pool,
            mesh=data_mesh,
            in_specs=(P(), P(data_axis), P(data_axis)),
            out_specs=P(data_axis),
            check_vma=False,
        )(fused, tidx, mask)
    return fused_ctx_pool_triple(
        fused, tidx, mask, wc, wt,
        guard_zero_divide=guard_zero_divide, force=force,
    )


def embed_all(params: Dict, spec, tables: Dict) -> Dict[str, EmbeddedTables]:
    """All branch embeddings of the tables; computed once per eval sweep
    (params are frozen during eval, so this amortizes across every batch).

    r4: on TPU the ctx tables are stored packed-bf16 (pack_bf16_table)
    whenever the session's compute dtype is already bf16 — halved table
    bytes make the fused kernel 30-40% faster at EVERY cardinality
    (same-session toy ablation 123.2k -> 168.4k clips/sec; real-split
    59.4k -> 147.6k, BENCH.md) and keep real-split tables VMEM-resident
    (f32 at 12k/24k rows is 96.0 MiB, just over the 96 MiB budget — eval
    used to drop to the ~2x-slower HBM-DMA tier). Under f32 compute the
    cast fires only when it is what restores VMEM residency
    (ctx_tables_cast_dtype), keeping precision-first sessions f32.
    The cast runs once per sweep, outside the batch loop; the kernel
    accumulates f32 in every tier. LIREC_TPU_TABLE_DTYPE=f32|bf16
    overrides.
    """
    out: Dict[str, EmbeddedTables] = {}
    if spec.ints and not spec.mod_check:
        out["ints"] = embed_tables(params, "ints", tables, spec)
    if spec.ctx:
        emb = embed_tables(params, "ctx", tables, spec)
        out["ctx"] = _maybe_cast_ctx(emb, spec)
    return out


def ctx_cast_decision(
    backend: str,
    mode: str,
    compute_is_bf16: bool,
    n_f32_bytes: int,
    dims_ok: bool,
    kernel_force: str = "auto",
):
    """Pure policy: should the ctx tables be packed-bf16? (unit-tested)"""
    if backend != "tpu" or not dims_ok:
        return False  # CPU/GPU jnp path stays bit-exact f32
    if kernel_force == "reference":
        return False  # kernel forced off: the cast would only hurt
    if mode == "f32":
        return False
    if mode == "bf16":
        return True
    if compute_is_bf16:
        return True  # perf mode: packed wins at every cardinality
    from lirec_tpu.ops.gather_pool import ctx_tables_cast_dtype

    return ctx_tables_cast_dtype(n_f32_bytes) is not None


def _maybe_cast_ctx(emb: EmbeddedTables, spec) -> EmbeddedTables:
    import os

    from lirec_tpu.models.layers import compute_dtype
    from lirec_tpu.ops.gather_pool import pack_bf16_table

    # packed halves must keep whole 128-lane tiles -> logical D % 256
    dims_ok = (
        emb.clip.shape[1] % 256 == 0 and emb.tr1.shape[1] % 256 == 0
    )
    if not ctx_cast_decision(
        jax.default_backend(),
        os.environ.get("LIREC_TPU_TABLE_DTYPE", "auto"),
        compute_dtype(spec) == jnp.bfloat16,
        (emb.clip.size + emb.tr1.size + emb.tr2.size) * 4,
        dims_ok,
        kernel_force=os.environ.get("LIREC_TPU_CTX_FORCE", "auto"),
    ):
        return emb
    return EmbeddedTables(
        clip=pack_bf16_table(emb.clip),
        tr1=pack_bf16_table(emb.tr1),
        tr2=pack_bf16_table(emb.tr2),
    )


def midfusion_maxtracks_tabular(
    params: Dict,
    spec,
    tables: Dict,
    feat_idx: jnp.ndarray,
    rels_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    embedded: Optional[Dict[str, EmbeddedTables]] = None,
    context_axis: Optional[str] = None,
    data_mesh=None,
    ctx_triple=None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """MidFusionMultiClipMaxTracks eval forward over tables.

    feat_idx: [B, T, 1+R, 3]; rels_mask: [B, T, R]. ctx_triple (optional):
    (fused local table, tidx [B, T, R], wc, wt) — the triple tier
    (_ctx_branch_triple) replaces the 3-table ctx pooling.
    """
    cdt = compute_dtype(spec)
    B, T = feat_idx.shape[0], feat_idx.shape[1]
    drop = DropoutRng(None)
    output_ints = output_ctx = None

    if spec.ints:
        emb_i = (
            embedded["ints"] if embedded else
            embed_tables(params, "ints", tables, spec)
        )
        ints_repr = jnp.tanh(
            _gather_row(emb_i, feat_idx[:, :, 0, :]).reshape(B * T, -1)
        )
        output_ints = ints_repr
    if spec.ctx:
        flat_mask = rels_mask.reshape(B * T, -1).astype(jnp.float32)
        if ctx_triple is not None:
            fused, tidx, wc, wt = ctx_triple
            output_ctx = _ctx_branch_triple(
                fused, tidx.reshape(B * T, -1), flat_mask, wc, wt, True,
                use_pallas, data_mesh=data_mesh,
            )
        else:
            emb_c = (
                embedded["ctx"] if embedded else
                embed_tables(params, "ctx", tables, spec)
            )
            flat_idx = feat_idx[:, :, 1:, :].reshape(B * T, -1, 3)
            output_ctx = _ctx_branch(
                emb_c, flat_idx, flat_mask, True, use_pallas, context_axis,
                data_mesh=data_mesh,
            )
    if spec.gates:
        output_ints = gate_apply(
            params, output_ints, output_ctx, spec, drop, deterministic=True
        )
    rels_out = (
        linear(params["out_ctx"], output_ctx, cdt).reshape(B, T, spec.n_rels)
        if spec.ctx
        else None
    )
    ints_out = (
        linear(params["out_ints"], output_ints, cdt).reshape(
            B, T, spec.n_classes
        )
        if spec.ints
        else None
    )
    return {"inters": ints_out, "rels": rels_out}


def midfusion_tabular(
    params: Dict,
    spec,
    tables: Dict,
    feat_idx: jnp.ndarray,
    rels_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    embedded: Optional[Dict[str, EmbeddedTables]] = None,
    context_axis: Optional[str] = None,
    data_mesh=None,
    ctx_triple=None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """MidFusionMultiClip eval forward over tables.

    feat_idx: [B, 1+R, 3]; rels_mask: [B, R, 1] or [B, R]. ctx_triple
    (optional): (fused local table, tidx [B, R], wc, wt) — see
    _ctx_branch_triple.
    """
    cdt = compute_dtype(spec)
    B = feat_idx.shape[0]
    drop = DropoutRng(None)
    output_ints = output_ctx = None
    if spec.ints:
        emb_i = (
            embedded["ints"] if embedded else
            embed_tables(params, "ints", tables, spec)
        )
        output_ints = jnp.tanh(_gather_row(emb_i, feat_idx[:, 0, :]))
    if spec.ctx:
        mask = rels_mask.reshape(B, -1).astype(jnp.float32)
        if ctx_triple is not None:
            fused, tidx, wc, wt = ctx_triple
            output_ctx = _ctx_branch_triple(
                fused, tidx.reshape(B, -1), mask, wc, wt, False,
                use_pallas, data_mesh=data_mesh,
            )
        else:
            emb_c = (
                embedded["ctx"] if embedded else
                embed_tables(params, "ctx", tables, spec)
            )
            output_ctx = _ctx_branch(
                emb_c, feat_idx[:, 1:, :], mask, False, use_pallas,
                context_axis, data_mesh=data_mesh,
            )
    if spec.gates:
        output_ints = gate_apply(
            params, output_ints, output_ctx, spec, drop, deterministic=True
        )
    rels_out = linear(params["out_ctx"], output_ctx, cdt) if spec.ctx else None
    ints_out = linear(params["out_ints"], output_ints, cdt) if spec.ints else None
    return {"inters": ints_out, "rels": rels_out}


def modalities_tabular(
    params: Dict, spec, tables: Dict, feat_idx: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Modalities eval forward over tables. feat_idx: [B, 1, 3] or [B, 3]."""
    cdt = compute_dtype(spec)
    if feat_idx.ndim == 3:
        feat_idx = feat_idx[:, 0, :]

    def two(n1, n2, x):
        return _two_layer(params, n1, n2, x, cdt)

    parts = []
    if spec.modality in ("m", "t"):
        txt = two("txt_ints", "txt2_ints", tables["text"])[feat_idx[..., 0]]
        parts.append(txt)
    if spec.modality in ("m", "v"):
        vis = two("vis_ints", "vis2_ints", tables["visual"])[feat_idx[..., 0]]
        parts.append(vis)
    if spec.tracks and spec.modality == "m":
        tr1 = two("tracks1_ints", "tracks12_ints", tables["track"])[
            feat_idx[..., 1]
        ]
        tr2 = two("tracks2_ints", "tracks22_ints", tables["track"])[
            feat_idx[..., 2]
        ]
        parts += [tr1, tr2]
    out = jnp.tanh(
        parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    )
    return {"inters": linear(params["out_ints"], out, cdt)}
