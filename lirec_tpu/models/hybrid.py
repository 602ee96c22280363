"""Hybrid packed forward: table-level first layers, per-use second layers.

In every modality MLP the reference applies dropout AFTER the first linear
(``linear1 -> dropout -> relu -> linear2``, ref mlp/model.py:154-167), so
the first-layer GEMM — the expensive one, consuming the 768/2048-wide raw
features — can be computed ONCE per unique table row and gathered, even in
TRAINING. Only dropout/relu/linear2 run per (sample, hypothesis, clip).

This is exact, including the dropout masks: the gathered first-layer
activations have the same shape/order as the old gather-then-embed path, so
the same PRNG stream produces identical masks (verified by test).

In the ctx branch the second layers additionally move AFTER the masked
mean over the clip axis (``_pooled_ctx_from_h1``): linear2 commutes with
the pool, so its matmuls run on [N, joint] pooled rows instead of
[N*R, joint] per-clip rows — an R(=18)-fold cut of the branch's dominant
FLOPs in forward and backward, with the dropout stream untouched.

FLOP effect at real dims: per-use work drops from ~8.7 MFLOP/row to
~1.6 MFLOP/row in the ctx branch with table-level first layers, and the
remaining per-clip work is dropout/relu/pool only.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.models.blocks import gate_apply
from lirec_tpu.models.layers import compute_dtype, DropoutRng, dropout, linear

__all__ = ["project_tables", "midfusion_hybrid", "midfusion_maxtracks_hybrid",
           "modalities_hybrid"]


class H1Tables(NamedTuple):
    """First-layer activations of the feature tables, per branch.

    txt and vis are indexed by the SAME clip id, so their activations are
    stored pre-concatenated: one wide gather (and ONE backward scatter-add)
    instead of two — the same layout trick as the eval path's
    EmbeddedTables.clip. Under bf16 compute the activations are stored
    bf16: the second-layer matmuls consume bf16 anyway, and halving the
    gather/scatter/residual bytes is the train step's dominant traffic.
    """

    clip: jnp.ndarray  # [n_clips, 2*joint] = [txt | vis]
    tr1: jnp.ndarray  # [n_tracks, joint]
    tr2: jnp.ndarray  # [n_tracks, joint]


def project_tables(params: Dict, prefix: str, tables: Dict, spec) -> H1Tables:
    cdt = compute_dtype(spec)

    def act(h):
        return h if cdt is None else h.astype(cdt)

    return H1Tables(
        clip=act(jnp.concatenate(
            [
                linear(params["txt_%s" % prefix], tables["text"], cdt),
                linear(params["vis_%s" % prefix], tables["visual"], cdt),
            ],
            axis=-1,
        )),
        tr1=act(linear(params["tracks1_%s" % prefix], tables["track"], cdt)),
        tr2=act(linear(params["tracks2_%s" % prefix], tables["track"], cdt)),
    )


def _embed_from_h1(
    params: Dict, prefix: str, h1: H1Tables, idx: jnp.ndarray, spec,
    rng: DropoutRng, deterministic: bool,
) -> jnp.ndarray:
    """Gather first-layer rows for idx[..., 3], then dropout -> relu ->
    second layers, concatenated (same output as blocks.modality_embed)."""
    p = spec.dropout
    cdt = compute_dtype(spec)
    joint = spec.joint_dim

    def second(name, h):
        h = jax.nn.relu(dropout(h, p, rng, deterministic))
        return linear(params[name], h, cdt)

    # NOTE: dropout call order and shapes match blocks.modality_embed
    # (txt, vis, tr1, tr2 — each [., joint]) so the DropoutRng stream
    # lines up with the non-hybrid path even though txt|vis arrive in one
    # gathered row.
    clip = h1.clip[idx[..., 0]]
    txt = second("txt2_%s" % prefix, clip[..., :joint])
    vis = second("vis2_%s" % prefix, clip[..., joint:])
    tr1 = second("tracks12_%s" % prefix, h1.tr1[idx[..., 1]])
    tr2 = second("tracks22_%s" % prefix, h1.tr2[idx[..., 2]])
    return jnp.concatenate([txt, vis, tr1, tr2], axis=-1)


def _pooled_ctx_from_h1(
    params: Dict, prefix: str, h1: H1Tables, idx: jnp.ndarray,
    mask: jnp.ndarray, spec, rng: DropoutRng, deterministic: bool,
    guard_zero_divide: bool, scatter_kernel: bool = True,
    data_mesh=None,
) -> jnp.ndarray:
    """ctx branch with the second layers applied AFTER the masked mean.

    linear2 commutes with the masked mean over the clip axis: pooling the
    per-clip second-layer outputs equals applying the second layer once to
    the pooled relu activations, with the bias scaled by mask_sum/divider
    (1 for any non-empty context, 0 for an empty guarded one, inf/nan
    propagation unchanged for the unguarded reference divider, ref
    mlp/model.py:174-181). The dropout calls keep the exact shapes and
    order of ``_embed_from_h1`` (txt, vis, tr1, tr2 on [N, R, joint]) so
    the PRNG mask stream is bit-identical; only the second-layer matmuls
    shrink from [N*R, joint] to [N, joint] rows — an R-fold cut of the ctx
    branch's dominant FLOPs in forward and backward. The pool itself is a
    batched contraction with f32 accumulation (MXU), not a bf16 tree sum.
    """
    p = spec.dropout
    cdt = compute_dtype(spec)
    joint = spec.joint_dim

    m = mask.astype(jnp.float32)                       # [N, R]
    msum = m.sum(axis=1, keepdims=True)                # [N, 1]
    divider = jnp.where(msum == 0, 1.0, msum) if guard_zero_divide else msum
    bias_scale = msum / divider                        # [N, 1] of 1s/0s

    def pooled(h):
        h = jax.nn.relu(dropout(h, p, rng, deterministic))
        s = jnp.einsum(
            "nrj,nr->nj", h, m.astype(h.dtype),
            preferred_element_type=jnp.float32,
        )
        return s / divider

    def second(name, ph):
        prm = params[name]
        kernel = prm["kernel"]
        if cdt is not None:
            ph, kernel = ph.astype(cdt), kernel.astype(cdt)
        y = jnp.dot(ph, kernel, preferred_element_type=jnp.float32)
        return y + prm["bias"].astype(y.dtype) * bias_scale.astype(y.dtype)

    # gather with the pallas scatter-accumulate VJP: a profiled train step
    # spends 1.3 ms/step in XLA's three table-grad scatters at these
    # shapes (BENCH.md r3b trace) — the kernel does them in ~0.8 with f32
    # accumulation. CPU and unsupported shapes fall back to XLA's scatter.
    if scatter_kernel:
        from lirec_tpu.ops.scatter_accum import gather_h1

        # with a mesh the backward runs per-shard under shard_map and
        # psums the partial table grads (no GSPMD rule for pallas)
        clip, g_tr1, g_tr2 = gather_h1(
            h1.clip, h1.tr1, h1.tr2, idx, mesh=data_mesh
        )
    else:
        clip = h1.clip[idx[..., 0]]
        g_tr1 = h1.tr1[idx[..., 1]]
        g_tr2 = h1.tr2[idx[..., 2]]
    txt = second("txt2_%s" % prefix, pooled(clip[..., :joint]))
    vis = second("vis2_%s" % prefix, pooled(clip[..., joint:]))
    tr1 = second("tracks12_%s" % prefix, pooled(g_tr1))
    tr2 = second("tracks22_%s" % prefix, pooled(g_tr2))
    return jnp.concatenate([txt, vis, tr1, tr2], axis=-1)


def midfusion_maxtracks_hybrid(
    params: Dict,
    spec,
    tables: Dict,
    feat_idx: jnp.ndarray,
    rels_mask: Optional[jnp.ndarray] = None,
    deterministic: bool = False,
    rng: Optional[jax.Array] = None,
    scatter_kernel: bool = True,
    data_mesh=None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """MidFusionMultiClipMaxTracks over packed batches, hybrid layering.

    feat_idx: [B, T, 1+R, 3] (ctx on) or [B, T, 1, 3]; rels_mask [B, T, R].
    """
    cdt = compute_dtype(spec)
    drop = DropoutRng(rng)
    B, T = feat_idx.shape[0], feat_idx.shape[1]
    output_ints = output_ctx = None

    if spec.ints:
        h1 = project_tables(params, "ints", tables, spec)
        ints_repr = _embed_from_h1(
            params, "ints", h1, feat_idx[:, :, 0, :].reshape(B * T, 3),
            spec, drop, deterministic,
        )
        output_ints = dropout(
            jnp.tanh(ints_repr), spec.dropout, drop, deterministic
        )
    if spec.ctx:
        h1c = project_tables(params, "ctx", tables, spec)
        R = feat_idx.shape[2] - 1
        flat_idx = feat_idx[:, :, 1:, :].reshape(B * T, R, 3)
        pooled = _pooled_ctx_from_h1(
            params, "ctx", h1c, flat_idx, rels_mask.reshape(B * T, R),
            spec, drop, deterministic, guard_zero_divide=True,
            scatter_kernel=scatter_kernel, data_mesh=data_mesh,
        )
        output_ctx = dropout(
            jnp.tanh(pooled), spec.dropout, drop, deterministic
        )
    if spec.gates:
        output_ints = gate_apply(
            params, output_ints, output_ctx, spec, drop, deterministic
        )
    rels_out = None
    if spec.ctx:
        rels_out = linear(params["out_ctx"], output_ctx, cdt).reshape(
            B, T, spec.n_rels
        )
    ints_out = None
    if spec.ints:
        ints_out = linear(params["out_ints"], output_ints, cdt).reshape(
            B, T, spec.n_classes
        )
    return {"inters": ints_out, "rels": rels_out}


def midfusion_hybrid(
    params: Dict,
    spec,
    tables: Dict,
    feat_idx: jnp.ndarray,
    rels_mask: Optional[jnp.ndarray] = None,
    deterministic: bool = False,
    rng: Optional[jax.Array] = None,
    scatter_kernel: bool = True,
    data_mesh=None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """MidFusionMultiClip over packed batches, hybrid layering.

    feat_idx: [B, 1+R, 3]; rels_mask: [B, R] or [B, R, 1].
    """
    cdt = compute_dtype(spec)
    drop = DropoutRng(rng)
    B = feat_idx.shape[0]
    output_ints = output_ctx = None
    if spec.ints:
        h1 = project_tables(params, "ints", tables, spec)
        ints_repr = _embed_from_h1(
            params, "ints", h1, feat_idx[:, 0, :], spec, drop, deterministic
        )
        output_ints = dropout(
            jnp.tanh(ints_repr), spec.dropout, drop, deterministic
        )
    if spec.ctx:
        h1c = project_tables(params, "ctx", tables, spec)
        R = feat_idx.shape[1] - 1
        pooled = _pooled_ctx_from_h1(
            params, "ctx", h1c, feat_idx[:, 1:, :], rels_mask.reshape(B, R),
            spec, drop, deterministic,
            guard_zero_divide=False,  # no zero guard (ref model.py:174-181)
            scatter_kernel=scatter_kernel, data_mesh=data_mesh,
        )
        output_ctx = dropout(
            jnp.tanh(pooled), spec.dropout, drop, deterministic
        )
    if spec.gates:
        output_ints = gate_apply(
            params, output_ints, output_ctx, spec, drop, deterministic
        )
    rels_out = linear(params["out_ctx"], output_ctx, cdt) if spec.ctx else None
    ints_out = linear(params["out_ints"], output_ints, cdt) if spec.ints else None
    return {"inters": ints_out, "rels": rels_out}


def modalities_hybrid(
    params: Dict,
    spec,
    tables: Dict,
    feat_idx: jnp.ndarray,
    deterministic: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Modalities over packed batches, hybrid layering. feat_idx [B, 1, 3]."""
    cdt = compute_dtype(spec)
    drop = DropoutRng(rng)
    p = spec.dropout
    if feat_idx.ndim == 3:
        feat_idx = feat_idx[:, 0, :]

    def branch(n1, n2, table, which):
        h = linear(params[n1], table, cdt)[feat_idx[..., which]]
        h = jax.nn.relu(dropout(h, p, drop, deterministic))
        return linear(params[n2], h, cdt)

    parts = []
    if spec.modality in ("m", "t"):
        parts.append(branch("txt_ints", "txt2_ints", tables["text"], 0))
    if spec.modality in ("m", "v"):
        parts.append(branch("vis_ints", "vis2_ints", tables["visual"], 0))
    if spec.tracks:
        # computed whenever tracks are on — even for 't'/'v', where the
        # result is discarded — to keep the DropoutRng stream aligned with
        # the dense path (ref model.py:70-76 computes the branch too)
        tr1 = branch("tracks1_ints", "tracks12_ints", tables["track"], 1)
        tr2 = branch("tracks2_ints", "tracks22_ints", tables["track"], 2)
        if spec.modality == "m":
            parts += [tr1, tr2]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    out = dropout(jnp.tanh(out), p, drop, deterministic)
    return {"inters": linear(params["out_ints"], out, cdt)}
