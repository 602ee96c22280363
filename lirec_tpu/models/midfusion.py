"""Mid-fusion multi-clip models (ref `mlp/model.py:95-354`).

`midfusion_forward` = MidFusionMultiClip: GT-row ints branch + masked-mean
context branch over 18 clips + gated fusion + heads.

`midfusion_maxtracks_forward` = MidFusionMultiClipMaxTracks: the same
computation batched over the 20 track-pair hypotheses.

Both are pure functions; the reference's per-slice `.cuda()` copies inside
forward (ref model.py:280-318) disappear — inputs are already device-resident.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.models.blocks import (
    FeatSlices,
    gate_apply,
    init_gate,
    init_modality_mlps,
    modality_embed,
)
from lirec_tpu.models.layers import compute_dtype, DropoutRng, dropout, init_linear, linear

__all__ = ["init_midfusion", "midfusion_forward", "midfusion_maxtracks_forward"]


def init_midfusion(key: jax.Array, spec) -> Dict:
    """Parameters for both MidFusion variants (same names/shapes)."""
    keys = jax.random.split(key, 5)
    params: Dict = {}
    out_dim_ints = spec.joint_dim * 3
    if spec.ints:
        params.update(init_modality_mlps(keys[0], spec, "ints"))
    if spec.ctx:
        params.update(init_modality_mlps(keys[1], spec, "ctx"))
    if spec.gates:
        out_dim_ints = spec.gate_out_dim
        params.update(init_gate(keys[2], spec))
    if spec.ints:
        params["out_ints"] = init_linear(keys[3], out_dim_ints, spec.n_classes)
    if spec.ctx:
        params["out_ctx"] = init_linear(
            keys[4], spec.joint_dim * 3, spec.n_rels
        )
    return params


def _ctx_branch(
    params: Dict,
    ctx_slices: FeatSlices,
    rels_mask: jnp.ndarray,
    spec,
    drop: DropoutRng,
    deterministic: bool,
    guard_zero_divide: bool,
) -> jnp.ndarray:
    """Per-clip MLPs then masked mean over the context-clip axis
    (ref model.py:173-199 / 300-327).

    ctx_slices: [N, R, dim]; rels_mask: [N, R] float.
    """
    embedded = modality_embed(
        params, "ctx", ctx_slices, spec, drop, deterministic
    )  # [N, R, 3*joint]
    mask = rels_mask[..., None].astype(embedded.dtype)
    divider = mask.sum(axis=-2)  # [N, 1]
    if guard_zero_divide:
        # only the MaxTracks variant guards empty contexts (ref model.py:303)
        divider = jnp.where(divider == 0, 1.0, divider)
    pooled = (embedded * mask).sum(axis=-2) / divider
    return dropout(jnp.tanh(pooled), spec.dropout, drop, deterministic)


def midfusion_forward(
    params: Dict,
    spec,
    s: FeatSlices,
    rels_mask: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """MidFusionMultiClip. s: [B, 1+R, dim] slices (row 0 = GT clip);
    rels_mask: [B, R]. Returns {'inters': [B, C], 'rels': [B, n_rels]}."""
    drop = DropoutRng(rng)
    cdt = compute_dtype(spec)
    output_ints = output_ctx = None

    if spec.ints:
        ints_repr = modality_embed(
            params, "ints", s.index(slice(None), 0), spec, drop, deterministic
        )
        output_ints = dropout(
            jnp.tanh(ints_repr), spec.dropout, drop, deterministic
        )
    if spec.ctx:
        output_ctx = _ctx_branch(
            params,
            s.index(slice(None), slice(1, None)),
            rels_mask.reshape(rels_mask.shape[0], -1),
            spec,
            drop,
            deterministic,
            guard_zero_divide=False,
        )
    if spec.gates:
        output_ints = gate_apply(
            params, output_ints, output_ctx, spec, drop, deterministic
        )
    rels_out = (
        linear(params["out_ctx"], output_ctx, cdt) if spec.ctx else None
    )
    ints_out = (
        linear(params["out_ints"], output_ints, cdt) if spec.ints else None
    )
    return {"inters": ints_out, "rels": rels_out}


def midfusion_maxtracks_forward(
    params: Dict,
    spec,
    s: FeatSlices,
    rels_mask: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """MidFusionMultiClipMaxTracks. s: [B, T, 1+R, dim] (ctx on) or
    [B, T, 1, dim] (ctx off); rels_mask: [B, T, R].
    Returns {'inters': [B, T, C], 'rels': [B, T, n_rels] or None}."""
    drop = DropoutRng(rng)
    cdt = compute_dtype(spec)
    batch, n_tracks = s.text.shape[0], s.text.shape[1]
    flat = FeatSlices(*(a.reshape((batch * n_tracks,) + a.shape[2:]) for a in s))
    output_ints = output_ctx = None

    if spec.ints:
        ints_repr = modality_embed(
            params, "ints", flat.index(slice(None), 0), spec, drop, deterministic
        )
        output_ints = dropout(
            jnp.tanh(ints_repr), spec.dropout, drop, deterministic
        )
    if spec.ctx:
        output_ctx = _ctx_branch(
            params,
            flat.index(slice(None), slice(1, None)),
            rels_mask.reshape(batch * n_tracks, -1),
            spec,
            drop,
            deterministic,
            guard_zero_divide=True,
        )
    if spec.gates:
        output_ints = gate_apply(
            params, output_ints, output_ctx, spec, drop, deterministic
        )
    rels_out = None
    if spec.ctx:
        rels_out = linear(params["out_ctx"], output_ctx, cdt).reshape(
            batch, n_tracks, spec.n_rels
        )
    ints_out = None
    if spec.ints:
        ints_out = linear(params["out_ints"], output_ints, cdt).reshape(
            batch, n_tracks, spec.n_classes
        )
    return {"inters": ints_out, "rels": rels_out}
