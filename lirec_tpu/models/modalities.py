"""Modality-check interaction model (ref `mlp/model.py:19-92`).

Per-modality 2-layer MLPs on the GT feature row, concatenated, tanh +
dropout, linear head. Modality subsets ('m'|'t'|'v') and the optional track
branch mirror the reference flags.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lirec_tpu.models.blocks import FeatSlices
from lirec_tpu.models.layers import compute_dtype, DropoutRng, dropout, init_linear, linear

__all__ = ["init_modalities", "modalities_forward"]


def init_modalities(key: jax.Array, spec) -> Dict:
    keys = jax.random.split(key, 16)
    j = spec.joint_dim
    params: Dict = {}
    out_dim = 0
    if spec.modality in ("m", "t"):
        params["txt_ints"] = init_linear(keys[0], spec.text_dim, j)
        params["txt2_ints"] = init_linear(keys[1], j, j)
        out_dim += j
    if spec.modality in ("m", "v"):
        params["vis_ints"] = init_linear(keys[2], spec.visual_dim, j)
        params["vis2_ints"] = init_linear(keys[3], j, j)
        out_dim += j
    if spec.tracks:
        params["tracks1_ints"] = init_linear(keys[4], spec.track_dim, j)
        params["tracks2_ints"] = init_linear(keys[5], spec.track_dim, j)
        params["tracks12_ints"] = init_linear(keys[6], j, j // 2)
        params["tracks22_ints"] = init_linear(keys[7], j, j // 2)
        out_dim += j
    params["out_ints"] = init_linear(keys[8], out_dim, spec.n_classes)
    return params


def modalities_forward(
    params: Dict,
    spec,
    s: FeatSlices,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """s: GT-row slices with leading batch dims [B]. Returns {'inters': [B, C]}."""
    drop = DropoutRng(rng)
    p = spec.dropout
    cdt = compute_dtype(spec)

    def two_layer(n1, n2, x):
        h = linear(params[n1], x, cdt)
        h = jax.nn.relu(dropout(h, p, drop, deterministic))
        return linear(params[n2], h, cdt)

    parts = []
    txt = vis = None
    if spec.modality in ("m", "t"):
        txt = two_layer("txt_ints", "txt2_ints", s.text)
    if spec.modality in ("m", "v"):
        vis = two_layer("vis_ints", "vis2_ints", s.visual)
    if spec.tracks:
        tr1 = two_layer("tracks1_ints", "tracks12_ints", s.track1)
        tr2 = two_layer("tracks2_ints", "tracks22_ints", s.track2)

    if spec.modality == "m":
        parts = [txt, vis] + ([tr1, tr2] if spec.tracks else [])
        out = jnp.concatenate(parts, axis=-1)
    elif spec.modality == "t":
        out = txt
    else:
        out = vis

    out = dropout(jnp.tanh(out), p, drop, deterministic)
    return {"inters": linear(params["out_ints"], out, cdt)}
