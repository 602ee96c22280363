"""Shared model building blocks.

The fused feature row never materializes as one ``[..., 6912]`` array on
device: models consume a `FeatSlices` of per-modality arrays (text, visual,
track1, track2), which the packed data path gathers straight from the
deduplicated feature tables (see data/dataset.py) and the dense path slices
from reference-layout rows.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from lirec_tpu.models.layers import compute_dtype, DropoutRng, dropout, init_linear, linear

__all__ = ["FeatSlices", "slices_from_dense",
           "init_modality_mlps", "modality_embed", "gate_apply", "init_gate"]


class FeatSlices(NamedTuple):
    text: jnp.ndarray  # [..., text_dim]
    visual: jnp.ndarray  # [..., visual_dim]
    track1: jnp.ndarray  # [..., track_dim]
    track2: jnp.ndarray  # [..., track_dim]

    def index(self, *idx) -> "FeatSlices":
        return FeatSlices(*(a[idx] for a in self))


def slices_from_dense(features: jnp.ndarray, spec) -> FeatSlices:
    """Split a reference-layout row [text | visual | track1 | track2]."""
    t, v, k = spec.text_dim, spec.visual_dim, spec.track_dim
    return FeatSlices(
        text=features[..., :t],
        visual=features[..., t : t + v],
        track1=features[..., t + v : t + v + k],
        track2=features[..., t + v + k :],
    )


def init_modality_mlps(key: jax.Array, spec, prefix: str) -> Dict:
    """Two-layer per-modality MLPs (ref mlp/model.py:103-113 naming)."""
    keys = jax.random.split(key, 8)
    j = spec.joint_dim
    return {
        "txt_%s" % prefix: init_linear(keys[0], spec.text_dim, j),
        "txt2_%s" % prefix: init_linear(keys[1], j, j),
        "vis_%s" % prefix: init_linear(keys[2], spec.visual_dim, j),
        "vis2_%s" % prefix: init_linear(keys[3], j, j),
        "tracks1_%s" % prefix: init_linear(keys[4], spec.track_dim, j),
        "tracks2_%s" % prefix: init_linear(keys[5], spec.track_dim, j),
        "tracks12_%s" % prefix: init_linear(keys[6], j, j // 2),
        "tracks22_%s" % prefix: init_linear(keys[7], j, j // 2),
    }


def modality_embed(
    params: Dict,
    prefix: str,
    s: FeatSlices,
    spec,
    rng: DropoutRng,
    deterministic: bool,
) -> jnp.ndarray:
    """linear -> dropout -> relu -> linear per modality, concatenated
    [txt j | vis j | tr1 j/2 | tr2 j/2] (ref mlp/model.py:152-169)."""
    p = spec.dropout
    cdt = compute_dtype(spec)

    def two_layer(name1, name2, x):
        h = linear(params[name1], x, cdt)
        h = jax.nn.relu(dropout(h, p, rng, deterministic))
        return linear(params[name2], h, cdt)

    txt = two_layer("txt_%s" % prefix, "txt2_%s" % prefix, s.text)
    vis = two_layer("vis_%s" % prefix, "vis2_%s" % prefix, s.visual)
    tr1 = two_layer("tracks1_%s" % prefix, "tracks12_%s" % prefix, s.track1)
    tr2 = two_layer("tracks2_%s" % prefix, "tracks22_%s" % prefix, s.track2)
    return jnp.concatenate([txt, vis, tr1, tr2], axis=-1)


def init_gate(key: jax.Array, spec) -> Dict:
    """GatingUnit fc (ref mlp/model.py:342-354)."""
    return {
        "gates_ints": init_linear(
            key, spec.joint_dim * 6, spec.gate_out_dim
        )
    }


def gate_apply(
    params: Dict,
    ints_repr: jnp.ndarray,
    ctx_repr: jnp.ndarray,
    spec,
    rng: DropoutRng,
    deterministic: bool,
) -> jnp.ndarray:
    """cat(ctx, ints) -> linear -> relu -> dropout (ref mlp/model.py:349-354)."""
    cdt = compute_dtype(spec)
    fused = jnp.concatenate([ctx_repr, ints_repr], axis=-1)
    out = jax.nn.relu(linear(params["gates_ints"], fused, cdt))
    return dropout(out, spec.dropout, rng, deterministic)
