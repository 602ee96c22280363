"""Gather-free row selects: iota-compare + select + reduce.

``jnp.take_along_axis`` with one index per row lowers to an XLA gather
whose TPU issue rate is one row per cycle-ish — the r5 sweep trace showed
the four loss/metric selects costing ~50 us/batch at real-split scale,
all scalar-gather-issue-bound (the same disease as the ctx kernel's
single-row VMEM gathers). For small selected axes (C=101 classes, R=16
rels, T=18 hypothesis slots) a broadcasted-iota compare + ``where`` +
reduce touches the same bytes the surrounding elementwise work already
touches, fuses into it, and runs on the VPU with no gather at all. The
VJP is a dense masked broadcast — no scatter in the backward either
(``take_along_axis``'s VJP is a scatter-add), which is why the train
path uses it too.

Exactness: exactly one element per output row survives the ``where``
(the reduce adds zeros to it), so the result is bit-identical to the
gather for every finite and non-finite input value — including the
``-inf`` the losses mask with (never multiply a one-hot into ``-inf``:
``0 * -inf`` is NaN). The single caveat: a selected ``-0.0`` comes back
as ``+0.0``. Out-of-range indices clamp, matching ``take_along_axis``'s
default "clip" mode.

Ref parity: these implement the ``x[..., idx]`` column lookups of the
reference losses (mlp/model.py:427-439, 462-486, 524-575) and eval
metrics (utils/evaluation.py:199-235).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["select_along_axis"]


def select_along_axis(x: jnp.ndarray, idx: jnp.ndarray, axis: int):
    """``take_along_axis(x, expand_dims(idx, axis), axis)`` squeezed, as a
    compare+select+reduce.

    ``idx`` must broadcast against ``x``'s shape with ``axis`` removed
    (one selected element per output position). Returns ``x``'s dtype
    and that reduced shape.
    """
    axis = axis % x.ndim
    k = x.shape[axis]
    idx = jnp.clip(idx.astype(jnp.int32), 0, k - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    sel = cols == jnp.expand_dims(idx, axis)
    return jnp.where(sel, x, jnp.zeros((), x.dtype)).sum(axis=axis)
