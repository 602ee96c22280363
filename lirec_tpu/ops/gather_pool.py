"""Pallas TPU kernel: masked gather-sum over a VMEM-resident table.

    out[m, :] = sum_r mask[m, r] * table[idx[m, r], :]

This is the hot access pattern of the embed-then-gather eval path
(models/tabular.py): each (sample, hypothesis) pools up to 18 context-clip
embeddings. XLA lowers the equivalent ``table[idx]`` gather through HBM; the
kernel instead keeps the (small, deduplicated) embedding table resident in
VMEM and walks it with dynamic slices, with indices scalar-prefetched into
SMEM (pallas_guide: PrefetchScalarGridSpec).

`gather_masked_sum` dispatches to the kernel on TPU and to a pure-jnp
fallback elsewhere (or when shapes don't meet the tiling constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["gather_masked_sum", "gather_masked_sum_reference"]

TILE_M = 8  # f32 sublane count


def gather_masked_sum_reference(
    table: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """jnp fallback: [N, D], [M, R], [M, R] -> [M, D]."""
    g = table[idx]  # [M, R, D]
    return (g * mask[..., None].astype(g.dtype)).sum(axis=-2)


def _make_kernel(r_count: int):
    def _kernel(idx_ref, mask_ref, table_ref, out_ref):
        """One grid step computes TILE_M pooled rows.

        idx_ref:  SMEM [M*R] flat (scalar-prefetched; 1-D to dodge SMEM
                  lane padding — 2-D scalar arrays pad the last dim to 128)
        mask_ref: SMEM [M*R] flat (dynamic scalar reads must come from SMEM)
        table_ref:VMEM [N, D] (full table, resident)
        out_ref:  VMEM [TILE_M, D]
        """
        from jax.experimental import pallas as pl

        tile = pl.program_id(0)

        def row_body(m, _):
            base = (tile * TILE_M + m) * r_count

            def ctx_body(r, acc):
                row = table_ref[idx_ref[base + r], :]
                return acc + mask_ref[base + r] * row

            acc = jax.lax.fori_loop(
                0,
                r_count,
                ctx_body,
                jnp.zeros((table_ref.shape[1],), table_ref.dtype),
            )
            out_ref[m, :] = acc
            return 0

        jax.lax.fori_loop(0, TILE_M, row_body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_call(table, idx, mask, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, R = idx.shape
    N, D = table.shape
    grid = (M // TILE_M,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idx, mask
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_kernel(R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, D), table.dtype),
        interpret=interpret,
    )(idx.reshape(-1), mask.astype(table.dtype).reshape(-1), table)


def _supported(table, idx) -> bool:
    N, D = table.shape
    M = idx.shape[0]
    vmem_bytes = (N * D + TILE_M * idx.shape[1] + TILE_M * D) * table.dtype.itemsize
    return (
        M % TILE_M == 0
        and D % 128 == 0
        and vmem_bytes < 12 * 1024 * 1024
    )


def gather_masked_sum(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    mask: jnp.ndarray,
    force: str = "auto",
) -> jnp.ndarray:
    """Dispatch: pallas on TPU when shapes fit, jnp fallback otherwise.

    force: 'auto' | 'pallas' | 'reference' | 'interpret'
    """
    table = jnp.asarray(table)
    idx = jnp.asarray(idx, jnp.int32)
    mask = jnp.asarray(mask)
    if force == "reference":
        return gather_masked_sum_reference(table, idx, mask)
    if force in ("interpret", "pallas") and not _supported(table, idx):
        raise ValueError(
            "gather_masked_sum kernel requires M %% %d == 0, D %% 128 == 0 "
            "and the table to fit VMEM; got table %s, idx %s"
            % (TILE_M, table.shape, idx.shape)
        )
    if force == "interpret":
        return _pallas_call(table, idx, mask, interpret=True)
    on_tpu = jax.default_backend() == "tpu"
    if force == "pallas" or (force == "auto" and on_tpu and _supported(table, idx)):
        return _pallas_call(table, idx, mask)
    return gather_masked_sum_reference(table, idx, mask)
