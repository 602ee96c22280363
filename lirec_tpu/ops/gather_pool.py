"""Pallas TPU kernel: masked gather-sum over a VMEM-resident table.

    out[m, :] = sum_r mask[m, r] * table[idx[m, r], :]

This is the hot access pattern of the embed-then-gather eval path
(models/tabular.py): each (sample, hypothesis) pools up to 18 context-clip
embeddings. XLA lowers the equivalent ``table[idx]`` gather through HBM; the
kernel instead keeps the (small, deduplicated) embedding table resident in
VMEM and walks it with dynamic slices; indices live in SMEM — per-tile
SMEM blocks for the fused kernel (batch-size independent, r4), whole-array
scalar prefetch (PrefetchScalarGridSpec) for the single-table variant.

`gather_masked_sum` dispatches to the kernel on TPU and to a pure-jnp
fallback elsewhere (or when shapes don't meet the tiling constraints).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "gather_masked_sum",
    "gather_masked_sum_reference",
    "fused_ctx_pool",
    "fused_ctx_pool_triple",
    "unpack_fused_table",
    "last_dispatch",
    "ctx_tables_cast_dtype",
    "pack_bf16_table",
    "unpack_bf16_table",
    "matmul_pool_estimate_us",
]

TILE_M = 8  # f32 sublane count

# v5e VMEM is 128 MiB; leave room for output tiles + pipelining
VMEM_TABLE_BUDGET = 96 * 1024 * 1024

from lirec_tpu.ops.dispatch import last_dispatch  # noqa: F401 (re-export)
from lirec_tpu.ops.dispatch import record as _record_dispatch


def ctx_tables_cast_dtype(n_f32_bytes: int):
    """Table-dtype policy for the fused ctx kernel (r4).

    At real-split cardinality the f32 embedded tables (~101 MB at 12k clip
    / 24k track rows) just exceed the VMEM-residency budget and eval used
    to drop to the HBM-DMA tier (~2x slower: per-row DMA issue overhead).
    Cast to bf16 when — and only when — that cast is what brings the
    tables back under the budget; accumulation stays f32 inside the
    kernel, so only the stored h1 activations lose precision (the same
    trade the train path already makes: BENCH.md r3 'bf16 h1').
    Returns the dtype to cast to, or None (keep f32).

    NB: "bf16 tables" are physically stored int32-PACKED (pack_bf16_table)
    — Mosaic cannot gather dynamic single rows of a 16-bit VMEM array
    (2 rows/sublane tiling: "cannot statically prove that index in
    dimension 0 is a multiple of 8", measured on v5e), so columns
    (d, d + D/2) ride one 32-bit word and the kernel unpacks with
    shift/mask + bitcast (tools/probe_bf16_pack.py: bit-exact vs the
    bf16 reference on the chip).
    """
    if n_f32_bytes < VMEM_TABLE_BUDGET:
        return None  # f32 tier already fits — keep bit-exact tables
    if n_f32_bytes // 2 < VMEM_TABLE_BUDGET:
        return jnp.bfloat16
    return None  # even bf16 won't fit: the HBM tier handles it


def pack_bf16_table(t: jnp.ndarray) -> jnp.ndarray:
    """f32/bf16 [N, D] -> int32 [N, D/2]: word d = bf16 bits of column d
    (low 16) | bf16 bits of column d + D/2 (high 16). The halves-based
    pairing keeps the unpacked column order natural: lo block = columns
    [0, D/2), hi block = [D/2, D) — no post-permutation anywhere."""
    b = t.astype(jnp.bfloat16)
    n, d = b.shape
    pair = jnp.stack([b[:, : d // 2], b[:, d // 2 :]], axis=-1)
    return jax.lax.bitcast_convert_type(pair, jnp.int32)


def unpack_bf16_table(t: jnp.ndarray) -> jnp.ndarray:
    """int32 [N, Dh] -> f32 [N, 2*Dh] (inverse of pack_bf16_table,
    modulo the bf16 rounding already applied at pack time)."""
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(t, 16), jnp.float32
    )
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(t, jnp.int32(-65536)), jnp.float32
    )
    return jnp.concatenate([lo, hi], axis=-1)


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


def _make_fused_kernel(r_count: int, d_clip: int, d_tr: int,
                       tile_m: int = TILE_M):
    def _kernel(idx_ref, mask_ref, clip_ref, tr1_ref, tr2_ref, out_ref):
        """One grid step computes TILE_M fused tanh(pooled-concat) rows.

        idx_ref:  SMEM [1, 1, TILE_M*R*3] per-tile index triples (blocked —
                  r4: the r2/r3 version scalar-prefetched ALL M*R*3
                  indices into SMEM, whose 1 MiB capacity gated the kernel
                  off above M*73*4 bytes ~ B=192 at R=18: the B=256 eval
                  throughput silently HALVED. Per-tile SMEM blocks remove
                  the M term from the residency requirement entirely.)
        mask_ref: SMEM [1, 1, TILE_M*(R+1)]: per row, R mask + 1/div
        clip_ref: VMEM [Nc, d_clip]; tr1/tr2_ref: VMEM [Nt, d_tr]
        out_ref:  VMEM [TILE_M, d_clip + 2*d_tr]
        """
        # Both loops are FULLY UNROLLED (static trip counts: tile_m x
        # r_count): fori_loop carries serialize the accumulator chain and
        # block Mosaic's software pipelining — unrolling measured 0.41 ->
        # 0.23 ms/call at real dims (BENCH.md r2 ablation).
        # f32 accumulation regardless of table dtype (tables may be bf16
        # under the r4 cast policy — ctx_tables_cast_dtype)
        for m in range(tile_m):
            base = m * r_count * 3
            mbase = m * (r_count + 1)
            acc_c = jnp.zeros((d_clip,), jnp.float32)
            acc_1 = jnp.zeros((d_tr,), jnp.float32)
            acc_2 = jnp.zeros((d_tr,), jnp.float32)
            for r in range(r_count):
                w = mask_ref[0, 0, mbase + r]  # f32 SMEM scalar
                acc_c = acc_c + w * clip_ref[idx_ref[0, 0, base + r * 3], :].astype(jnp.float32)
                acc_1 = acc_1 + w * tr1_ref[idx_ref[0, 0, base + r * 3 + 1], :].astype(jnp.float32)
                acc_2 = acc_2 + w * tr2_ref[idx_ref[0, 0, base + r * 3 + 2], :].astype(jnp.float32)
            inv = mask_ref[0, 0, mbase + r_count]  # precomputed 1/divider
            out_ref[m, :d_clip] = jnp.tanh(acc_c * inv)
            out_ref[m, d_clip : d_clip + d_tr] = jnp.tanh(acc_1 * inv)
            out_ref[m, d_clip + d_tr :] = jnp.tanh(acc_2 * inv)

    return _kernel


def _make_fused_packed_kernel(r_count: int, d_clip: int, d_tr: int,
                              tile_m: int = TILE_M):
    """Packed-bf16 variant: tables are int32 [N, d/2] (pack_bf16_table).

    Dynamic row gathers of 16-bit VMEM arrays are unsupported by Mosaic
    (2 rows/sublane tiling), so each loaded int32 row carries two bf16
    columns, unpacked here with shift/mask + bitcast (pure VPU work).
    d_clip/d_tr are the LOGICAL (unpacked) dims; f32 accumulation per
    half; output halves land in natural column order by construction.
    """

    def _kernel(idx_ref, mask_ref, clip_ref, tr1_ref, tr2_ref, out_ref):
        import jax.lax as lax

        hc, ht = d_clip // 2, d_tr // 2

        def halves(v):
            return (
                lax.bitcast_convert_type(lax.shift_left(v, 16), jnp.float32),
                lax.bitcast_convert_type(
                    lax.bitwise_and(v, jnp.int32(-65536)), jnp.float32
                ),
            )

        for m in range(tile_m):
            base = m * r_count * 3
            mbase = m * (r_count + 1)
            accs = [jnp.zeros((d,), jnp.float32)
                    for d in (hc, hc, ht, ht, ht, ht)]
            for r in range(r_count):
                w = mask_ref[0, 0, mbase + r]
                for t, (ref, col) in enumerate(
                    ((clip_ref, 0), (tr1_ref, 1), (tr2_ref, 2))
                ):
                    lo, hi = halves(ref[idx_ref[0, 0, base + r * 3 + col], :])
                    accs[2 * t] = accs[2 * t] + w * lo
                    accs[2 * t + 1] = accs[2 * t + 1] + w * hi
            inv = mask_ref[0, 0, mbase + r_count]
            off = 0
            for acc, d in zip(accs, (hc, hc, ht, ht, ht, ht)):
                out_ref[m, off : off + d] = jnp.tanh(acc * inv)
                off += d

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("guard_zero", "interpret", "tile_m")
)
def _fused_pallas_call(clip, tr1, tr2, idx, mask, guard_zero,
                       interpret=False, tile_m=TILE_M):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, R, _ = idx.shape
    packed = clip.dtype == jnp.int32  # packed-bf16 tables (2 cols/word)
    d_clip = clip.shape[1] * (2 if packed else 1)
    d_tr = tr1.shape[1] * (2 if packed else 1)
    divider = mask.sum(axis=-1, keepdims=True)
    if guard_zero:
        divider = jnp.where(divider == 0, 1.0, divider)
    # mask/div stay f32 in SMEM (32-bit scalar reads) even for bf16 tables
    packed_mask = jnp.concatenate(
        [mask.astype(jnp.float32), (1.0 / divider).astype(jnp.float32)],
        axis=1,
    )
    # per-tile SMEM blocks (NOT whole-array scalar prefetch): each grid
    # step only holds its tile_m rows' indices/mask in SMEM, so SMEM use
    # is O(tile_m*R) regardless of batch size — no B=256 cliff
    # 3-D [n_tiles, 1, L] with (1, 1, L) blocks: the TPU lowering
    # requires a block's last two dims to divide (8, 128) or EQUAL the
    # array dims — (1, L) blocks over [n_tiles, L] are rejected
    idx_tiled = idx.reshape(M // tile_m, 1, tile_m * R * 3)
    mask_tiled = packed_mask.reshape(M // tile_m, 1, tile_m * (R + 1))
    grid_spec = pl.GridSpec(
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_m * R * 3), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_m * (R + 1)), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # clip table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tr1 table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tr2 table
        ],
        out_specs=pl.BlockSpec(
            (tile_m, d_clip + 2 * d_tr),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    make = _make_fused_packed_kernel if packed else _make_fused_kernel
    kwargs = {}
    if not interpret:
        # the VMEM-resident tables exceed the compiler's default 16 MB
        # scoped-vmem cap at real-split cardinality (48 MiB packed);
        # raise it — the fused_ctx_pool gate bounds tables at 96 MiB
        vmem = (clip.size + tr1.size + tr2.size) * 4 \
            + 4 * tile_m * (d_clip + 2 * d_tr) * 4
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem + 16 * 1024 * 1024,
                                 112 * 1024 * 1024)
        )
    return pl.pallas_call(
        make(R, d_clip, d_tr, tile_m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, d_clip + 2 * d_tr), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(idx_tiled, mask_tiled, clip, tr1, tr2)


def _make_fused_hbm_kernel(r_count: int, d_clip: int, d_tr: int,
                           tile_m: int, packed: bool = False):
    def _kernel(idx_ref, mask_ref, clip_ref, tr1_ref, tr2_ref, out_ref,
                clip_buf, tr1_buf, tr2_buf, sem_c, sem_1, sem_2):
        """HBM-streaming tier: tables too big for VMEM residency.

        The VMEM tier (above) keeps all three tables resident, which gates
        it off at real-split cardinality (12k clip rows / 24k track rows =
        96 MB; the r4 stress bench measured the XLA fallback at 1.41
        ms/batch vs ~0.17 ms HBM roofline). Here the tables stay in HBM
        (`pltpu.ANY`) and each grid step DMAs exactly the rows it gathers
        into VMEM scratch: issue ALL tile_m*R row copies up front (three
        tables' worth in flight at once), then wait each in issue order
        while accumulating — later copies overlap earlier rows' math.

        Single-row slices of a 2-D array violate Mosaic's (8, 128) tiling
        ("Slice shape along dimension 0 must be aligned to tiling (8)"),
        so tables, scratch, and output all carry the row's subtiles as
        their LAST TWO dims — [*, d/128, 128] — leaving the gathered/
        sliced axis untiled. The caller reshapes in XLA on both sides.

        idx_ref:  SMEM [1, 1, tile_m*R*3]; mask_ref: SMEM [1,1,tile_m*(R+1)]
        clip_ref: ANY [Nc, d_clip/128, 128]; tr1/tr2: ANY [Nt, d_tr/128, 128]
        out_ref:  VMEM [tile_m, (d_clip+2*d_tr)/128, 128]
        bufs:     VMEM [tile_m*R, d/128, 128]; sems: DMA((tile_m,)) each

        Semaphore budget: sflag space is 2 KB for the WHOLE program — a
        sem per copy (3*tile_m*R = 432) compiles standalone but OOMs
        inside the e2e sweep ("Exceeded sflag capacity"). All R copies of
        one (table, tile-row) share ONE semaphore; a row's R waits are all
        issued before its buffers are read, so the final wait implies
        every copy of that row has landed, while rows m+1.. stay in
        flight. 3*tile_m sems total.
        """
        from jax.experimental.pallas import tpu as pltpu

        # physical subtile counts per gathered row (packed: int32 words
        # hold 2 bf16 logical columns -> half the physical columns)
        sc = (d_clip // 2 if packed else d_clip) // 128
        st = (d_tr // 2 if packed else d_tr) // 128
        dmas = [[] for _ in range(tile_m)]
        for m in range(tile_m):
            for r in range(r_count):
                slot = m * r_count + r
                base = m * r_count * 3 + r * 3
                for (tab, buf, sem, col) in (
                    (clip_ref, clip_buf, sem_c, 0),
                    (tr1_ref, tr1_buf, sem_1, 1),
                    (tr2_ref, tr2_buf, sem_2, 2),
                ):
                    dma = pltpu.make_async_copy(
                        tab.at[idx_ref[0, 0, base + col]],
                        buf.at[slot],
                        sem.at[m],
                    )
                    dma.start()
                    dmas[m].append(dma)

        def halves(v):
            return (
                jax.lax.bitcast_convert_type(
                    jax.lax.shift_left(v, 16), jnp.float32
                ),
                jax.lax.bitcast_convert_type(
                    jax.lax.bitwise_and(v, jnp.int32(-65536)), jnp.float32
                ),
            )

        for m in range(tile_m):
            mbase = m * (r_count + 1)
            for dma in dmas[m]:
                dma.wait()
            if packed:
                accs = [jnp.zeros((d, 128), jnp.float32)
                        for d in (sc, sc, st, st, st, st)]
                for r in range(r_count):
                    slot = m * r_count + r
                    w = mask_ref[0, 0, mbase + r]
                    for t, buf in enumerate((clip_buf, tr1_buf, tr2_buf)):
                        lo, hi = halves(buf[slot])
                        accs[2 * t] = accs[2 * t] + w * lo
                        accs[2 * t + 1] = accs[2 * t + 1] + w * hi
                inv = mask_ref[0, 0, mbase + r_count]
                off = 0
                for acc, d in zip(accs, (sc, sc, st, st, st, st)):
                    out_ref[m, off : off + d] = jnp.tanh(acc * inv)
                    off += d
                continue
            acc_c = jnp.zeros((sc, 128), jnp.float32)
            acc_1 = jnp.zeros((st, 128), jnp.float32)
            acc_2 = jnp.zeros((st, 128), jnp.float32)
            for r in range(r_count):
                slot = m * r_count + r
                w = mask_ref[0, 0, mbase + r]
                acc_c = acc_c + w * clip_buf[slot]
                acc_1 = acc_1 + w * tr1_buf[slot]
                acc_2 = acc_2 + w * tr2_buf[slot]
            inv = mask_ref[0, 0, mbase + r_count]
            out_ref[m, :sc] = jnp.tanh(acc_c * inv)
            out_ref[m, sc : sc + st] = jnp.tanh(acc_1 * inv)
            out_ref[m, sc + st :] = jnp.tanh(acc_2 * inv)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("guard_zero", "interpret", "tile_m")
)
def _fused_hbm_pallas_call(clip, tr1, tr2, idx, mask, guard_zero,
                           interpret=False, tile_m=TILE_M):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, R, _ = idx.shape
    packed = clip.dtype == jnp.int32  # packed-bf16 tables (2 cols/word)
    d_clip = clip.shape[1] * (2 if packed else 1)  # logical dims
    d_tr = tr1.shape[1] * (2 if packed else 1)
    divider = mask.sum(axis=-1, keepdims=True)
    if guard_zero:
        divider = jnp.where(divider == 0, 1.0, divider)
    packed_mask = jnp.concatenate(
        [mask.astype(jnp.float32), (1.0 / divider).astype(jnp.float32)],
        axis=1,
    )
    idx_tiled = idx.reshape(M // tile_m, 1, tile_m * R * 3)
    mask_tiled = packed_mask.reshape(M // tile_m, 1, tile_m * (R + 1))
    n_slots = tile_m * R
    # physical per-row subtile counts (packed rows are half as wide)
    pc, pt = clip.shape[1] // 128, tr1.shape[1] // 128
    # logical output subtile count
    sc, st = d_clip // 128, d_tr // 128
    # subtile the row dim out of Mosaic's tiled last-two dims (see kernel
    # docstring); these reshapes are loop-invariant in the eval sweep and
    # hoist out of the fori_loop
    clip3 = clip.reshape(clip.shape[0], pc, 128)
    tr1_3 = tr1.reshape(tr1.shape[0], pt, 128)
    tr2_3 = tr2.reshape(tr2.shape[0], pt, 128)
    out3 = pl.pallas_call(
        _make_fused_hbm_kernel(R, d_clip, d_tr, tile_m, packed=packed),
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_m * R * 3), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_m * (R + 1)), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # clip table (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # tr1 table (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # tr2 table (HBM)
        ],
        out_specs=pl.BlockSpec(
            (tile_m, sc + 2 * st, 128),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (M, sc + 2 * st, 128), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((n_slots, pc, 128), clip.dtype),
            pltpu.VMEM((n_slots, pt, 128), tr1.dtype),
            pltpu.VMEM((n_slots, pt, 128), tr2.dtype),
            pltpu.SemaphoreType.DMA((tile_m,)),
            pltpu.SemaphoreType.DMA((tile_m,)),
            pltpu.SemaphoreType.DMA((tile_m,)),
        ],
        interpret=interpret,
    )(idx_tiled, mask_tiled, clip3, tr1_3, tr2_3)
    return out3.reshape(M, d_clip + 2 * d_tr)


def fused_ctx_pool(
    emb,
    idx: jnp.ndarray,
    mask: jnp.ndarray,
    guard_zero_divide: bool,
    force: str = "auto",
    tile_m: Optional[int] = None,
) -> jnp.ndarray:
    """tanh(concat(pool(clip), pool(tr1), pool(tr2)) / divider) in ONE
    pallas_call (the r1 version made three — each boundary blocked XLA's
    fusion/overlap and the full program regressed; see BENCH.md ablations).

    emb: models/tabular.EmbeddedTables; idx: [M, R, 3]; mask: [M, R] float.
    force: 'auto' | 'pallas' | 'pallas-hbm' | 'reference' | 'interpret'
           | 'interpret-hbm'

    Two pallas tiers: 'pallas' keeps the three tables VMEM-resident
    (fastest; toy/medium cardinality), 'pallas-hbm' streams gathered rows
    from HBM via per-row async DMA (real-split cardinality, where the
    tables exceed the VMEM budget and r1-r4 used to silently fall back to
    the 3x-slower XLA gather graph).
    """
    idx = jnp.asarray(idx, jnp.int32)
    mask = jnp.asarray(mask)
    if force == "auto":
        # ops-level escape hatch (compile-cost experiments, tier forcing
        # in the real-scale stress bench): LIREC_TPU_CTX_FORCE=reference|pallas
        force = os.environ.get("LIREC_TPU_CTX_FORCE", "auto")
    if tile_m is None:
        env_tile = os.environ.get("LIREC_TPU_CTX_TILE_M")  # ablation knob
        if env_tile:
            tile_m = int(env_tile)
        else:
            # adaptive default: the largest tile that divides M AND keeps
            # the kernel's per-tile gates satisfied (a tile that disables
            # the kernel would be strictly worse than a smaller one). The
            # r3 in-program sweep picked 8 under f32 tables; under the r4
            # packed-bf16 tables (halved row bytes, doubled arithmetic
            # intensity per tile) 32 measures 35-45% faster at real-split
            # cardinality (0.27-0.46 vs 0.47-0.70 ms/batch, two shuffled
            # same-session chip sweeps; 64 regresses again). Smaller M
            # (tiny batches) keeps the old tiles rather than falling
            # back to the XLA gather graph.
            M_, R_ = idx.shape[0], idx.shape[1]
            fits_vmem = (
                emb.clip.size + emb.tr1.size + emb.tr2.size
            ) * 4 < VMEM_TABLE_BUDGET
            row_bytes = (
                emb.clip.shape[1] + 2 * emb.tr1.shape[1]
            ) * emb.clip.dtype.itemsize
            tile_m = TILE_M
            for t in (32, 16, 8):
                if M_ % t:
                    continue
                if t * (R_ * 3 + R_ + 1) * 4 >= 900 * 1024:
                    continue  # SMEM gate (ok_common)
                if not fits_vmem and (
                    t * R_ * row_bytes >= 8 * 1024 * 1024
                ):
                    continue  # HBM-tier per-tile scratch gate (ok_hbm)
                tile_m = t
                break

    # packed-bf16 tables (pack_bf16_table, the r4 cast policy): int32
    # physical columns, 2 logical bf16 columns per word
    packed = emb.clip.dtype == jnp.int32

    def reference():
        e = emb
        if packed:
            from lirec_tpu.models.tabular import EmbeddedTables

            e = EmbeddedTables(
                clip=unpack_bf16_table(emb.clip),
                tr1=unpack_bf16_table(emb.tr1),
                tr2=unpack_bf16_table(emb.tr2),
            )
        divider = mask.sum(axis=-1, keepdims=True)
        if guard_zero_divide:
            divider = jnp.where(divider == 0, 1.0, divider)
        w = mask[..., None]

        def pool(tab, which):
            g = tab[idx[..., which]]
            return (g * w.astype(g.dtype)).sum(axis=-2)

        pooled = jnp.concatenate(
            [pool(e.clip, 0), pool(e.tr1, 1), pool(e.tr2, 2)], axis=-1
        )
        return jnp.tanh(pooled / divider.astype(pooled.dtype))

    shapes = dict(
        idx=tuple(idx.shape), clip=tuple(emb.clip.shape),
        tr=tuple(emb.tr1.shape),
        table_dtype="packed-bf16" if packed else str(emb.clip.dtype),
        tile_m=tile_m,
    )
    if force == "reference":
        _record_dispatch("fused_ctx_pool", "reference", "forced", shapes)
        return reference()
    M, R = idx.shape[0], idx.shape[1]
    ok_common = (
        M % tile_m == 0
        # tables: f32 or packed-bf16 (int32; direct bf16 is NOT lowerable
        # — Mosaic rejects dynamic single-row gathers of 16-bit VMEM
        # arrays); mask/div stay f32 in SMEM (32-bit scalar reads) and
        # all kernels accumulate in f32
        and emb.clip.dtype in (jnp.float32, jnp.int32)
        and emb.tr1.dtype == emb.clip.dtype
        and emb.tr2.dtype == emb.clip.dtype
        and emb.clip.shape[1] % 128 == 0
        and emb.tr1.shape[1] % 128 == 0
        # idx + mask are per-tile SMEM blocks (r4): only ONE tile's rows
        # are SMEM-resident per grid step — batch size no longer gates
        # the kernel (the r3 whole-array scalar prefetch cliffed at
        # B=256: 123.6k -> 52.8k clips/sec, BENCH.md)
        and tile_m * (R * 3 + R + 1) * 4 < 900 * 1024
    )
    tables_fit_vmem = (
        emb.clip.size + emb.tr1.size + emb.tr2.size
    ) * 4 < VMEM_TABLE_BUDGET
    ok = ok_common and tables_fit_vmem
    # the HBM tier's VMEM use is only the per-tile row scratch; packed
    # tables work there too (giant scale: halved DMA bytes + scratch)
    ok_hbm = ok_common and (
        tile_m * R * (emb.clip.shape[1] + 2 * emb.tr1.shape[1])
        * emb.clip.dtype.itemsize < 8 * 1024 * 1024
    )
    if force in ("interpret", "pallas") and not ok:
        raise ValueError(
            "fused_ctx_pool kernel needs M %% %d == 0, dims %% 128 == 0, "
            "tables resident in VMEM; got clip %s tr %s idx %s"
            % (tile_m, emb.clip.shape, emb.tr1.shape, idx.shape)
        )
    if force in ("interpret-hbm", "pallas-hbm") and not ok_hbm:
        raise ValueError(
            "fused_ctx_pool HBM tier needs M %% %d == 0, dims %% 128 == 0 "
            "and per-tile scratch < 8 MB; got clip %s tr %s idx %s"
            % (tile_m, emb.clip.shape, emb.tr1.shape, idx.shape)
        )
    if force == "interpret":
        return _fused_pallas_call(
            emb.clip, emb.tr1, emb.tr2, idx, mask, guard_zero_divide,
            interpret=True, tile_m=tile_m,
        )
    if force == "interpret-hbm":
        return _fused_hbm_pallas_call(
            emb.clip, emb.tr1, emb.tr2, idx, mask, guard_zero_divide,
            interpret=True, tile_m=tile_m,
        )
    on_tpu = jax.default_backend() == "tpu"
    if force == "pallas" or (force == "auto" and on_tpu and ok):
        _record_dispatch(
            "fused_ctx_pool", "pallas",
            "forced" if force == "pallas" else "auto", shapes,
        )
        return _fused_pallas_call(
            emb.clip, emb.tr1, emb.tr2, idx, mask, guard_zero_divide,
            tile_m=tile_m,
        )
    if force == "pallas-hbm" or (force == "auto" and on_tpu and ok_hbm):
        _record_dispatch(
            "fused_ctx_pool", "pallas-hbm",
            "forced" if force == "pallas-hbm"
            else ("auto: tables %.1f MB exceed the VMEM budget"
                  % ((emb.clip.size + emb.tr1.size + emb.tr2.size)
                     * emb.clip.dtype.itemsize / 2**20)),
            shapes,
        )
        return _fused_hbm_pallas_call(
            emb.clip, emb.tr1, emb.tr2, idx, mask, guard_zero_divide,
            tile_m=tile_m,
        )
    _record_dispatch(
        "fused_ctx_pool", "reference",
        "not on TPU" if not on_tpu
        else ("VMEM/SMEM gate: tables %.1f MB, idx+mask %.0f KB"
              % ((emb.clip.size + emb.tr1.size + emb.tr2.size)
                 * emb.clip.dtype.itemsize / 2**20,
                 (M * R * 3 + M * (R + 1)) * 4 / 1024)),
        shapes,
    )
    return reference()


def unpack_fused_table(fused: jnp.ndarray, wc: int, wt: int) -> jnp.ndarray:
    """Segment-wise unpack of a packed FUSED ctx row table.

    A fused row is the concatenation of the three tables' PACKED rows —
    [clip words (wc) | tr1 words (wt) | tr2 words (wt)] — where each
    segment internally packs its own table's (d, d + D/2) column pairs
    (pack_bf16_table). Unpacking must therefore split lo/hi halves PER
    SEGMENT to restore the natural [clip | tr1 | tr2] f32 column order.
    fused: int32 [U, wc + 2*wt] -> f32 [U, 2*(wc + 2*wt)].
    """
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(fused, 16), jnp.float32
    )
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(fused, jnp.int32(-65536)), jnp.float32
    )
    return jnp.concatenate(
        [
            lo[:, :wc], hi[:, :wc],
            lo[:, wc : wc + wt], hi[:, wc : wc + wt],
            lo[:, wc + wt :], hi[:, wc + wt :],
        ],
        axis=-1,
    )


def _make_triple_kernel(r_count: int, wc: int, wt: int, tile_m: int,
                        packed: bool):
    """Single-gather variant: one FUSED row per (m, r) context entry.

    The 3-table kernels above issue three dynamic single-row gathers per
    context entry, and the r4-final trace showed the VMEM tier is
    gather-ISSUE-bound (225 us/batch vs an 86 us packed-bytes roofline;
    halving bytes via packing barely moved it — BENCH.md). Deduplicating
    the batch's (clip, tr1, tr2) index triples host-side
    (data/localize.localize_eval_ctx_triples) and gathering each batch's
    unique fused rows into one local table (models/factory.apply_model)
    cuts the issue count 3x: the kernel reads ONE wide row per entry and
    the shared mask weight applies to the whole row at once.

    wc/wt: PHYSICAL word widths of the clip / track segments (packed:
    int32 words carrying two bf16 columns each; f32: the f32 columns).
    Output stays natural-order f32 [tile_m, d_clip + 2*d_tr].
    """

    def _kernel(idx_ref, mask_ref, fused_ref, out_ref):
        width = wc + 2 * wt
        for m in range(tile_m):
            base = m * r_count
            mbase = m * (r_count + 1)
            if packed:
                acc_lo = jnp.zeros((width,), jnp.float32)
                acc_hi = jnp.zeros((width,), jnp.float32)
                for r in range(r_count):
                    w = mask_ref[0, 0, mbase + r]
                    v = fused_ref[idx_ref[0, 0, base + r], :]
                    acc_lo = acc_lo + w * jax.lax.bitcast_convert_type(
                        jax.lax.shift_left(v, 16), jnp.float32
                    )
                    acc_hi = acc_hi + w * jax.lax.bitcast_convert_type(
                        jax.lax.bitwise_and(v, jnp.int32(-65536)),
                        jnp.float32,
                    )
                inv = mask_ref[0, 0, mbase + r_count]
                # natural column order: per segment, lo block then hi block
                out_ref[m, :wc] = jnp.tanh(acc_lo[:wc] * inv)
                out_ref[m, wc : 2 * wc] = jnp.tanh(acc_hi[:wc] * inv)
                o = 2 * wc
                out_ref[m, o : o + wt] = jnp.tanh(
                    acc_lo[wc : wc + wt] * inv
                )
                out_ref[m, o + wt : o + 2 * wt] = jnp.tanh(
                    acc_hi[wc : wc + wt] * inv
                )
                out_ref[m, o + 2 * wt : o + 3 * wt] = jnp.tanh(
                    acc_lo[wc + wt :] * inv
                )
                out_ref[m, o + 3 * wt :] = jnp.tanh(acc_hi[wc + wt :] * inv)
            else:
                acc = jnp.zeros((width,), jnp.float32)
                for r in range(r_count):
                    w = mask_ref[0, 0, mbase + r]
                    acc = acc + w * fused_ref[
                        idx_ref[0, 0, base + r], :
                    ].astype(jnp.float32)
                inv = mask_ref[0, 0, mbase + r_count]
                out_ref[m, :] = jnp.tanh(acc * inv)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("wc", "wt", "guard_zero", "interpret", "tile_m")
)
def _triple_pallas_call(fused, tidx, mask, wc, wt, guard_zero,
                        interpret=False, tile_m=TILE_M):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, R = tidx.shape
    packed = fused.dtype == jnp.int32
    d_out = (2 if packed else 1) * (wc + 2 * wt)
    divider = mask.sum(axis=-1, keepdims=True)
    if guard_zero:
        divider = jnp.where(divider == 0, 1.0, divider)
    packed_mask = jnp.concatenate(
        [mask.astype(jnp.float32), (1.0 / divider).astype(jnp.float32)],
        axis=1,
    )
    idx_tiled = tidx.reshape(M // tile_m, 1, tile_m * R)
    mask_tiled = packed_mask.reshape(M // tile_m, 1, tile_m * (R + 1))
    grid_spec = pl.GridSpec(
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_m * R), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_m * (R + 1)), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fused local table
        ],
        out_specs=pl.BlockSpec(
            (tile_m, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    kwargs = {}
    if not interpret:
        vmem = fused.size * 4 + 4 * tile_m * d_out * 4
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem + 16 * 1024 * 1024,
                                 112 * 1024 * 1024)
        )
    return pl.pallas_call(
        _make_triple_kernel(R, wc, wt, tile_m, packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, d_out), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(idx_tiled, mask_tiled, fused)


def matmul_pool_estimate_us(M: int, R: int, U: int, d_logical: int):
    """(matmul_tier_us, kernel_tier_us) cost model for the triple-tier
    dispatch below. Constants are measured on v5e (BENCH.md r4-final
    trace): the gather kernel is ISSUE-bound at ~9.8 ns per dynamic
    single-row VMEM gather (225 us / 23,040 issues); the matmul tier pays
    an MXU pass (M*U*d bf16 FLOPs at ~150 TFLOP/s sustained — below the
    197 peak: the S operand is skinny) plus the VPU one-hot build of S
    (M*R*U fused compare+select+add at ~3 Telem/s). The crossover is at
    U ~ 4-5k for the real eval shapes — exactly the regime the triple
    localization produces (U <= ~3k at real-split B=64)."""
    matmul_us = (M * U * d_logical * 2) / 150e6 + (M * R * U * 3) / 3e6
    kernel_us = M * R * 9.8e-3
    return matmul_us, kernel_us


def _matmul_pool(fused, tidx, mask, wc, wt, guard_zero):
    """MXU tier of the triple ctx pool: pooled = S @ T_local.

    S[m, u] = sum_r mask[m, r] * (tidx[m, r] == u) — a per-batch one-hot
    row-selection matrix built with R fused compare+add passes on the VPU
    — and T_local is the batch's unique fused [clip|tr1|tr2] rows. The
    r4-final trace proved the gather kernel issue-bound (23,040 dynamic
    single-row gathers at ~9.8 ns each); expressing the pool as a matmul
    moves it to the MXU where the same work is ~M*U*d*2 FLOPs of dense
    bf16 — the idiomatic TPU formulation of a small-vocabulary gather.

    Numerics: T rows are exact bf16 values (pack_bf16_table rounded them
    already), mask weights are 0/1, and the MXU accumulates f32 — the only
    delta vs the gather kernel is summation ORDER (u-order vs r-order) and
    duplicate triples entering as one multiplicity-weighted product, a
    last-bit f32 effect bounded far below the bf16 table rounding the
    packed tier already carries. f32 tables run the matmul in f32
    (preferred_element_type) and are only selected by force='matmul'.
    """
    packed = fused.dtype == jnp.int32
    tab = unpack_fused_table(fused, wc, wt) if packed else fused
    if packed:
        tab = tab.astype(jnp.bfloat16)  # exact: values already bf16-rounded
    M, R = tidx.shape
    U = fused.shape[0]
    divider = mask.sum(axis=-1, keepdims=True)
    if guard_zero:
        divider = jnp.where(divider == 0, 1.0, divider)
    uio = jax.lax.iota(jnp.int32, U)[None, :]
    s = jnp.zeros((M, U), jnp.float32)
    mask_f = mask.astype(jnp.float32)
    for r in range(R):
        s = s + jnp.where(tidx[:, r, None] == uio, mask_f[:, r, None], 0.0)
    pooled = jax.lax.dot_general(
        s.astype(tab.dtype), tab,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.tanh(pooled / divider.astype(jnp.float32))


def fused_ctx_pool_triple(
    fused: jnp.ndarray,
    tidx: jnp.ndarray,
    mask: jnp.ndarray,
    wc: int,
    wt: int,
    guard_zero_divide: bool,
    force: str = "auto",
    tile_m: Optional[int] = None,
) -> jnp.ndarray:
    """tanh(masked-mean of gathered FUSED ctx rows): the triple tier.

    fused: [U, wc + 2*wt] f32 or int32 (packed-bf16 segments); tidx:
    [M, R] int32 into the fused table; mask: [M, R]. wc/wt are the
    PHYSICAL clip/track segment widths. One dynamic row gather per
    (m, r) — 3x fewer issues than fused_ctx_pool at identical numerics
    (same values, same accumulation order).
    force: 'auto' | 'pallas' | 'matmul' | 'interpret' | 'reference'

    auto on TPU picks between the gather KERNEL (issue-bound: ~9.8 ns per
    entry per table) and the MXU MATMUL tier (_matmul_pool: one-hot
    S @ T_local) with the matmul_pool_estimate_us cost model; the matmul
    tier is auto-eligible only for packed-bf16 tables (an f32 matmul at
    default precision would silently round to bf16 — precision-first f32
    sessions keep the kernel's exact f32 accumulation over f32 rows).
    """
    tidx = jnp.asarray(tidx, jnp.int32)
    mask = jnp.asarray(mask)
    if force == "auto":
        force = os.environ.get("LIREC_TPU_CTX_FORCE", "auto")
        if force in ("pallas-hbm", "interpret-hbm"):
            force = "auto"  # no HBM tier here: the fused table is local
    M, R = tidx.shape
    packed = fused.dtype == jnp.int32
    if tile_m is None:
        env_tile = os.environ.get("LIREC_TPU_CTX_TILE_M")
        if env_tile:
            tile_m = int(env_tile)
        else:
            # the triple tier's SMEM block is 3x smaller than the 3-table
            # kernel's (one index per entry), so larger tiles stay viable
            tile_m = TILE_M
            for t in (32, 16, 8):
                if M % t == 0 and t * (R + R + 1) * 4 < 900 * 1024:
                    tile_m = t
                    break

    def reference():
        tab = unpack_fused_table(fused, wc, wt) if packed else fused
        divider = mask.sum(axis=-1, keepdims=True)
        if guard_zero_divide:
            divider = jnp.where(divider == 0, 1.0, divider)
        g = tab[tidx]  # [M, R, d]
        w = mask[..., None].astype(g.dtype)
        # pool PER SEGMENT (widths match the 3-table path's pools), so XLA
        # picks the same reduction shapes and the fallback is bitwise
        # equal to the plain eval path (tests/test_packed_eval.py)
        dc = 2 * wc if packed else wc
        dt = 2 * wt if packed else wt
        pooled = jnp.concatenate(
            [
                (g[..., :dc] * w).sum(axis=-2),
                (g[..., dc : dc + dt] * w).sum(axis=-2),
                (g[..., dc + dt :] * w).sum(axis=-2),
            ],
            axis=-1,
        )
        return jnp.tanh(pooled / divider.astype(pooled.dtype))

    shapes = dict(
        tidx=tuple(tidx.shape), fused=tuple(fused.shape),
        table_dtype="packed-bf16" if packed else str(fused.dtype),
        tile_m=tile_m,
    )
    if force == "reference":
        _record_dispatch("fused_ctx_pool_triple", "reference", "forced",
                         shapes)
        return reference()
    if force == "matmul":
        _record_dispatch("fused_ctx_pool_triple", "matmul", "forced",
                         shapes)
        return _matmul_pool(fused, tidx, mask, wc, wt, guard_zero_divide)
    ok = (
        M % tile_m == 0
        and fused.dtype in (jnp.float32, jnp.int32)
        and wc % 128 == 0
        and wt % 128 == 0
        and fused.shape[1] == wc + 2 * wt
        and tile_m * (R + R + 1) * 4 < 900 * 1024
        and fused.size * 4 < VMEM_TABLE_BUDGET
    )
    if force in ("interpret", "pallas") and not ok:
        raise ValueError(
            "fused_ctx_pool_triple needs M %% %d == 0, segment widths %% "
            "128 == 0, fused table resident in VMEM; got fused %s tidx %s"
            % (tile_m, fused.shape, tidx.shape)
        )
    if force == "interpret":
        return _triple_pallas_call(
            fused, tidx, mask, wc, wt, guard_zero_divide,
            interpret=True, tile_m=tile_m,
        )
    on_tpu = jax.default_backend() == "tpu"
    if force == "auto" and on_tpu and packed:
        # MXU-vs-kernel cost model: the matmul tier wins while the local
        # table stays small (U below ~4-5k at real eval shapes)
        d_logical = 2 * (wc + 2 * wt)
        mm_us, kr_us = matmul_pool_estimate_us(
            M, R, fused.shape[0], d_logical
        )
        if mm_us < (kr_us if ok else float("inf")):
            _record_dispatch(
                "fused_ctx_pool_triple", "matmul",
                "auto: est %.0fus (matmul) < %.0fus (gather kernel)"
                % (mm_us, kr_us), shapes,
            )
            return _matmul_pool(
                fused, tidx, mask, wc, wt, guard_zero_divide
            )
    if force == "pallas" or (force == "auto" and on_tpu and ok):
        _record_dispatch(
            "fused_ctx_pool_triple", "pallas",
            "forced" if force == "pallas" else "auto", shapes,
        )
        return _triple_pallas_call(
            fused, tidx, mask, wc, wt, guard_zero_divide, tile_m=tile_m,
        )
    _record_dispatch(
        "fused_ctx_pool_triple", "reference",
        "not on TPU" if not on_tpu
        else ("gate: fused table %.1f MB, M=%d"
              % (fused.size * fused.dtype.itemsize / 2**20, M)),
        shapes,
    )
    return reference()


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
    shapes = dict(table=tuple(table.shape), idx=tuple(idx.shape))
    if force == "pallas" or (force == "auto" and on_tpu and _supported(table, idx)):
        _record_dispatch(
            "gather_masked_sum", "pallas",
            "forced" if force == "pallas" else "auto", shapes,
        )
        return _pallas_call(table, idx, mask)
    _record_dispatch(
        "gather_masked_sum", "reference",
        "not on TPU" if not on_tpu else "shape/VMEM gate", shapes,
    )
    return gather_masked_sum_reference(table, idx, mask)
