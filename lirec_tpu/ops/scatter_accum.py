"""Pallas TPU kernel: the BACKWARD of the hybrid train path's h1 gathers.

The train step's dominant backward cost is accumulating per-use gradients
into the deduplicated first-layer tables (models/hybrid.py): XLA lowers
``table[idx]``'s VJP to a scatter-add that measures ~8x off HBM roofline at
the real shapes ([B*20*18, 2048] updates into a few-thousand-row table,
~11-way row collisions). This kernel keeps the THREE table-gradient
accumulators (clip | tr1 | tr2) resident in VMEM across a sequential grid
over update tiles and applies per-row read-modify-writes there, streaming
only the updates from HBM — and accumulates in f32 (XLA's scatter
accumulates bf16 cotangents in bf16).

``gather_h1`` is the custom-vjp entry: forward is the plain XLA gather
(already fast), backward dispatches to the kernel on TPU and to
``.at[].add`` elsewhere. Exposed knob mirrors ops/gather_pool.py:
force='auto'|'pallas'|'reference'|'interpret'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lirec_tpu.ops.dispatch import record as _record

__all__ = ["gather_h1", "scatter_accum3", "scatter_accum3_reference"]

_FORCE = "auto"  # test hook: lirec_tpu.ops.scatter_accum._FORCE = 'interpret'


def scatter_accum3_reference(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr):
    """jnp fallback: three .at[].add scatters (XLA's own lowering)."""
    flat = idx3.reshape(-1, 3)
    d_c, d_t = g_clip.shape[-1], g_tr1.shape[-1]
    acc_c = jnp.zeros((n_clip, d_c), jnp.float32).at[flat[:, 0]].add(
        g_clip.reshape(-1, d_c).astype(jnp.float32)
    )
    acc_1 = jnp.zeros((n_tr, d_t), jnp.float32).at[flat[:, 1]].add(
        g_tr1.reshape(-1, d_t).astype(jnp.float32)
    )
    acc_2 = jnp.zeros((n_tr, d_t), jnp.float32).at[flat[:, 2]].add(
        g_tr2.reshape(-1, d_t).astype(jnp.float32)
    )
    return acc_c, acc_1, acc_2


def _make_kernel(tile_m: int, d_clip: int, d_tr: int):
    def _kernel(idx_ref, gc_ref, g1_ref, g2_ref, ac_ref, a1_ref, a2_ref):
        """One grid step folds TILE_M update rows into the VMEM accumulators.

        idx_ref: SMEM [M*3] flat (clip, tr1, tr2) row triples (prefetched)
        gc/g1/g2_ref: VMEM [TILE_M, d] update tiles (streamed)
        ac/a1/a2_ref: VMEM [n, d] f32 accumulators — constant index_map, so
                      they stay resident across the (sequential) grid
        """
        from jax.experimental import pallas as pl

        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _zero():
            ac_ref[...] = jnp.zeros_like(ac_ref)
            a1_ref[...] = jnp.zeros_like(a1_ref)
            a2_ref[...] = jnp.zeros_like(a2_ref)

        # fully unrolled row loop (static trips): each row is one dynamic
        # (1, d) read-modify-write in VMEM; the serialization is inherent
        # (duplicate rows must accumulate in order)
        for j in range(tile_m):
            base = (tile * tile_m + j) * 3
            rc = idx_ref[base]
            r1 = idx_ref[base + 1]
            r2 = idx_ref[base + 2]
            ac_ref[pl.ds(rc, 1), :] += gc_ref[j, :][None].astype(jnp.float32)
            a1_ref[pl.ds(r1, 1), :] += g1_ref[j, :][None].astype(jnp.float32)
            a2_ref[pl.ds(r2, 1), :] += g2_ref[j, :][None].astype(jnp.float32)

    return _kernel


def _pick_tile(m: int) -> int:
    # 128 measured marginally best at the real shapes (8..512 within 4%)
    for tile in (128, 256, 512, 64, 32, 16, 8):
        if m % tile == 0:
            return tile
    return 1


def _make_kernel3(tile_n: int, r: int, d_clip: int, d_tr: int,
                  split: bool = False, n_tiles: int = 0):
    """[N, R, D] update blocks — same accumulation as `_make_kernel`, but
    consuming the cotangents in their native 3D layout: the [N*R, D]
    flatten is NOT a bitcast under TPU tiled layouts (R=18 pads to 24
    sublanes), so the 2D path paid three physical reshape copies
    (~0.2 ms/step in the r3c profile).

    ``split``: double accumulators (even update rows into the output refs,
    odd rows into VMEM scratch, merged at the final grid step) — halves
    the per-table read-modify-write dependency chains that serialize the
    row loop."""

    def _kernel(idx_ref, gc_ref, g1_ref, g2_ref, ac_ref, a1_ref, a2_ref,
                *scratch):
        from jax.experimental import pallas as pl

        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _zero():
            ac_ref[...] = jnp.zeros_like(ac_ref)
            a1_ref[...] = jnp.zeros_like(a1_ref)
            a2_ref[...] = jnp.zeros_like(a2_ref)
            if split:
                for s in scratch:
                    s[...] = jnp.zeros_like(s)

        for j in range(tile_n):
            for rr in range(r):
                u = j * r + rr
                base = ((tile * tile_n + j) * r + rr) * 3
                rc = idx_ref[base]
                r1 = idx_ref[base + 1]
                r2 = idx_ref[base + 2]
                if split and u % 2:
                    tc, t1, t2 = scratch
                else:
                    tc, t1, t2 = ac_ref, a1_ref, a2_ref
                tc[pl.ds(rc, 1), :] += (
                    gc_ref[j, rr, :][None].astype(jnp.float32)
                )
                t1[pl.ds(r1, 1), :] += (
                    g1_ref[j, rr, :][None].astype(jnp.float32)
                )
                t2[pl.ds(r2, 1), :] += (
                    g2_ref[j, rr, :][None].astype(jnp.float32)
                )

        if split:

            @pl.when(tile == n_tiles - 1)
            def _merge():
                ac_ref[...] += scratch[0][...]
                a1_ref[...] += scratch[1][...]
                a2_ref[...] += scratch[2][...]

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_clip", "n_tr", "interpret", "tile_n", "split"),
)
def _pallas_call3d(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr,
                   interpret=False, tile_n=None, split=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r = idx3.shape[0], idx3.shape[1]
    d_c, d_t = g_clip.shape[-1], g_tr1.shape[-1]
    # small tile: the row loop is fully unrolled tile_n*r times per table —
    # 8 keeps the kernel body bounded (432 RMWs) and pipelines fine
    tile_n = tile_n or 8
    out_shape = [
        jax.ShapeDtypeStruct((n_clip, d_c), jnp.float32),
        jax.ShapeDtypeStruct((n_tr, d_t), jnp.float32),
        jax.ShapeDtypeStruct((n_tr, d_t), jnp.float32),
    ]
    acc_bytes = (n_clip * d_c + 2 * n_tr * d_t) * 4
    tile_bytes = tile_n * r * (d_c + 2 * d_t) * 4
    if split is None:
        # measured NEGATIVE: the 2-way accumulator split (even/odd update
        # rows into separate buffers, merged at the last grid step) was
        # 1.62 vs 1.52 ms/iter no-split at the real shapes — the RMW
        # dependency chains are not the bottleneck; the toggle stays for
        # reproducing the ablation
        split = False
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, r, d_c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, r, d_t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, r, d_t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_clip, d_c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tr, d_t), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tr, d_t), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((n_clip, d_c), jnp.float32),
                pltpu.VMEM((n_tr, d_t), jnp.float32),
                pltpu.VMEM((n_tr, d_t), jnp.float32),
            ]
            if split
            else []
        ),
    )
    kwargs = {}
    if not interpret:
        vmem = (2 if split else 1) * acc_bytes + 4 * tile_bytes
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem + 8 * 1024 * 1024, 112 * 1024 * 1024)
        )
    return pl.pallas_call(
        _make_kernel3(tile_n, r, d_c, d_t, split=split,
                      n_tiles=n // tile_n),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(idx3.reshape(-1), g_clip, g_tr1, g_tr2)


@functools.partial(
    jax.jit, static_argnames=("n_clip", "n_tr", "interpret", "tile_m")
)
def _pallas_call(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr,
                 interpret=False, tile_m=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    flat_idx = idx3.reshape(-1, 3)
    m = flat_idx.shape[0]
    d_c, d_t = g_clip.shape[-1], g_tr1.shape[-1]
    gc = g_clip.reshape(m, d_c)
    g1 = g_tr1.reshape(m, d_t)
    g2 = g_tr2.reshape(m, d_t)
    tile_m = tile_m or _pick_tile(m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # idx triples
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, d_c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d_t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d_t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_clip, d_c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tr, d_t), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tr, d_t), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        # the VMEM-resident f32 accumulators exceed the compiler's default
        # 16 MB scoped-vmem cap at real dims (24 MB for the three tables);
        # raise the cap — v5e has 128 MiB physical (the _supported gate
        # bounds the accumulators at 72 MB)
        vmem = (n_clip * d_c + 2 * n_tr * d_t) * 4 + 3 * tile_m * d_c * 4
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem * 2, 112 * 1024 * 1024)
        )
    return pl.pallas_call(
        _make_kernel(tile_m, d_c, d_t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_clip, d_c), jnp.float32),
            jax.ShapeDtypeStruct((n_tr, d_t), jnp.float32),
            jax.ShapeDtypeStruct((n_tr, d_t), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(flat_idx.reshape(-1), gc, g1, g2)


def _make_kernel1(tile_n: int, r: int, d: int):
    """Single-table variant of `_make_kernel3` for tiered dispatch: at
    full-data scale the track accumulators can exceed VMEM while the clip
    table still fits — each table gets the kernel iff ITS accumulator
    fits, the rest keep XLA's scatter."""

    def _kernel(idx_ref, g_ref, acc_ref):
        from jax.experimental import pallas as pl

        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for j in range(tile_n):
            for rr in range(r):
                row = idx_ref[(tile * tile_n + j) * r + rr]
                acc_ref[pl.ds(row, 1), :] += (
                    g_ref[j, rr, :][None].astype(jnp.float32)
                )

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("n_rows", "interpret", "tile_n")
)
def _pallas_call1(idx, g, n_rows, interpret=False, tile_n=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r, d = g.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, r, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, d), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kwargs = {}
    if not interpret:
        vmem = n_rows * d * 4 + tile_n * r * d * 4
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem * 2, 112 * 1024 * 1024)
        )
    return pl.pallas_call(
        _make_kernel1(tile_n, r, d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(idx.reshape(-1), g)


def _table_fits(n_rows: int, d: int) -> bool:
    # the single-table kernel holds ONE f32 accumulator + double-buffered
    # update tiles (~1 MB); sequential pallas_calls don't share VMEM
    # lifetimes, so each table may claim most of the 128 MiB. The old
    # 48 MB gate sent the 50.3 MB real-split clip accumulator — and with
    # it every table — to XLA's scatter (r4 stress bench:
    # tiered:xla/xla/xla at n_clips=12288).
    return d % 128 == 0 and n_rows * d * 4 < 90 * 1024 * 1024


def _flat_m(idx3) -> int:
    m = 1
    for s in idx3.shape[:-1]:
        m *= s
    return m


def _kernel_requested(force: str) -> bool:
    return force in ("pallas", "interpret") or (
        force == "auto" and jax.default_backend() == "tpu"
    )


def _supported(idx3, d_clip, d_tr, n_clip, n_tr) -> bool:
    m = _flat_m(idx3)
    acc_bytes = (n_clip * d_clip + 2 * n_tr * d_tr) * 4
    return (
        m % 8 == 0
        and d_clip % 128 == 0
        and d_tr % 128 == 0
        # accumulators + a generous margin for streamed update tiles must
        # fit v5e's 128 MiB VMEM
        and acc_bytes < 72 * 1024 * 1024
        # the 3-table kernel prefetches idx TRIPLES whole into SMEM
        # (the tiered single-table path only needs one column: m*4)
        and m * 3 * 4 < 900 * 1024
    )


def scatter_accum3(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr, force="auto"):
    """acc[t][idx3[..., t]] += g[t] for the three h1 tables, f32 accum.

    idx3: [..., 3] int32; g_*: [..., d]; returns ([n_clip, d_c] f32,
    [n_tr, d_t] f32 x2).
    """
    idx3 = jnp.asarray(idx3, jnp.int32)
    if force == "reference":
        return scatter_accum3_reference(
            idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr
        )
    ok = _supported(idx3, g_clip.shape[-1], g_tr1.shape[-1], n_clip, n_tr)
    if force in ("interpret", "pallas") and not ok:
        raise ValueError(
            "scatter_accum3 kernel needs M %% 8 == 0, dims %% 128 == 0, "
            "accumulators resident in VMEM; got idx %s d_clip %d d_tr %d "
            "n_clip %d n_tr %d"
            % (idx3.shape, g_clip.shape[-1], g_tr1.shape[-1], n_clip, n_tr)
        )
    # native-3D path when the cotangents arrive [N, R, D]: the flatten to
    # [N*R, D] is a physical copy under tiled layouts
    use_3d = (
        idx3.ndim == 3 and g_clip.ndim == 3 and idx3.shape[0] % 8 == 0
    )
    if force == "interpret":
        if use_3d:
            return _pallas_call3d(
                idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr, interpret=True
            )
        return _pallas_call(
            idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr, interpret=True
        )
    shapes = dict(
        idx=tuple(idx3.shape), n_clip=n_clip, n_tr=n_tr,
        d_clip=g_clip.shape[-1], d_tr=g_tr1.shape[-1],
    )
    if force == "pallas" or (force == "auto" and _kernel_requested(force) and ok):
        _record(
            "scatter_accum", "pallas-3table%s" % ("-3d" if use_3d else ""),
            "forced" if force == "pallas" else "auto", shapes,
        )
        if use_3d:
            return _pallas_call3d(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr)
        return _pallas_call(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr)
    _record(
        "scatter_accum", "xla-scatter",
        "not on TPU" if jax.default_backend() != "tpu"
        else "VMEM/SMEM gate", shapes,
    )
    return scatter_accum3_reference(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr)


def _dispatch_scatter(idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr, force):
    """Tiered kernel dispatch for the gather_h1 backward.

    All three accumulators in one kernel when they fit VMEM together;
    otherwise each table gets its own single-table kernel iff ITS
    accumulator fits (at full-data scale the track tables can outgrow
    VMEM while the clip table — the widest, most expensive scatter —
    still fits); anything left keeps XLA's scatter."""
    if force == "reference":
        return scatter_accum3_reference(
            idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr
        )
    m = _flat_m(idx3)
    tiered_ok = (
        _kernel_requested(force)
        and idx3.ndim == 3
        and idx3.shape[0] % 8 == 0
        and m * 4 < 900 * 1024  # per-table idx column in SMEM
    )
    d_c, d_t = g_clip.shape[-1], g_tr1.shape[-1]
    if not tiered_ok or _supported(idx3, d_c, d_t, n_clip, n_tr):
        # whole-kernel path (or plain fallback) — scatter_accum3 gates it
        return scatter_accum3(
            idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr, force=force
        )
    interp = force == "interpret"
    outs = []
    tiers = []
    for g, n_rows, col in (
        (g_clip, n_clip, 0), (g_tr1, n_tr, 1), (g_tr2, n_tr, 2)
    ):
        d = g.shape[-1]
        if _table_fits(n_rows, d):
            tiers.append("pallas")
            outs.append(
                _pallas_call1(idx3[..., col], g, n_rows, interpret=interp)
            )
        elif force == "pallas":
            # an explicit hardware force must never silently take the XLA
            # path (the r1 VMEM-guard failure class, BENCH.md); interpret
            # is a test mode and may mix
            raise ValueError(
                "scatter_accum single-table kernel cannot fit table "
                "[%d, %d] in VMEM (and force='pallas' forbids the XLA "
                "fallback)" % (n_rows, d)
            )
        else:
            tiers.append("xla")
            outs.append(
                jnp.zeros((n_rows, d), jnp.float32)
                .at[idx3[..., col].reshape(-1)]
                .add(g.reshape(-1, d).astype(jnp.float32))
            )
    _record(
        "scatter_accum", "tiered:" + "/".join(tiers),
        "per-table VMEM fit (clip/tr1/tr2)",
        dict(idx=tuple(idx3.shape), n_clip=n_clip, n_tr=n_tr),
    )
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _make_gather_h1(n_clip, n_tr, dt_c, dt_1, dt_2, mesh, data_axis):
    dt_c, dt_1, dt_2 = jnp.dtype(dt_c), jnp.dtype(dt_1), jnp.dtype(dt_2)

    @jax.custom_vjp
    def g(clip, tr1, tr2, idx3):
        return clip[idx3[..., 0]], tr1[idx3[..., 1]], tr2[idx3[..., 2]]

    def fwd(clip, tr1, tr2, idx3):
        return g(clip, tr1, tr2, idx3), idx3

    def bwd(idx3, cotangents):
        g_clip, g_tr1, g_tr2 = cotangents
        if mesh is None:
            acc_c, acc_1, acc_2 = _dispatch_scatter(
                idx3, g_clip, g_tr1, g_tr2, n_clip, n_tr, _FORCE
            )
        else:
            # SPMD: each shard scatter-accumulates its LOCAL update rows
            # (the kernel has no GSPMD rule) and the partial table grads
            # psum across the data axis — the same collective XLA's
            # partitioned scatter performs
            from jax.sharding import PartitionSpec as P

            def local(idx_l, gc_l, g1_l, g2_l):
                a, b, c = _dispatch_scatter(
                    idx_l, gc_l, g1_l, g2_l, n_clip, n_tr, _FORCE
                )
                return (
                    jax.lax.psum(a, data_axis),
                    jax.lax.psum(b, data_axis),
                    jax.lax.psum(c, data_axis),
                )

            acc_c, acc_1, acc_2 = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(data_axis), P(data_axis), P(data_axis), P(data_axis)
                ),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )(idx3, g_clip, g_tr1, g_tr2)
        return (
            acc_c.astype(dt_c), acc_1.astype(dt_1), acc_2.astype(dt_2), None
        )

    g.defvjp(fwd, bwd)
    return g


def gather_h1(clip, tr1, tr2, idx3, mesh=None, data_axis="data"):
    """(clip[idx3[...,0]], tr1[idx3[...,1]], tr2[idx3[...,2]]) with the
    table-gradient scatter running through the pallas accumulator on TPU
    (module-level ``_FORCE`` overrides dispatch for tests). Forward is the
    plain XLA gather either way. With ``mesh``, the backward runs the
    kernel per-shard under shard_map over ``data_axis`` and psums the
    partial table grads — SPMD training keeps the kernel."""
    fn = _make_gather_h1(
        clip.shape[0], tr1.shape[0],
        clip.dtype.name, tr1.dtype.name, tr2.dtype.name,
        mesh, data_axis,
    )
    return fn(clip, tr1, tr2, jnp.asarray(idx3, jnp.int32))
