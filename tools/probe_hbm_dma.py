#!/usr/bin/env python
"""Probe: is the fused-ctx HBM tier DMA-ISSUE-bound or bandwidth-bound?

The r4 stress bench measured the HBM tier at ~1.0 ms/call against a
~0.17 ms HBM roofline (141 MB/batch). Hypothesis: the scalar core's
per-row DMA issue rate binds (69k copies/batch). This probe times, at
real-split dims on the chip:

  a) the shipped per-row kernel (tile_m*R*3 copies per tile);
  b) a run-DMA variant: ONE contiguous [R, d] copy per (m, table)
     (3 copies per m) — numerically WRONG for random indices (it reads
     rows idx[m,0]..idx[m,0]+R-1) but byte-identical traffic, so the
     delta isolates pure issue cost;
  c) the jnp/XLA gather reference.

If (b) << (a), a run-contiguous table layout (data/plan side) buys the
difference legitimately.

Run: env PYTHONPATH="/root/repo:$PYTHONPATH" python tools/probe_hbm_dma.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


TILE_M = 8


def _make_run_kernel(r_count, d_clip, d_tr, tile_m):
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(idx_ref, mask_ref, clip_ref, tr1_ref, tr2_ref, out_ref,
                clip_buf, tr1_buf, tr2_buf, sem_c, sem_1, sem_2):
        sc, st = d_clip // 128, d_tr // 128
        dmas = [[] for _ in range(tile_m)]
        for m in range(tile_m):
            base = m * r_count * 3
            for (tab, buf, sem, col) in (
                (clip_ref, clip_buf, sem_c, 0),
                (tr1_ref, tr1_buf, sem_1, 1),
                (tr2_ref, tr2_buf, sem_2, 2),
            ):
                from jax.experimental import pallas as pl

                start = idx_ref[0, 0, base + col]
                dma = pltpu.make_async_copy(
                    tab.at[pl.ds(start, r_count)],
                    buf.at[pl.ds(m * r_count, r_count)],
                    sem.at[m],
                )
                dma.start()
                dmas[m].append(dma)
        for m in range(tile_m):
            mbase = m * (r_count + 1)
            for dma in dmas[m]:
                dma.wait()
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


@functools.partial(jax.jit, static_argnames=("tile_m",))
def run_dma_call(clip, tr1, tr2, idx, mask, tile_m=TILE_M):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, R, _ = idx.shape
    d_clip, d_tr = clip.shape[1], tr1.shape[1]
    divider = jnp.maximum(mask.sum(axis=-1, keepdims=True), 1.0)
    packed_mask = jnp.concatenate(
        [mask, (1.0 / divider)], axis=1
    ).astype(clip.dtype)
    idx_tiled = idx.reshape(M // tile_m, 1, tile_m * R * 3)
    mask_tiled = packed_mask.reshape(M // tile_m, 1, tile_m * (R + 1))
    n_slots = tile_m * R
    sc, st = d_clip // 128, d_tr // 128
    clip3 = clip.reshape(clip.shape[0], sc, 128)
    tr1_3 = tr1.reshape(tr1.shape[0], st, 128)
    tr2_3 = tr2.reshape(tr2.shape[0], st, 128)
    out3 = pl.pallas_call(
        _make_run_kernel(R, d_clip, d_tr, tile_m),
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((1, 1, tile_m * R * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_m * (R + 1)), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile_m, sc + 2 * st, 128),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, sc + 2 * st, 128), clip.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_slots, sc, 128), clip.dtype),
            pltpu.VMEM((n_slots, st, 128), tr1.dtype),
            pltpu.VMEM((n_slots, st, 128), tr2.dtype),
            pltpu.SemaphoreType.DMA((tile_m,)),
            pltpu.SemaphoreType.DMA((tile_m,)),
            pltpu.SemaphoreType.DMA((tile_m,)),
        ],
    )(idx_tiled, mask_tiled, clip3, tr1_3, tr2_3)
    return out3.reshape(M, d_clip + 2 * d_tr)


def main():
    from lirec_tpu.models.tabular import EmbeddedTables
    from lirec_tpu.ops.gather_pool import (
        _fused_hbm_pallas_call, fused_ctx_pool,
    )

    rng = np.random.default_rng(0)
    n_clips, n_tracks = 12288, 24576
    M, R = 1280, 18
    d_clip, d_tr = 1024, 256
    clip = jnp.asarray(rng.standard_normal((n_clips, d_clip)), jnp.float32)
    tr1 = jnp.asarray(rng.standard_normal((n_tracks, d_tr)), jnp.float32)
    tr2 = jnp.asarray(rng.standard_normal((n_tracks, d_tr)), jnp.float32)
    # run-safe starts so start+R stays in range
    idx = np.stack([
        rng.integers(0, n_clips - R, (M, R)),
        rng.integers(0, n_tracks - R, (M, R)),
        rng.integers(0, n_tracks - R, (M, R)),
    ], axis=-1).astype(np.int32)
    idx = jnp.asarray(idx)
    mask = jnp.asarray((rng.random((M, R)) < 0.8).astype(np.float32))
    emb = EmbeddedTables(clip=clip, tr1=tr1, tr2=tr2)

    # sweep wrapper: n sequential calls chained through a dummy carry so
    # nothing is dead code and timing is slope-based (tunnel-proof)
    def make_sweep(fn):
        @jax.jit
        def sweep(c, t1, t2, idx, mask, n):
            def body(i, acc):
                out = fn(c + acc * 0, t1, t2, idx, mask)
                return acc + out[0, 0]

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return sweep

    per_row = make_sweep(
        lambda c, t1, t2, i, m: _fused_hbm_pallas_call(c, t1, t2, i, m, True)
    )
    per_run = make_sweep(run_dma_call)
    ref = make_sweep(
        lambda c, t1, t2, i, m: fused_ctx_pool(
            EmbeddedTables(c, t1, t2), i, m, True, force="reference"
        )
    )

    for name, sweep in (("per-row", per_row), ("per-run", per_run),
                        ("xla-ref", ref)):
        def timed(n):
            t0 = time.time()
            float(sweep(clip, tr1, tr2, idx, mask, jnp.int32(n)))
            return time.time() - t0

        timed(2)
        per = []
        for rep in range(3):
            ts = timed(20 + rep)
            tl = timed(120 + rep)
            per.append((tl - ts) / 100)
        med = sorted(per)[1]
        log("%s: %.3f ms/call (reps %s)"
            % (name, med * 1000, [round(p * 1e3, 3) for p in per]))


if __name__ == "__main__":
    main()
