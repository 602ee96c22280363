"""Kernel-dispatch observability (ops/dispatch.py): every auto-dispatch
decision must be recorded — the r1 silent-kernel-disable / r3 B=256 SMEM
cliff failure class (BENCH.md) is only catchable if the chosen tier is
visible to tools and tests."""

import numpy as np
import pytest

from lirec_tpu.ops import dispatch, gather_pool, scatter_accum


class _Emb:
    def __init__(self, clip, tr1, tr2):
        self.clip, self.tr1, self.tr2 = clip, tr1, tr2


def _emb(n_clip=16, n_tr=16, d=128):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    return _Emb(
        jnp.asarray(rng.standard_normal((n_clip, d)), jnp.float32),
        jnp.asarray(rng.standard_normal((n_tr, d // 2)), jnp.float32),
        jnp.asarray(rng.standard_normal((n_tr, d // 2)), jnp.float32),
    )


def test_fused_ctx_pool_records_fallback_reason():
    dispatch.reset()
    emb = _emb()
    idx = np.zeros((8, 3, 3), np.int32)
    mask = np.ones((8, 3), np.float32)
    gather_pool.fused_ctx_pool(emb, idx, mask, guard_zero_divide=True)
    rec = dispatch.last_dispatch("fused_ctx_pool")
    assert rec is not None and rec["path"] == "reference"
    assert rec["reason"] == "not on TPU"  # CPU test runner
    assert rec["shapes"]["idx"] == (8, 3, 3)


def test_fused_ctx_pool_records_forced():
    dispatch.reset()
    emb = _emb()
    idx = np.zeros((8, 3, 3), np.int32)
    mask = np.ones((8, 3), np.float32)
    gather_pool.fused_ctx_pool(
        emb, idx, mask, guard_zero_divide=True, force="reference"
    )
    rec = dispatch.last_dispatch("fused_ctx_pool")
    assert rec["path"] == "reference" and rec["reason"] == "forced"


def test_ctx_force_env_override(monkeypatch):
    dispatch.reset()
    monkeypatch.setenv("LIREC_TPU_CTX_FORCE", "reference")
    emb = _emb()
    idx = np.zeros((8, 3, 3), np.int32)
    mask = np.ones((8, 3), np.float32)
    gather_pool.fused_ctx_pool(emb, idx, mask, guard_zero_divide=True)
    rec = dispatch.last_dispatch("fused_ctx_pool")
    assert rec["path"] == "reference" and rec["reason"] == "forced"


def test_scatter_tiered_dispatch_records_tiers():
    """At cardinalities where the 3-table accumulators exceed VMEM but the
    clip table alone fits, the tiered path must run — and say so."""
    import jax.numpy as jnp

    dispatch.reset()
    rng = np.random.default_rng(1)
    n, r, d_c, d_t = 8, 2, 128, 128
    # track tables far beyond the single-table VMEM budget, clip inside it
    n_clip, n_tr = 64, 300_000
    idx3 = np.stack(
        [
            rng.integers(0, n_clip, (n, r)),
            rng.integers(0, n_tr, (n, r)),
            rng.integers(0, n_tr, (n, r)),
        ],
        axis=-1,
    ).astype(np.int32)
    g = jnp.asarray(rng.standard_normal((n, r, d_c)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((n, r, d_t)), jnp.float32)
    outs = scatter_accum._dispatch_scatter(
        jnp.asarray(idx3), g, gt, gt, n_clip, n_tr, force="interpret"
    )
    rec = dispatch.last_dispatch("scatter_accum")
    assert rec is not None and rec["path"].startswith("tiered:")
    assert rec["path"] == "tiered:pallas/xla/xla"
    # and the tiered result equals the pure-XLA reference
    ref = scatter_accum.scatter_accum3_reference(
        jnp.asarray(idx3), g, gt, gt, n_clip, n_tr
    )
    for a, b in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_scatter_cpu_auto_records_fallback():
    import jax.numpy as jnp

    dispatch.reset()
    idx3 = np.zeros((8, 2, 3), np.int32)
    g = jnp.ones((8, 2, 128), jnp.float32)
    scatter_accum.scatter_accum3(idx3, g, g, g, 4, 4, force="auto")
    rec = dispatch.last_dispatch("scatter_accum")
    assert rec["path"] == "xla-scatter" and rec["reason"] == "not on TPU"


def test_adaptive_tile_picks_largest_dividing_m():
    dispatch.reset()
    emb = _emb()
    idx = np.zeros((96, 3, 3), np.int32)  # 96 % 32 == 0
    mask = np.ones((96, 3), np.float32)
    gather_pool.fused_ctx_pool(emb, idx, mask, guard_zero_divide=True)
    assert dispatch.last_dispatch("fused_ctx_pool")["shapes"]["tile_m"] == 32
    dispatch.reset()
    idx = np.zeros((80, 3, 3), np.int32)  # 80: not 32, yes 16
    mask = np.ones((80, 3), np.float32)
    gather_pool.fused_ctx_pool(emb, idx, mask, guard_zero_divide=True)
    assert dispatch.last_dispatch("fused_ctx_pool")["shapes"]["tile_m"] == 16


def test_adaptive_tile_respects_hbm_scratch_gate():
    """Huge f32 rows past the VMEM budget: tile 32's per-tile scratch
    would exceed the HBM tier's 8 MB bound, so the picker must step down
    instead of disabling the kernel (the review-found failure)."""
    dispatch.reset()
    # rows of 4096 + 2*2048 = 8192 f32 cols; tables ~ > VMEM budget
    emb = _emb(n_clip=2048, n_tr=2048, d=8192)
    R = 18
    idx = np.zeros((96, R, 3), np.int32)
    mask = np.ones((96, R), np.float32)
    gather_pool.fused_ctx_pool(emb, idx, mask, guard_zero_divide=True)
    shapes = dispatch.last_dispatch("fused_ctx_pool")["shapes"]
    # 32*18*64KiB = 37.7 MB and 16 -> 18.9 MB both fail the 8 MB bound;
    # 8 -> 9.4 MB fails too, so the picker falls back to the historical
    # tile 8 default (same kernel-disable outcome as pre-change, never a
    # WORSE one than before)
    assert shapes["tile_m"] == 8


def test_explicit_tile_m_is_honored():
    dispatch.reset()
    emb = _emb()
    idx = np.zeros((96, 3, 3), np.int32)
    mask = np.ones((96, 3), np.float32)
    gather_pool.fused_ctx_pool(
        emb, idx, mask, guard_zero_divide=True, tile_m=8
    )
    assert dispatch.last_dispatch("fused_ctx_pool")["shapes"]["tile_m"] == 8
