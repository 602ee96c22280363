"""Pallas kernel equivalence (interpret mode on CPU) vs the jnp reference."""

import numpy as np
import pytest

from lirec_tpu.ops.gather_pool import (
    gather_masked_sum,
    gather_masked_sum_reference,
)


@pytest.mark.parametrize("M,R,N,D", [(16, 18, 64, 128), (8, 5, 32, 256)])
def test_gather_masked_sum_interpret(M, R, N, D):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((N, D)).astype(np.float32)
    idx = rng.integers(0, N, (M, R)).astype(np.int32)
    mask = (rng.random((M, R)) < 0.5).astype(np.float32)
    ref = gather_masked_sum_reference(table, idx, mask)
    out = gather_masked_sum(table, idx, mask, force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dispatch_falls_back_on_cpu():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((32, 128)).astype(np.float32)
    idx = rng.integers(0, 32, (8, 4)).astype(np.int32)
    mask = np.ones((8, 4), np.float32)
    out = gather_masked_sum(table, idx, mask)  # auto -> reference on CPU
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(gather_masked_sum_reference(table, idx, mask)),
        atol=1e-6,
    )


def _fused_inputs(M=16, R=18, Nc=32, Nt=48, Dc=256, Dt=128, seed=0,
                  zero_row=False):
    import jax.numpy as jnp

    from lirec_tpu.models.tabular import EmbeddedTables

    rng = np.random.default_rng(seed)
    emb = EmbeddedTables(
        clip=jnp.asarray(rng.standard_normal((Nc, Dc)), jnp.float32),
        tr1=jnp.asarray(rng.standard_normal((Nt, Dt)), jnp.float32),
        tr2=jnp.asarray(rng.standard_normal((Nt, Dt)), jnp.float32),
    )
    idx = np.stack(
        [rng.integers(0, Nc, (M, R)), rng.integers(0, Nt, (M, R)),
         rng.integers(0, Nt, (M, R))], axis=-1,
    ).astype(np.int32)
    mask = (rng.random((M, R)) < 0.4).astype(np.float32)
    if zero_row:
        mask[0] = 0  # exercises the zero-divider guard
    return emb, jnp.asarray(idx), jnp.asarray(mask)


@pytest.mark.parametrize("guard", [True, False])
@pytest.mark.parametrize("tile_m", [8, 16])
def test_fused_ctx_pool_interpret(guard, tile_m):
    """The default-on fused kernel (gathers + masked mean + tanh in one
    pallas_call) vs its jnp reference."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    emb, idx, mask = _fused_inputs(zero_row=guard)
    ref = fused_ctx_pool(emb, idx, mask, guard, force="reference")
    out = fused_ctx_pool(emb, idx, mask, guard, force="interpret",
                         tile_m=tile_m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("guard", [True, False])
def test_fused_ctx_pool_hbm_interpret(guard):
    """The HBM-streaming tier (tables in ANY memory, per-row async DMA
    gathers into VMEM scratch) vs the jnp reference — the tier auto
    dispatch picks at real-split cardinality where tables exceed VMEM."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    emb, idx, mask = _fused_inputs(zero_row=guard, seed=5)
    ref = fused_ctx_pool(emb, idx, mask, guard, force="reference")
    out = fused_ctx_pool(emb, idx, mask, guard, force="interpret-hbm")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_ctx_pool_hbm_gate():
    """Oversize per-tile scratch must raise on force, not silently fall
    back (the r1 silent-disable failure class)."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    # tile_m=256 -> per-tile row scratch 256*18*(1024+512)*4 = 28 MB > 8 MB
    emb, idx, mask = _fused_inputs(M=256, R=18, Dc=1024, Dt=256)
    with pytest.raises(ValueError):
        fused_ctx_pool(emb, idx, mask, True, force="pallas-hbm",
                       tile_m=256)


def test_fused_ctx_pool_matches_model_path():
    """auto dispatch on CPU (reference) must equal the model's jnp ctx
    branch — the values the parity suite is golden against."""
    import jax.numpy as jnp

    from lirec_tpu.models.tabular import _pooled_ctx
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    emb, idx, mask = _fused_inputs(seed=3)
    via_kernel_api = fused_ctx_pool(emb, idx, mask, True)  # auto: CPU -> jnp
    via_model = jnp.tanh(_pooled_ctx(emb, idx, mask, guard_zero_divide=True))
    np.testing.assert_allclose(
        np.asarray(via_kernel_api), np.asarray(via_model), atol=1e-6
    )


def _packed(emb):
    from lirec_tpu.models.tabular import EmbeddedTables
    from lirec_tpu.ops.gather_pool import pack_bf16_table

    return EmbeddedTables(
        clip=pack_bf16_table(emb.clip),
        tr1=pack_bf16_table(emb.tr1),
        tr2=pack_bf16_table(emb.tr2),
    )


def test_pack_unpack_roundtrip():
    """pack_bf16_table/unpack_bf16_table invert exactly (modulo the bf16
    rounding applied at pack time) and preserve column order."""
    import jax.numpy as jnp

    from lirec_tpu.ops.gather_pool import pack_bf16_table, unpack_bf16_table

    rng = np.random.default_rng(11)
    t = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    packed = pack_bf16_table(t)
    assert packed.shape == (32, 128) and packed.dtype == jnp.int32
    want = np.asarray(t.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(unpack_bf16_table(packed)), want)


def test_fused_ctx_pool_packed_bf16_tables():
    """r4: the VMEM tier accepts int32-PACKED bf16 tables (the cast policy
    that keeps real-split tables VMEM-resident; direct bf16 gathers don't
    lower on Mosaic) — f32 accumulation, f32 output. The kernel must match
    the reference on the SAME packed tables bit-closely, and the f32
    reference within bf16 rounding."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    # packed halves must keep D % 128 lanes -> logical dims % 256
    # (production dims 1024/256 qualify)
    emb, idx, mask = _fused_inputs(zero_row=True, seed=7, Dc=512, Dt=256)
    ref_f32 = fused_ctx_pool(emb, idx, mask, True, force="reference")
    emb_p = _packed(emb)
    ref_p = fused_ctx_pool(emb_p, idx, mask, True, force="reference")
    out = fused_ctx_pool(emb_p, idx, mask, True, force="interpret")
    assert np.asarray(out).dtype == np.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_p), atol=1e-6)
    # tanh(pool) lands in [-1, 1]: bf16 table rounding bounds the error
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_f32), atol=3e-2
    )


def test_pooled_ctx_handles_packed_tables():
    """The jnp model path (meshed tails, context-sharded eval) must accept
    packed tables too — it unpacks before gathering."""
    import jax.numpy as jnp

    from lirec_tpu.models.tabular import _pooled_ctx
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    emb, idx, mask = _fused_inputs(seed=9)
    emb_p = _packed(emb)
    via_model = jnp.tanh(
        _pooled_ctx(emb_p, idx, mask, guard_zero_divide=True)
    )
    via_ref = fused_ctx_pool(emb_p, idx, mask, True, force="reference")
    np.testing.assert_allclose(
        np.asarray(via_model), np.asarray(via_ref), atol=1e-6
    )


def test_ctx_tables_cast_policy():
    """The bf16 cast fires exactly when it is what restores VMEM residency."""
    import jax.numpy as jnp

    from lirec_tpu.ops.gather_pool import (
        VMEM_TABLE_BUDGET,
        ctx_tables_cast_dtype,
    )

    assert ctx_tables_cast_dtype(VMEM_TABLE_BUDGET - 1) is None  # f32 fits
    # real-split shape: ~101 MB f32 -> bf16 brings it under the budget
    assert ctx_tables_cast_dtype(101 * 2**20) == jnp.bfloat16
    # far beyond bf16 reach -> stay f32, HBM tier handles it
    assert ctx_tables_cast_dtype(3 * VMEM_TABLE_BUDGET) is None


def test_ctx_cast_decision_policy():
    """Packed-bf16 table decision (models/tabular.ctx_cast_decision):
    default-on under bf16 compute (perf mode), fit-driven under f32
    compute, off on CPU / forced-reference / bad dims / explicit f32."""
    from lirec_tpu.models.tabular import ctx_cast_decision
    from lirec_tpu.ops.gather_pool import VMEM_TABLE_BUDGET

    small, big = 10 * 2**20, VMEM_TABLE_BUDGET + 2**20
    # bf16 compute on TPU: packed at every cardinality
    assert ctx_cast_decision("tpu", "auto", True, small, True)
    assert ctx_cast_decision("tpu", "auto", True, big, True)
    # f32 compute: precision-first — pack only to restore VMEM residency
    assert not ctx_cast_decision("tpu", "auto", False, small, True)
    assert ctx_cast_decision("tpu", "auto", False, big, True)
    assert not ctx_cast_decision(
        "tpu", "auto", False, 3 * VMEM_TABLE_BUDGET, True
    )  # beyond bf16 reach: HBM tier instead
    # hard gates
    assert not ctx_cast_decision("cpu", "auto", True, big, True)
    assert not ctx_cast_decision("tpu", "f32", True, big, True)
    assert not ctx_cast_decision("tpu", "auto", True, big, False)
    assert not ctx_cast_decision(
        "tpu", "auto", True, big, True, kernel_force="reference"
    )
    # explicit force wins over f32 compute
    assert ctx_cast_decision("tpu", "bf16", False, small, True)


def test_fused_ctx_pool_hbm_packed_interpret():
    """Packed-bf16 tables through the HBM-streaming tier (giant scale:
    packed tables still exceed the VMEM budget — halved DMA bytes)."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool

    emb, idx, mask = _fused_inputs(zero_row=True, seed=13, Dc=512, Dt=256)
    emb_p = _packed(emb)
    ref_p = fused_ctx_pool(emb_p, idx, mask, True, force="reference")
    out = fused_ctx_pool(emb_p, idx, mask, True, force="interpret-hbm")
    assert np.asarray(out).dtype == np.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_p), atol=1e-6)


def _triple_inputs(emb, idx, packed=False):
    """Build (fused local table, tidx, wc, wt) from 3-table kernel inputs:
    the transform models/factory.apply_model performs from the per-batch
    unique triples of data/localize.localize_eval_ctx_triples."""
    import jax.numpy as jnp

    from lirec_tpu.data.localize import localize_eval_ctx_triples

    M, R, _ = idx.shape
    nt = int(max(int(emb.tr1.shape[0]), int(np.asarray(idx).max()) + 1))
    # localize_eval_ctx_triples expects [N, 1+R, 3] with slot 0 global
    fi = np.concatenate(
        [np.zeros((M, 1, 3), np.int32), np.asarray(idx)], axis=1
    )
    tidx, triples = localize_eval_ctx_triples(fi, M, 1, nt)
    tri = triples[0]
    e = _packed(emb) if packed else emb
    fused = jnp.concatenate(
        [e.clip[tri[:, 0]], e.tr1[tri[:, 1]], e.tr2[tri[:, 2]]], axis=-1
    )
    return fused, jnp.asarray(tidx), int(e.clip.shape[1]), int(e.tr1.shape[1])


@pytest.mark.parametrize("guard", [True, False])
@pytest.mark.parametrize("tile_m", [8, 16])
def test_fused_ctx_pool_triple_interpret(guard, tile_m):
    """The triple tier (ONE fused-row gather per context entry) vs the
    3-table kernel's jnp reference: same values, 3x fewer gather issues."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool, fused_ctx_pool_triple

    emb, idx, mask = _fused_inputs(zero_row=guard)
    ref = fused_ctx_pool(emb, idx, mask, guard, force="reference")
    fused, tidx, wc, wt = _triple_inputs(emb, idx)
    out = fused_ctx_pool_triple(fused, tidx, mask, wc, wt, guard,
                                force="interpret", tile_m=tile_m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_ctx_pool_triple_reference_bitwise():
    """The triple tier's jnp fallback must be BITWISE equal to the 3-table
    reference (per-segment pooling keeps XLA's reduction shapes identical)
    — evaluate_packed's exact-metric contract rides on this."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool, fused_ctx_pool_triple

    emb, idx, mask = _fused_inputs(zero_row=True, seed=5)
    ref = fused_ctx_pool(emb, idx, mask, True, force="reference")
    fused, tidx, wc, wt = _triple_inputs(emb, idx)
    out = fused_ctx_pool_triple(fused, tidx, mask, wc, wt, True,
                                force="reference")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_ctx_pool_triple_packed_bf16():
    """Packed-bf16 fused rows (segment-wise int32 packing): the kernel
    unpacks per segment and must match its own unpacked reference exactly,
    and the f32 path at bf16 tolerance."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool_triple

    emb, idx, mask = _fused_inputs(zero_row=True, seed=9, Dc=512, Dt=256)
    fused, tidx, wc, wt = _triple_inputs(emb, idx, packed=True)
    assert fused.dtype == np.int32 and fused.shape[1] == wc + 2 * wt
    ref_p = fused_ctx_pool_triple(fused, tidx, mask, wc, wt, True,
                                  force="reference")
    out = fused_ctx_pool_triple(fused, tidx, mask, wc, wt, True,
                                force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_p), atol=1e-6)
    fused_f, tidx_f, wcf, wtf = _triple_inputs(emb, idx)
    ref_f = fused_ctx_pool_triple(fused_f, tidx_f, mask, wcf, wtf, True,
                                  force="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_f), atol=3e-2)


@pytest.mark.parametrize("guard", [True, False])
@pytest.mark.parametrize("packed", [False, True])
def test_fused_ctx_pool_matmul_tier(guard, packed):
    """The MXU tier (pooled = one-hot S @ T_local) vs the jnp reference:
    identical values up to f32 summation ORDER (u-order with multiplicity
    weights instead of r-order), so allclose — never bitwise — and at bf16
    table tolerance for packed inputs."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool_triple

    emb, idx, mask = _fused_inputs(zero_row=guard, seed=21, Dc=512, Dt=256)
    fused, tidx, wc, wt = _triple_inputs(emb, idx, packed=packed)
    ref = fused_ctx_pool_triple(fused, tidx, mask, wc, wt, guard,
                                force="reference")
    out = fused_ctx_pool_triple(fused, tidx, mask, wc, wt, guard,
                                force="matmul")
    assert np.asarray(out).dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_matmul_pool_cost_model():
    """Auto dispatch crossover: small local tables pick the matmul tier,
    big ones keep the gather kernel (constants from the r4-final trace)."""
    from lirec_tpu.ops.gather_pool import matmul_pool_estimate_us

    # real-split shape: M=1280, R=18, U~3k, d=1536 -> matmul wins
    mm, kr = matmul_pool_estimate_us(1280, 18, 3080, 1536)
    assert mm < kr
    # the kernel estimate matches the measured 225us within ~5%
    assert abs(kr - 225.8) / 225.8 < 0.05
    # big local table (U=12k): the kernel wins
    mm_big, kr_big = matmul_pool_estimate_us(1280, 18, 12288, 1536)
    assert mm_big > kr_big


def test_fused_ctx_pool_triple_gate_raises():
    """Forcing the kernel on ineligible shapes must raise, never silently
    fall back (the r1 silent-disable failure class)."""
    from lirec_tpu.ops.gather_pool import fused_ctx_pool_triple

    emb, idx, mask = _fused_inputs(M=10)  # M % 8 != 0 at tile 8... M=10
    fused, tidx, wc, wt = _triple_inputs(emb, idx)
    with pytest.raises(ValueError):
        fused_ctx_pool_triple(fused, tidx[:, :], mask, wc, wt, True,
                              force="interpret", tile_m=8)


# ------------------------------------------------- gather-free row selects


def test_select_along_axis_matches_take_along_axis():
    """Bit-exact vs the gather for finite, -inf, and NaN values, int
    arrays, broadcasted per-(B,) indices over a middle axis, and
    out-of-range indices (clamped like take_along_axis's 'clip' mode)."""
    import jax.numpy as jnp

    from lirec_tpu.ops.select import select_along_axis

    rng = np.random.default_rng(7)
    x = rng.standard_normal((6, 5, 9)).astype(np.float32)
    x[0, 1, :] = -np.inf  # masked hypothesis row, as the losses produce
    x[2, 3, 4] = np.nan
    jx = jnp.asarray(x)

    # axis=2, one index per (B, T) row
    idx = rng.integers(0, 9, size=(6, 5)).astype(np.int32)
    want = np.take_along_axis(x, idx[:, :, None], axis=2)[:, :, 0]
    got = np.asarray(select_along_axis(jx, jnp.asarray(idx), axis=2))
    np.testing.assert_array_equal(got, want)

    # axis=2, one index per sample broadcast over T (the loss col pattern)
    bidx = rng.integers(0, 9, size=(6,)).astype(np.int32)
    want = np.take_along_axis(
        x, np.broadcast_to(bidx[:, None, None], (6, 5, 1)), axis=2
    )[:, :, 0]
    got = np.asarray(
        select_along_axis(jx, jnp.asarray(bidx)[:, None], axis=2)
    )
    np.testing.assert_array_equal(got, want)

    # axis=1 on an int array (the rel_at_gt pattern)
    ints = rng.integers(-3, 12, size=(6, 5)).astype(np.int32)
    i1 = rng.integers(0, 5, size=(6,)).astype(np.int32)
    want = np.take_along_axis(ints, i1[:, None], axis=1)[:, 0]
    got = np.asarray(
        select_along_axis(jnp.asarray(ints), jnp.asarray(i1), axis=1)
    )
    np.testing.assert_array_equal(got, want)

    # out-of-range clamps (both ends)
    oob = np.array([-4, 99, 0, 8, 3, -1], np.int32)
    want = np.take_along_axis(x[:, 0, :], np.clip(oob, 0, 8)[:, None],
                              axis=1)[:, 0]
    got = np.asarray(
        select_along_axis(jx[:, 0, :], jnp.asarray(oob), axis=1)
    )
    np.testing.assert_array_equal(got, want)


def test_select_along_axis_grad_is_dense_mask():
    """VJP equals take_along_axis's (cotangent lands on the selected
    element) — computed as a dense masked broadcast, no scatter."""
    import jax
    import jax.numpy as jnp

    from lirec_tpu.ops.select import select_along_axis

    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 7)),
                    jnp.float32)
    idx = jnp.asarray([2, 0, 6, 3], jnp.int32)

    g1 = jax.grad(lambda a: select_along_axis(a, idx, axis=1).sum())(x)
    g2 = jax.grad(
        lambda a: jnp.take_along_axis(a, idx[:, None], axis=1).sum()
    )(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
