"""Real-hardware kernel parity at production dims (run via `pytest -m tpu`).

The CPU suite only ever exercises the pallas kernels in interpret mode;
this script runs them compiled on the actual chip at the flagship eval
shapes and compares against the jnp reference path — the exact failure
class BENCH.md's r1 history documents (a VMEM guard silently disabling
the kernel at real dims would also be caught: force='pallas' raises
instead of falling back).

Exit codes: 0 ok, 3 no TPU backend (caller skips), 1 mismatch/error.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("no TPU backend (got %r)" % jax.default_backend())
        return 3

    import jax.numpy as jnp
    import numpy as np

    from lirec_tpu.models.tabular import EmbeddedTables
    from lirec_tpu.ops.gather_pool import fused_ctx_pool, gather_masked_sum

    rng = np.random.default_rng(0)
    n_clips, n_tracks, joint = 2048, 4096, 512
    B, T, R = 64, 20, 18
    M = B * T

    def randn(*shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)
        )

    emb = EmbeddedTables(
        clip=randn(n_clips, 2 * joint),
        tr1=randn(n_tracks, joint // 2),
        tr2=randn(n_tracks, joint // 2),
    )
    idx = jnp.asarray(
        rng.integers(
            0, [n_clips, n_tracks, n_tracks], size=(M, R, 3)
        ).astype(np.int32)
    )
    mask = (rng.random((M, R)) < 0.5).astype(np.float32)
    mask[:5] = 0.0  # all-masked rows exercise the zero-divider guard
    mask = jnp.asarray(mask)

    kern = np.asarray(
        fused_ctx_pool(emb, idx, mask, guard_zero_divide=True,
                       force="pallas")
    )
    ref = np.asarray(
        fused_ctx_pool(emb, idx, mask, guard_zero_divide=True,
                       force="reference")
    )
    np.testing.assert_allclose(kern, ref, rtol=2e-5, atol=2e-6,
                               err_msg="fused_ctx_pool on-chip mismatch")
    print("fused_ctx_pool ok at real dims: out %s, max |diff| %.2e"
          % (kern.shape, float(np.abs(kern - ref).max())))

    # HBM-streaming tier at REAL-SPLIT cardinality (tables > VMEM budget:
    # 12288*1024 + 2*24576*256 f32 = 96 MB) — the tier the r4 stress bench
    # showed falling back to the 3x-slower XLA gather graph
    big_emb = EmbeddedTables(
        clip=randn(12288, 2 * joint),
        tr1=randn(24576, joint // 2),
        tr2=randn(24576, joint // 2),
    )
    big_idx = jnp.asarray(
        rng.integers(
            0, [12288, 24576, 24576], size=(M, R, 3)
        ).astype(np.int32)
    )
    kern_h = np.asarray(
        fused_ctx_pool(big_emb, big_idx, mask, guard_zero_divide=True,
                       force="pallas-hbm")
    )
    ref_h = np.asarray(
        fused_ctx_pool(big_emb, big_idx, mask, guard_zero_divide=True,
                       force="reference")
    )
    np.testing.assert_allclose(
        kern_h, ref_h, rtol=2e-5, atol=2e-6,
        err_msg="fused_ctx_pool HBM tier on-chip mismatch",
    )
    print("fused_ctx_pool HBM tier ok at real-split dims: out %s, "
          "max |diff| %.2e"
          % (kern_h.shape, float(np.abs(kern_h - ref_h).max())))

    # packed-bf16 VMEM tier at the same real-split cardinality (the r4
    # cast policy: 96 MiB f32 -> 48 MiB packed fits the VMEM budget
    # again; columns ride int32 words because Mosaic rejects dynamic row
    # gathers of 16-bit VMEM arrays). f32 accumulation inside the kernel;
    # compared bit-closely against the packed reference and within bf16
    # rounding against the f32 reference.
    from lirec_tpu.ops.gather_pool import pack_bf16_table

    big16 = EmbeddedTables(
        clip=pack_bf16_table(big_emb.clip),
        tr1=pack_bf16_table(big_emb.tr1),
        tr2=pack_bf16_table(big_emb.tr2),
    )
    kern_b = np.asarray(
        fused_ctx_pool(big16, big_idx, mask, guard_zero_divide=True,
                       force="pallas")
    )
    assert kern_b.dtype == np.float32
    ref_b = np.asarray(
        fused_ctx_pool(big16, big_idx, mask, guard_zero_divide=True,
                       force="reference")
    )
    np.testing.assert_allclose(
        kern_b, ref_b, rtol=2e-5, atol=2e-6,
        err_msg="fused_ctx_pool packed-bf16 tier on-chip mismatch",
    )
    np.testing.assert_allclose(
        kern_b, ref_h, rtol=3e-2, atol=3e-2,
        err_msg="fused_ctx_pool packed-bf16 tier drifted beyond bf16 "
                "rounding vs the f32 reference",
    )
    print("fused_ctx_pool packed-bf16 VMEM tier ok at real-split dims: "
          "max |diff| %.2e vs packed ref, %.2e vs f32 ref"
          % (float(np.abs(kern_b - ref_b).max()),
             float(np.abs(kern_b - ref_h).max())))

    # packed tables through the HBM tier (giant scale: even packed
    # exceeds the VMEM budget — halved DMA bytes vs f32 HBM streaming)
    kern_bh = np.asarray(
        fused_ctx_pool(big16, big_idx, mask, guard_zero_divide=True,
                       force="pallas-hbm")
    )
    np.testing.assert_allclose(
        kern_bh, ref_b, rtol=2e-5, atol=2e-6,
        err_msg="fused_ctx_pool packed HBM tier on-chip mismatch",
    )
    print("fused_ctx_pool packed-bf16 HBM tier ok: max |diff| %.2e vs "
          "packed ref" % float(np.abs(kern_bh - ref_b).max()))

    table = randn(n_clips, 2 * joint)
    idx2 = jnp.asarray(
        rng.integers(0, n_clips, size=(M, R)).astype(np.int32)
    )
    mask2 = jnp.asarray((rng.random((M, R)) < 0.5).astype(np.float32))
    a = np.asarray(gather_masked_sum(table, idx2, mask2, force="pallas"))
    b = np.asarray(gather_masked_sum(table, idx2, mask2, force="reference"))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6,
                               err_msg="gather_masked_sum on-chip mismatch")
    print("gather_masked_sum ok at real dims: out %s" % (a.shape,))

    # scatter-accumulate (the train backward's table-grad kernel) at the
    # real update shapes, bf16 updates with duplicate rows
    from lirec_tpu.ops.scatter_accum import (
        scatter_accum3, scatter_accum3_reference,
    )

    # the 3D layout the train VJP actually passes ([N, R, 3] / [N, R, D])
    idx3 = jnp.asarray(
        rng.integers(
            0, [n_clips, n_tracks, n_tracks], size=(M, R, 3)
        ).astype(np.int32)
    )
    gc = jnp.asarray(
        rng.standard_normal((M, R, 2 * joint)).astype(np.float32)
    ).astype(jnp.bfloat16)
    g1 = jnp.asarray(
        rng.standard_normal((M, R, joint)).astype(np.float32)
    ).astype(jnp.bfloat16)
    g2 = jnp.asarray(
        rng.standard_normal((M, R, joint)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ker = scatter_accum3(idx3, gc, g1, g2, n_clips, n_tracks, force="pallas")
    ref3 = scatter_accum3_reference(idx3, gc, g1, g2, n_clips, n_tracks)
    for got, want, name in zip(ker, ref3, ("clip", "tr1", "tr2")):
        got, want = np.asarray(got), np.asarray(want)
        # the kernel accumulates f32 where XLA accumulates bf16 — compare
        # with a tolerance matching bf16 accumulation error at ~11-way
        # collisions
        np.testing.assert_allclose(
            got, want, rtol=2e-2, atol=2e-1,
            err_msg="scatter_accum3 %s on-chip mismatch" % name,
        )
    print("scatter_accum3 ok at real dims (f32 accum vs bf16 reference)")

    # the tiered single-table kernel (what full-data scale uses when the
    # track accumulators outgrow VMEM) compiled at the clip-table shape
    from lirec_tpu.ops.scatter_accum import _pallas_call1

    acc1 = np.asarray(
        _pallas_call1(idx3[..., 0], gc, n_clips)
    )
    want1 = np.asarray(ref3[0])
    np.testing.assert_allclose(
        acc1, want1, rtol=2e-2, atol=2e-1,
        err_msg="single-table scatter kernel on-chip mismatch",
    )
    print("single-table scatter kernel ok at real dims")

    # real-SPLIT cardinality: the 50.3 MB clip accumulator that the old
    # 48 MB _table_fits gate bounced to XLA (r4 stress bench)
    idx_big = jnp.asarray(
        rng.integers(0, 12288, size=(M, R)).astype(np.int32)
    )
    acc_big = np.asarray(_pallas_call1(idx_big, gc, 12288))
    want_big = np.asarray(
        jnp.zeros((12288, 2 * joint), jnp.float32)
        .at[idx_big.reshape(-1)]
        .add(gc.reshape(-1, 2 * joint).astype(jnp.float32))
    )
    np.testing.assert_allclose(
        acc_big, want_big, rtol=2e-2, atol=2e-1,
        err_msg="single-table scatter kernel real-split mismatch",
    )
    print("single-table scatter kernel ok at real-split rows (50 MB acc)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
