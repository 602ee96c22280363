#!/usr/bin/env python
"""Probe: packed-bf16 (int32-paired) dynamic row gather in a pallas TPU
kernel.

Mosaic rejects dynamic single-row loads from bf16 VMEM tables ("cannot
statically prove that index in dimension 0 is a multiple of 8" — 16-bit
tiling packs 2 rows per sublane). This probes the workaround: pack bf16
columns (d, d + D/2) into one int32 word (32-bit tiling = same dynamic
row-load support as f32) and unpack in-kernel with shift/mask + bitcast.

Run: env PYTHONPATH=/root/repo python tools/probe_bf16_pack.py
"""

import sys

import numpy as np


def pack(table_f32):
    """f32 [N, D] -> int32 [N, D/2]: word d = bf16(col d) | bf16(col d+D/2)<<16."""
    import jax.numpy as jnp

    b = table_f32.astype(jnp.bfloat16)
    N, D = b.shape
    lo, hi = b[:, : D // 2], b[:, D // 2 :]
    pair = jnp.stack([lo, hi], axis=-1)  # [N, D/2, 2] little-endian
    return jax.lax.bitcast_convert_type(pair, jnp.int32)


def make_kernel(r_count, d_half):
    import jax
    import jax.numpy as jnp

    def kernel(idx_ref, mask_ref, tab_ref, out_ref):
        for m in range(8):
            acc_lo = jnp.zeros((d_half,), jnp.float32)
            acc_hi = jnp.zeros((d_half,), jnp.float32)
            for r in range(r_count):
                w = mask_ref[0, 0, m * r_count + r]
                v = tab_ref[idx_ref[0, 0, m * r_count + r], :]  # int32 [d_half]
                f_lo = jax.lax.bitcast_convert_type(
                    jax.lax.shift_left(v, 16), jnp.float32
                )
                f_hi = jax.lax.bitcast_convert_type(
                    jax.lax.bitwise_and(v, jnp.int32(-65536)), jnp.float32
                )
                acc_lo = acc_lo + w * f_lo
                acc_hi = acc_hi + w * f_hi
            out_ref[m, :d_half] = acc_lo
            out_ref[m, d_half:] = acc_hi

    return kernel


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = "--interpret" in sys.argv
    rng = np.random.default_rng(0)
    N, D, M, R = 512, 1024, 64, 18
    table = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (M, R)), jnp.int32)
    mask = jnp.asarray((rng.random((M, R)) < 0.5), jnp.float32)

    packed = pack(table)
    idx_t = idx.reshape(M // 8, 1, 8 * R)
    mask_t = mask.reshape(M // 8, 1, 8 * R)
    out = pl.pallas_call(
        make_kernel(R, D // 2),
        grid=(M // 8,),
        in_specs=[
            pl.BlockSpec((1, 1, 8 * R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8 * R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        interpret=interpret,
    )(idx_t, mask_t, packed)

    b = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = (b[idx] * mask[..., None]).sum(axis=-2)
    err = float(jnp.abs(out - ref).max())
    print("backend=%s interpret=%s max|diff|=%.3e"
          % (jax.default_backend(), interpret, err))
    assert err < 1e-5, "packed-bf16 gather mismatch"
    print("OK")


if __name__ == "__main__":
    main()
