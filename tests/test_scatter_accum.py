"""scatter_accum3 kernel (interpret mode) == XLA .at[].add; the gather_h1
custom VJP matches plain-gather gradients. The kernel is DEFAULT-ON in
the single-device train backward (models/hybrid._pooled_ctx_from_h1):
a real-step profile showed XLA's in-program scatters at 1.31 ms/step vs
~0.7 for the kernel (BENCH.md r3c — the earlier isolated microbenchmark
that said XLA wins mismeasured the in-program cost). Compiled real-dim
parity runs in the `pytest -m tpu` lane (tests/tpu_kernel_check.py);
tools/bench_scatter.py reproduces the timing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lirec_tpu.ops import scatter_accum as sa


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    M, NC, NT, DC, DT = 64, 17, 23, 256, 128
    idx3 = rng.integers(0, [NC, NT, NT], size=(M, 3)).astype(np.int32)
    return (
        jnp.asarray(idx3),
        jnp.asarray(rng.standard_normal((M, DC)), jnp.float32),
        jnp.asarray(rng.standard_normal((M, DT)), jnp.float32),
        jnp.asarray(rng.standard_normal((M, DT)), jnp.float32),
        NC, NT,
    )


def test_scatter_accum3_interpret_matches_xla(data):
    idx3, gc, g1, g2, NC, NT = data
    ref = sa.scatter_accum3_reference(idx3, gc, g1, g2, NC, NT)
    ker = sa.scatter_accum3(idx3, gc, g1, g2, NC, NT, force="interpret")
    for a, b in zip(ref, ker):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_gather_h1_vjp_matches_plain_gather(data):
    idx3, _, _, _, NC, NT = data
    rng = np.random.default_rng(1)
    clip = jnp.asarray(rng.standard_normal((NC, 256)), jnp.float32)
    tr1 = jnp.asarray(rng.standard_normal((NT, 128)), jnp.float32)
    tr2 = jnp.asarray(rng.standard_normal((NT, 128)), jnp.float32)

    def loss_custom(c, t1, t2):
        a, b, d = sa.gather_h1(c, t1, t2, idx3)
        return jnp.tanh(a).sum() + (b * d).sum()

    def loss_plain(c, t1, t2):
        a = c[idx3[:, 0]]
        b, d = t1[idx3[:, 1]], t2[idx3[:, 2]]
        return jnp.tanh(a).sum() + (b * d).sum()

    old = sa._FORCE
    try:
        sa._FORCE = "interpret"
        ga = jax.grad(loss_custom, argnums=(0, 1, 2))(clip, tr1, tr2)
    finally:
        sa._FORCE = old
    gb = jax.grad(loss_plain, argnums=(0, 1, 2))(clip, tr1, tr2)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_scatter_accum3_shape_gate():
    bad_idx = jnp.zeros((7, 3), jnp.int32)  # M % 8 != 0
    g = jnp.zeros((7, 128), jnp.float32)
    with pytest.raises(ValueError, match="scatter_accum3"):
        sa.scatter_accum3(bad_idx, g, g, g, 16, 16, force="pallas")


def test_scatter_accum3_3d_interpret_matches_xla(data):
    """The native-3D update path (what the train VJP actually passes:
    idx [N, R, 3], updates [N, R, D])."""
    idx3, gc, g1, g2, NC, NT = data
    N, R = 16, 4
    idx3 = idx3[: N * R].reshape(N, R, 3)
    gc = gc[: N * R].reshape(N, R, -1)
    g1 = g1[: N * R].reshape(N, R, -1)
    g2 = g2[: N * R].reshape(N, R, -1)
    ref = sa.scatter_accum3_reference(idx3, gc, g1, g2, NC, NT)
    ker = sa.scatter_accum3(idx3, gc, g1, g2, NC, NT, force="interpret")
    for a, b in zip(ref, ker):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_tiered_dispatch_matches_reference(monkeypatch, data):
    """When the 3-table kernel doesn't fit, each table independently gets
    the single-table kernel or XLA's scatter — results identical."""
    idx3, gc, g1, g2, NC, NT = data
    N, R = 16, 4
    idx3 = idx3[: N * R].reshape(N, R, 3)
    gc = gc[: N * R].reshape(N, R, -1)
    g1 = g1[: N * R].reshape(N, R, -1)
    g2 = g2[: N * R].reshape(N, R, -1)
    ref = sa.scatter_accum3_reference(idx3, gc, g1, g2, NC, NT)

    monkeypatch.setattr(sa, "_supported", lambda *a: False)
    all_kernel = sa._dispatch_scatter(idx3, gc, g1, g2, NC, NT, "interpret")
    for a, b in zip(ref, all_kernel):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )

    # clip fits, tracks "too big" -> mixed kernel/XLA
    monkeypatch.setattr(sa, "_table_fits", lambda n_rows, d: d == 256)
    mixed = sa._dispatch_scatter(idx3, gc, g1, g2, NC, NT, "interpret")
    for a, b in zip(ref, mixed):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_meshed_train_grads_match_single_device_kernel_path():
    """The shard_map backward (per-shard kernel + psum of partial table
    grads) must produce the single-device gradients — exercised with the
    kernel ON (interpret mode) at kernel-compatible dims."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lirec_tpu import config as config_lib
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.parallel.mesh import make_mesh
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=256)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, 11, n_rels=6)
    mesh = make_mesh(shape=(4, 2))
    tables = jax.tree.map(jnp.asarray, make_tables(bundle.spec, 32, 48))
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(bundle.spec, 16, 32, 48).items()
    }
    model_batch = {k: batch[k] for k in ("feat_idx", "rels_mask")}
    rng = jax.random.PRNGKey(0)

    def loss_fn(p, data_mesh):
        out = bundle.apply(
            p, model_batch, tables=tables, deterministic=False,
            rng=rng, data_mesh=data_mesh,
        )
        return bundle.loss(out, batch, rng=rng, tr_sum_max_flag=True)

    old = sa._FORCE
    try:
        sa._FORCE = "interpret"
        g_single = jax.grad(loss_fn)(bundle.params, None)
        sharded_batch = {
            k: jax.device_put(
                v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            )
            for k, v in batch.items()
        }
        model_batch = {k: sharded_batch[k] for k in ("feat_idx", "rels_mask")}
        batch_ref = sharded_batch
        def loss_fn_sharded(p):
            out = bundle.apply(
                p, model_batch, tables=tables, deterministic=False,
                rng=rng, data_mesh=mesh,
            )
            return bundle.loss(out, batch_ref, rng=rng, tr_sum_max_flag=True)
        g_mesh = jax.jit(jax.grad(loss_fn_sharded))(bundle.params)
    finally:
        sa._FORCE = old
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        ),
        g_single, g_mesh,
    )
