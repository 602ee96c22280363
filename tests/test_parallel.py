"""Sharding correctness on the 8-device virtual CPU mesh: the dp x tp
sharded step must match the single-device step numerically, and parameters
must actually be distributed."""

import jax
import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.models.factory import create_model
from lirec_tpu.parallel.mesh import make_mesh, param_shardings
from lirec_tpu.parallel.step import make_sharded_train_step
from lirec_tpu.train.loop import make_train_step
from lirec_tpu.train.optim import make_optimizer
from lirec_tpu.utils.fake_batch import make_batch, make_tables

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _bundle():
    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32")
    return cfg, create_model(cfg, 11, n_rels=6)


def test_sharded_step_matches_single_device():
    cfg, bundle = _bundle()
    tables = make_tables(bundle.spec, n_clips=32, n_tracks=48)
    batch = make_batch(bundle.spec, batch_size=8, n_clips=32, n_tracks=48)
    tx = make_optimizer(cfg.optim.lr, cfg.optim.weight_decay)
    rng = jax.random.PRNGKey(0)

    # single device reference (deterministic=False uses dropout; the PRNG
    # stream is identical because the sharded path uses the same fold_ins)
    import jax.numpy as jnp

    jtables = jax.tree.map(jnp.asarray, tables)
    step = make_train_step(bundle, tx)
    params0 = bundle.params
    opt0 = tx.init(params0)
    p_single, _, loss_single = step(params0, opt0, batch, jtables, rng)

    mesh = make_mesh(shape=(4, 2))
    state = make_sharded_train_step(bundle, tx, mesh, bundle.params, tables)
    loss_sharded = state.step(batch, rng)

    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-5, atol=1e-6
    )
    flat_single = jax.tree.leaves(p_single)
    flat_sharded = jax.tree.leaves(jax.device_get(state.params))
    for a, b in zip(flat_single, flat_sharded):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )


def test_params_actually_sharded():
    cfg, bundle = _bundle()
    mesh = make_mesh(shape=(4, 2))
    shardings = param_shardings(bundle.params, mesh, gates=True)
    k = shardings["txt_ints"]["kernel"]
    assert "model" in str(k.spec), k.spec
    # commit and confirm device placement spans the model axis
    committed = jax.device_put(
        bundle.params["txt_ints"]["kernel"], k
    )
    assert len(committed.sharding.device_set) == 8
    # column-parallel: second dim split over model axis (2)
    shard_shapes = {s.data.shape for s in committed.addressable_shards}
    assert shard_shapes == {(16, 8)}, shard_shapes


def test_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_sequence_parallel_eval_matches():
    """dp x sp (context-axis) sharded eval == unsharded values."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, bundle = _bundle()
    tables = {
        k: jnp.asarray(v)
        for k, v in make_tables(bundle.spec, 32, 48, seed=9).items()
    }
    batch = make_batch(bundle.spec, 8, 32, 48, seed=10)
    mb = {k: batch[k] for k in ("feat_idx", "rels_mask")}
    plain = bundle.apply(bundle.params, mb, tables=tables)

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    sp_mesh = Mesh(devices, ("data", "context"))
    with jax.set_mesh(sp_mesh):
        feat_idx = jax.device_put(
            batch["feat_idx"], NamedSharding(sp_mesh, P("data"))
        )
        rels_mask = jax.device_put(
            batch["rels_mask"], NamedSharding(sp_mesh, P("data"))
        )
        sharded = jax.jit(
            lambda p, f, m, t: bundle.apply(
                p, {"feat_idx": f, "rels_mask": m}, tables=t,
                context_axis="context",
            )
        )(bundle.params, feat_idx, rels_mask, tables)
    np.testing.assert_allclose(
        np.asarray(plain["inters"]), np.asarray(sharded["inters"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(plain["rels"]), np.asarray(sharded["rels"]),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("preset,mode", [
    ("int_rel_ch", "test"),   # grounding counters under SPMD
    ("int_rels", "val"),      # rels hash segment-sum scatter under SPMD
    ("modalities", "val"),    # soft-gt top-k under SPMD
])
def test_packed_eval_spmd_matches_single_device(synth_root, preset, mode):
    """evaluate_packed over the 8-device mesh (batch axis sharded over
    'data') must produce the identical metric dict."""
    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset
    from lirec_tpu.evaluation.packed import evaluate_packed
    from lirec_tpu.models.factory import create_model

    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset(preset, data_root=synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    )
    cfg = cfg.with_optim(batch_size=8)
    ds = InteractionDataset(cfg, mode=mode)
    ds.cache()
    n_rels = 0
    if cfg.tasks.rels or cfg.tasks.rels_multitask:
        ds.init_relships()
        n_rels = max(len(ds.rels_list) - 1, 0)
    bundle = create_model(cfg, ds.n_classes, n_rels=n_rels)

    single = evaluate_packed(ds, bundle, bundle.params, cfg, mode=mode,
                             verbose=False)
    mesh = make_mesh(shape=(8, 1), axis_names=("data", "model"))
    sharded = evaluate_packed(ds, bundle, bundle.params, cfg, mode=mode,
                              verbose=False, mesh=mesh)
    assert set(single) == set(sharded)
    for key in single:
        np.testing.assert_allclose(sharded[key], single[key], rtol=1e-6,
                                   atol=1e-6, err_msg=key)


def test_packed_eval_spmd_ctx_localization_matches(synth_root):
    """Forced eval ctx localization under the SPMD sweep: the per-batch
    ctx_uniq_* id arrays replicate while sample rows shard over 'data';
    metrics must equal the plain single-device sweep exactly."""
    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset
    from lirec_tpu.evaluation.packed import evaluate_packed
    from lirec_tpu.models.factory import create_model

    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    )
    cfg = cfg.with_optim(batch_size=8)
    ds = InteractionDataset(cfg, mode="test")
    ds.cache()
    ds.init_relships()
    n_rels = max(len(ds.rels_list) - 1, 0)
    bundle = create_model(cfg, ds.n_classes, n_rels=n_rels)

    single = evaluate_packed(ds, bundle, bundle.params, cfg, mode="test",
                             verbose=False, localize_ctx=False)
    mesh = make_mesh(shape=(8, 1), axis_names=("data", "model"))
    localized = evaluate_packed(ds, bundle, bundle.params, cfg, mode="test",
                                verbose=False, mesh=mesh, localize_ctx=True)
    assert set(single) == set(localized)
    for key in single:
        np.testing.assert_allclose(localized[key], single[key], rtol=1e-6,
                                   atol=1e-6, err_msg=key)


def test_padded_leftover_batch_matches_ragged():
    """The padded leftover train batch (repeat row 0, loss weight 0 — what
    commit_batch does under a mesh) must produce the same loss and updated
    params as the natural ragged batch. dropout=0 so the mask stream's
    shape dependence doesn't enter (train-path dropout only needs
    distributional equivalence, PARITY.md)."""
    import jax.numpy as jnp

    from lirec_tpu import config as config_lib

    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32").with_optim(dropout=0.0)
    bundle = create_model(cfg, 11, n_rels=6)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, n_clips=32, n_tracks=48)
    )
    ragged = make_batch(bundle.spec, batch_size=5, n_clips=32, n_tracks=48)
    pad = 3
    padded = {
        k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
        for k, v in ragged.items()
    }
    padded["loss_weight"] = np.concatenate(
        [np.ones(5, np.float32), np.zeros(pad, np.float32)]
    )
    tx = make_optimizer(cfg.optim.lr, cfg.optim.weight_decay)
    step = make_train_step(bundle, tx)
    rng = jax.random.PRNGKey(3)
    p_r, _, loss_r = step(bundle.params, tx.init(bundle.params), ragged,
                          tables, rng)
    p_p, _, loss_p = step(bundle.params, tx.init(bundle.params), padded,
                          tables, rng)
    np.testing.assert_allclose(float(loss_r), float(loss_p), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_r), jax.tree.leaves(p_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_packed_eval_spmd_kernel_path_matches(synth_root):
    """The fused pallas ctx-pool kernel under SPMD — shard_map over the
    'data' axis, interpret mode on CPU — must reproduce the single-device
    metric dict exactly. (use_pallas='interpret' raises if the kernel is
    ineligible, so this also asserts the kernel path actually runs.)"""
    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset
    from lirec_tpu.evaluation.packed import evaluate_packed
    from lirec_tpu.models.factory import create_model

    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    # joint_dim=256 meets the kernel's lane constraint (d_clip=512,
    # d_tr=128, both % 128); B=8 x T=20 over data=4 -> local M=40 % 8 == 0
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_dims(
        joint_dim=256
    ).with_runtime(compute_dtype="float32").with_optim(batch_size=8)
    ds = InteractionDataset(cfg, mode="test")
    ds.cache()
    ds.init_relships()
    n_rels = max(len(ds.rels_list) - 1, 0)
    bundle = create_model(cfg, ds.n_classes, n_rels=n_rels)

    single = evaluate_packed(ds, bundle, bundle.params, cfg, mode="test",
                             verbose=False)
    mesh = make_mesh(shape=(4, 2))
    sharded = evaluate_packed(ds, bundle, bundle.params, cfg, mode="test",
                              verbose=False, mesh=mesh,
                              use_pallas="interpret")
    # kernel over forced-localized ctx tables (the dims here satisfy the
    # kernel gates, unlike the default fixture dims): still exact
    localized = evaluate_packed(ds, bundle, bundle.params, cfg, mode="test",
                                verbose=False, mesh=mesh,
                                use_pallas="interpret", localize_ctx=True)
    # triple tier under SPMD: fused local table replicated, tidx/mask
    # sharded over 'data'; the triple kernel runs per-device via shard_map
    tripled = evaluate_packed(ds, bundle, bundle.params, cfg, mode="test",
                              verbose=False, mesh=mesh,
                              use_pallas="interpret",
                              localize_ctx="triple")
    assert set(single) == set(sharded)
    for key in single:
        np.testing.assert_allclose(sharded[key], single[key], rtol=1e-6,
                                   atol=1e-6, err_msg=key)
        np.testing.assert_allclose(localized[key], single[key], rtol=1e-6,
                                   atol=1e-6, err_msg="localized " + key)
        np.testing.assert_allclose(tripled[key], single[key], rtol=1e-6,
                                   atol=1e-6, err_msg="triple " + key)


def test_cli_mesh_train_and_eval(synth_root, tmp_path):
    """--mesh 4x2 trains dp x tp through the CLI; --mesh 8x1 eval matches
    the single-device eval metric dict exactly."""
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / "store")
    dims = ["--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
            "--joint-dim", "16", "--compute-dtype", "float32"]
    args = ["--data-root", synth_root, "--store-root", store,
            "--batch-size", "8", "--quiet"] + dims
    out = run_entry(
        "int_rel_ch",
        args + ["--train", "--epochs", "2", "--mesh", "4x2"],
    )
    assert len(out["train"]["losses"]) == 2
    assert np.isfinite(out["train"]["losses"][-1])

    resume = ["--resume-path", store + "/1.ckpt"]
    plain = run_entry("int_rel_ch", args + resume)
    meshed = run_entry("int_rel_ch", args + resume + ["--mesh", "8x1"])
    for split in ("val", "test"):
        assert set(plain[split]) == set(meshed[split])
        for key in plain[split]:
            np.testing.assert_allclose(
                meshed[split][key], plain[split][key], rtol=1e-6, atol=1e-6,
                err_msg="%s/%s" % (split, key),
            )
