"""AOT executable cache (utils/aot_cache.py):

1. round-trip: first cached_compile compiles + saves, a second (fresh
   jit object, same program) deserializes — dispatch-recorded, outputs
   bitwise-equal;
2. keying: different static args / different programs get different
   files; corrupted files fall back to compile and are replaced;
3. enablement: default OFF on the CPU backend, env forces both ways;
4. integration: evaluate_packed and the train epoch sweep produce
   identical results with the cache on (cold and warm) as with it off.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lirec_tpu.ops import dispatch
from lirec_tpu.utils import aot_cache


@pytest.fixture()
def aot_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "aot")
    monkeypatch.setenv("LIREC_TPU_AOT", "1")
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", d)
    return d


def _fn():
    return jax.jit(lambda x, w: jnp.tanh(x @ w).sum(axis=-1))


def test_round_trip_and_hit(aot_dir):
    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.ones((16, 16), jnp.float32)
    c1 = aot_cache.cached_compile(_fn(), x, w, label="t1")
    d = dispatch.last_dispatch("aot_cache")
    assert d["path"] == "compile" and d["reason"] == "saved"
    files = os.listdir(aot_dir)
    assert len(files) == 1 and files[0].startswith("t1-")
    out1 = np.asarray(c1(x, w))

    c2 = aot_cache.cached_compile(_fn(), x, w, label="t1")
    d = dispatch.last_dispatch("aot_cache")
    assert d["path"] == "deserialize" and d["reason"] == "hit"
    np.testing.assert_array_equal(out1, np.asarray(c2(x, w)))


def test_static_args_key_separately(aot_dir):
    f = jax.jit(lambda x, n: x * n, static_argnames=("n",))
    x = jnp.ones((4,), jnp.float32)
    c2 = aot_cache.cached_compile(f, x, label="s", n=2)
    c3 = aot_cache.cached_compile(f, x, label="s", n=3)
    assert len(os.listdir(aot_dir)) == 2
    assert float(c2(x)[0]) == 2.0 and float(c3(x)[0]) == 3.0


def test_corrupted_file_falls_back(aot_dir):
    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.ones((16, 16), jnp.float32)
    aot_cache.cached_compile(_fn(), x, w, label="c")
    (path,) = [os.path.join(aot_dir, f) for f in os.listdir(aot_dir)]
    with open(path, "wb") as fh:
        fh.write(b"garbage")
    c = aot_cache.cached_compile(_fn(), x, w, label="c")
    d = dispatch.last_dispatch("aot_cache")
    # fell back to compile (and re-saved a good file)
    assert d["path"] == "compile"
    assert float(np.asarray(c(x, w))[0]) == pytest.approx(
        float(np.tanh(16.0) * 16), rel=1e-6
    )
    with open(path, "rb") as fh:
        assert fh.read(4) != b"garb"


def test_deserialized_exec_failure_self_heals(aot_dir):
    """A blob that deserializes but FAILS at first execution (the XLA:CPU
    'Function <fusion> not found' class, seen on the multiprocess CLI eval
    sweep) must not kill the run: the wrapper recompiles from the retained
    lowering, re-executes, returns the right answer, and drops the bad
    file — dispatch-recorded as exec-failed."""
    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.ones((16, 16), jnp.float32)
    aot_cache.cached_compile(_fn(), x, w, label="h")
    (path,) = [os.path.join(aot_dir, f) for f in os.listdir(aot_dir)]

    lowered = _fn().lower(x, w)

    class _Broken:
        def __call__(self, *a):
            raise RuntimeError(
                "Buffer Definition Event: Function fused_thing not found"
            )

    wrapper = aot_cache._VerifyOnFirstCall(_Broken(), lowered, path, "h")
    out = wrapper(x, w)
    np.testing.assert_allclose(
        np.asarray(out), np.tanh(np.ones((8, 16)) @ np.ones((16, 16))).sum(-1),
        rtol=1e-6,
    )
    d = dispatch.last_dispatch("aot_cache")
    assert d["reason"].startswith("exec-failed"), d
    assert not os.path.exists(path)  # bad blob evicted
    # healed: later calls run the recompiled executable directly
    np.testing.assert_array_equal(np.asarray(out), np.asarray(wrapper(x, w)))


def test_donating_program_heals_after_exec_failure(aot_dir):
    """Regression (r5, seen in-suite on test_dryrun_multichip): a corrupt
    blob's failed first execution CONSUMES buffer-donated inputs, and the
    healing re-execution then died on 'Array has been deleted'. The verify
    call must run against copies of the donated args so the heal path
    still has live originals."""

    def make():
        return jax.jit(
            lambda o, x: (o + 1.0, (x * 2.0).sum()), donate_argnums=(0,)
        )

    o = jnp.ones((4,), jnp.float32)
    x = jnp.arange(4.0)
    aot_cache.cached_compile(make(), o, x, label="d", donate_argnums=(0,))
    (path,) = [os.path.join(aot_dir, f) for f in os.listdir(aot_dir)]
    lowered = make().lower(o, x)

    class _BrokenConsuming:
        """Models the real failure: the exec consumed the donated buffer
        before dying."""

        def __call__(self, *a):
            a[0].delete()
            raise RuntimeError(
                "Buffer Definition Event: Function fused_thing not found"
            )

    wrapper = aot_cache._VerifyOnFirstCall(
        _BrokenConsuming(), lowered, path, "d", donate_argnums=(0,)
    )
    o2 = jnp.ones((4,), jnp.float32)
    out = wrapper(o2, x)  # pre-fix: RuntimeError('Array has been deleted')
    assert dispatch.last_dispatch("aot_cache")["reason"].startswith(
        "exec-failed"
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.full(4, 2.0))
    assert float(out[1]) == 12.0


def test_donated_arg_survives_clean_verify(aot_dir):
    """On a clean cache hit of a donating program, the verify call's copy
    keeps the caller's donated arg alive (later calls donate normally)."""

    def make():
        return jax.jit(
            lambda o, x: (o + 1.0, (x * 2.0).sum()), donate_argnums=(0,)
        )

    o = jnp.ones((4,), jnp.float32)
    x = jnp.arange(4.0)
    aot_cache.cached_compile(make(), o, x, label="dc", donate_argnums=(0,))
    c = aot_cache.cached_compile(make(), o, x, label="dc",
                                 donate_argnums=(0,))
    assert dispatch.last_dispatch("aot_cache")["reason"] == "hit"
    out = c(o, x)
    # the original survived the verify call (it executed on a copy)
    np.testing.assert_array_equal(np.asarray(o), np.ones(4))
    np.testing.assert_array_equal(np.asarray(out[0]), np.full(4, 2.0))


def test_default_off_on_cpu(tmp_path, monkeypatch):
    monkeypatch.delenv("LIREC_TPU_AOT", raising=False)
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", str(tmp_path / "aot2"))
    x = jnp.ones((4, 4), jnp.float32)
    aot_cache.cached_compile(_fn(), x, x, label="off")
    d = dispatch.last_dispatch("aot_cache")
    assert d["path"] == "compile" and d["reason"] == "disabled"
    assert not os.path.exists(str(tmp_path / "aot2"))


def test_env_zero_forces_off(tmp_path, monkeypatch):
    monkeypatch.setenv("LIREC_TPU_AOT", "0")
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", str(tmp_path / "aot3"))
    x = jnp.ones((4, 4), jnp.float32)
    aot_cache.cached_compile(_fn(), x, x, label="off")
    assert dispatch.last_dispatch("aot_cache")["reason"] == "disabled"


def test_prune_drops_oldest_past_budget(tmp_path):

    d = str(tmp_path / "p")
    os.makedirs(d)
    for i in range(4):
        with open(os.path.join(d, "f%d" % i), "wb") as fh:
            fh.write(b"x" * 100)
        os.utime(os.path.join(d, "f%d" % i), (i, i))  # f0 oldest
    aot_cache.prune(d, max_bytes=250)
    left = sorted(os.listdir(d))
    assert left == ["f2", "f3"]  # oldest two pruned to fit 250 bytes


def test_sweep_wrapper_rekeys_on_shape_change(aot_dir):
    """The localized-training uniq_* capacity can grow across epochs at a
    constant step count; the sweep wrapper must key on full shapes and
    compile a second executable instead of feeding the stale one."""
    import functools

    from lirec_tpu.train.loop import _aot_wrap_sweep

    @functools.partial(jax.jit, static_argnames=("tr_sum_max_flag",))
    def fake_sweep(params, opt_state, stacked, tables, base_rng,
                   rng_offset, tr_sum_max_flag=True):
        return params, opt_state, stacked["labels"].sum() + stacked[
            "uniq_clip"
        ].sum()

    w = _aot_wrap_sweep(fake_sweep)
    p = jnp.ones((2,))
    o = jnp.zeros((2,))
    t = jnp.ones((3,))
    rng = jax.random.PRNGKey(0)
    mk = lambda cap: {
        "labels": jnp.ones((3, 2), jnp.int32),
        "uniq_clip": jnp.ones((3, cap), jnp.int32),
    }
    _, _, l4 = w(p, o, mk(4), t, rng, 0)
    _, _, l8 = w(p, o, mk(8), t, rng, 0)  # wider cap, same n_steps
    assert float(l4) == 6 + 12 and float(l8) == 6 + 24


# ---------------------------------------------------------- integration


def _cfg_ds(synth_root, mode):
    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset

    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    ).with_optim(epochs=2, save_model=False, lr=1e-3)
    ds = InteractionDataset(cfg, mode=mode)
    ds.cache()
    ds.init_relships()
    return cfg, ds


def _bundle(cfg, ds):
    from lirec_tpu.models.factory import create_model

    return create_model(
        cfg, ds.n_classes, n_rels=max(len(ds.rels_list) - 1, 0)
    )


def test_meshed_round_trip_and_key(aot_dir):
    """SPMD programs ride the cache too (r5, VERDICT r4 item 4): a pjit'd
    fn over the 8-device mesh saves then deserializes with equal outputs,
    and the mesh fingerprint keys the device LAYOUT — the same lowered IR
    over a permuted device order must get its own entry (a deserialized
    executable runs on its embedded assignment regardless of the caller's
    mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("data",))
    sh = NamedSharding(mesh, P("data"))

    def make(m):
        return jax.jit(
            lambda x: jnp.tanh(x).sum(axis=-1) * 2.0,
            in_shardings=NamedSharding(m, P("data")),
            out_shardings=NamedSharding(m, P("data")),
        )

    x = jax.device_put(jnp.arange(32.0).reshape(8, 4), sh)
    c1 = aot_cache.cached_compile(make(mesh), x, label="m", mesh=mesh)
    assert dispatch.last_dispatch("aot_cache")["reason"] == "saved"
    out1 = np.asarray(jax.device_get(c1(x)))

    c2 = aot_cache.cached_compile(make(mesh), x, label="m", mesh=mesh)
    d = dispatch.last_dispatch("aot_cache")
    assert d["path"] == "deserialize" and d["reason"] == "hit"
    np.testing.assert_array_equal(out1, np.asarray(jax.device_get(c2(x))))
    assert aot_cache.stats()["hit"] >= 1

    # permuted device order -> same IR, different physical layout: miss
    perm = Mesh(devices[::-1], ("data",))
    xp = jax.device_put(
        jnp.arange(32.0).reshape(8, 4), NamedSharding(perm, P("data"))
    )
    aot_cache.cached_compile(make(perm), xp, label="m", mesh=perm)
    assert dispatch.last_dispatch("aot_cache")["reason"] == "saved"
    assert len(os.listdir(aot_dir)) == 2


def test_evaluate_packed_identical_with_aot(
    synth_root, tmp_path, monkeypatch
):
    from lirec_tpu.evaluation.packed import evaluate_packed

    cfg, ds = _cfg_ds(synth_root, "val")
    bundle = _bundle(cfg, ds)
    baseline = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode="val", verbose=False
    )
    monkeypatch.setenv("LIREC_TPU_AOT", "1")
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", str(tmp_path / "aot"))
    cold = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode="val", verbose=False
    )
    assert dispatch.last_dispatch("aot_cache") is not None
    warm = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode="val", verbose=False
    )
    d = dispatch.last_dispatch("aot_cache")
    assert d["path"] == "deserialize" and d["reason"] == "hit"
    for k in baseline:
        assert cold[k] == pytest.approx(baseline[k], rel=1e-6), k
        assert warm[k] == pytest.approx(baseline[k], rel=1e-6), k


def test_train_sweep_identical_with_aot(synth_root, tmp_path, monkeypatch):
    from lirec_tpu.train.loop import train

    def run():
        cfg, ds = _cfg_ds(synth_root, "train")
        return train(cfg, _bundle(cfg, ds), ds, verbose=False)

    base = run()
    monkeypatch.setenv("LIREC_TPU_AOT", "1")
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", str(tmp_path / "aot_tr"))
    cold = run()
    warm = run()
    d = dispatch.last_dispatch("aot_cache")
    assert d["path"] == "deserialize" and d["reason"] == "hit", d
    np.testing.assert_allclose(cold["losses"], base["losses"], rtol=1e-6)
    np.testing.assert_allclose(warm["losses"], base["losses"], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        warm["params"], base["params"],
    )


def test_meshed_evaluate_packed_identical_with_aot(
    synth_root, tmp_path, monkeypatch
):
    """The SPMD packed-eval sweep rides the cache (r5): warm meshed run
    deserializes and its metric dict equals both the cold meshed run and
    the cache-off meshed baseline."""
    from lirec_tpu.evaluation.packed import evaluate_packed
    from lirec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(8, 1), axis_names=("data", "model"))
    cfg, ds = _cfg_ds(synth_root, "val")
    bundle = _bundle(cfg, ds)
    baseline = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode="val", verbose=False, mesh=mesh
    )
    monkeypatch.setenv("LIREC_TPU_AOT", "1")
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", str(tmp_path / "aot_m"))
    aot_cache.reset_stats()
    cold = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode="val", verbose=False, mesh=mesh
    )
    assert aot_cache.stats()["miss"] >= 1
    warm = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode="val", verbose=False, mesh=mesh
    )
    assert aot_cache.stats()["hit"] >= 1, aot_cache.stats()
    for k in baseline:
        assert cold[k] == pytest.approx(baseline[k], rel=1e-6), k
        assert warm[k] == pytest.approx(baseline[k], rel=1e-6), k


def test_meshed_train_sweep_identical_with_aot(
    synth_root, tmp_path, monkeypatch
):
    """The meshed epoch sweep rides the cache (r5): the warm run's loss
    trajectory and final params equal the cache-off meshed baseline."""
    from lirec_tpu.parallel.mesh import make_mesh
    from lirec_tpu.train.loop import train

    def run():
        mesh = make_mesh(shape=(4, 2))
        cfg, ds = _cfg_ds(synth_root, "train")
        return train(cfg, _bundle(cfg, ds), ds, verbose=False, mesh=mesh)

    base = run()
    monkeypatch.setenv("LIREC_TPU_AOT", "1")
    monkeypatch.setenv("LIREC_TPU_AOT_DIR", str(tmp_path / "aot_mtr"))
    aot_cache.reset_stats()
    cold = run()
    assert aot_cache.stats()["miss"] >= 1
    warm = run()
    assert aot_cache.stats()["hit"] >= 1, aot_cache.stats()
    np.testing.assert_allclose(cold["losses"], base["losses"], rtol=1e-6)
    np.testing.assert_allclose(warm["losses"], base["losses"], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        warm["params"], base["params"],
    )
