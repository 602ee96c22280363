"""The embed-then-gather eval path must match the gather-then-embed path
exactly (same math, commuted), for all three architectures."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.models.factory import apply_model, create_model
from lirec_tpu.utils.fake_batch import make_batch, make_tables


def _cfg(preset, **kw):
    cfg = config_lib.preset(preset, data_root="/tmp/x", **kw)
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    return cfg.with_runtime(compute_dtype="float32")


def _check(preset, n_classes=9, n_rels=6, atol=1e-5):
    import jax.numpy as jnp

    cfg = _cfg(preset)
    bundle = create_model(cfg, n_classes, n_rels=n_rels)
    tables = {
        k: jnp.asarray(v)
        for k, v in make_tables(bundle.spec, 32, 48, seed=3).items()
    }
    batch = make_batch(bundle.spec, 6, 32, 48, seed=4)
    if preset == "modalities":
        batch["feat_idx"] = batch["feat_idx"][:, 0, :1, :]
    elif preset == "int_rels":
        batch["feat_idx"] = batch["feat_idx"][:, 0]
        batch["rels_mask"] = batch["rels_mask"][:, 0][..., None]
    elif preset == "int_ch":
        batch["feat_idx"] = batch["feat_idx"][:, :, :1, :]
    model_batch = {k: batch[k] for k in ("feat_idx", "rels_mask") if k in batch}

    slow = apply_model(
        bundle.params, bundle.spec, model_batch, tables=tables,
        use_tabular=False,
    )
    fast = apply_model(
        bundle.params, bundle.spec, model_batch, tables=tables,
        use_tabular=True,
    )
    for key in ("inters", "rels"):
        if slow.get(key) is None:
            assert fast.get(key) is None
            continue
        np.testing.assert_allclose(
            np.asarray(slow[key]), np.asarray(fast[key]),
            atol=atol, rtol=1e-5, err_msg="%s/%s" % (preset, key),
        )


def test_tabular_modalities():
    _check("modalities")


def test_tabular_int_rels():
    _check("int_rels")


def test_tabular_int_ch():
    _check("int_ch")


def test_tabular_int_rel_ch():
    _check("int_rel_ch")


def test_auto_routing_matches_train_path():
    """deterministic packed apply (auto-tabular) == explicit slow path."""
    import jax.numpy as jnp

    cfg = _cfg("int_rel_ch")
    bundle = create_model(cfg, 9, n_rels=6)
    tables = {
        k: jnp.asarray(v)
        for k, v in make_tables(bundle.spec, 32, 48, seed=5).items()
    }
    batch = make_batch(bundle.spec, 4, 32, 48, seed=6)
    mb = {k: batch[k] for k in ("feat_idx", "rels_mask")}
    auto = bundle.apply(bundle.params, mb, tables=tables, deterministic=True)
    slow = apply_model(
        bundle.params, bundle.spec, mb, tables=tables, use_tabular=False
    )
    np.testing.assert_allclose(
        np.asarray(auto["inters"]), np.asarray(slow["inters"]),
        atol=1e-5, rtol=1e-5,
    )
