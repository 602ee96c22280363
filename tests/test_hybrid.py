"""Hybrid packed forward (table-level first layers) must match the dense
reference-layout forward exactly — INCLUDING training dropout masks (same
PRNG stream, same shapes/order)."""

import jax
import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.models.factory import apply_model, create_model
from lirec_tpu.utils.fake_batch import make_batch, make_tables


def _cfg(preset):
    cfg = config_lib.preset(preset, data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    return cfg.with_runtime(compute_dtype="float32")


def _dense_from_packed(tables, feat_idx):
    t = tables
    return np.concatenate(
        [t["text"][feat_idx[..., 0]], t["visual"][feat_idx[..., 0]],
         t["track"][feat_idx[..., 1]], t["track"][feat_idx[..., 2]]],
        axis=-1,
    )


@pytest.mark.parametrize("preset", ["modalities", "int_rels", "int_ch",
                                    "int_rel_ch"])
@pytest.mark.parametrize("deterministic", [True, False])
def test_hybrid_matches_dense(preset, deterministic):
    import jax.numpy as jnp

    cfg = _cfg(preset)
    bundle = create_model(cfg, 9, n_rels=6)
    raw_tables = make_tables(bundle.spec, 32, 48, seed=7)
    tables = {k: jnp.asarray(v) for k, v in raw_tables.items()}
    batch = make_batch(bundle.spec, 6, 32, 48, seed=8)
    if preset == "modalities":
        batch["feat_idx"] = batch["feat_idx"][:, 0, :1, :]
    elif preset == "int_rels":
        batch["feat_idx"] = batch["feat_idx"][:, 0]
        batch["rels_mask"] = batch["rels_mask"][:, 0][..., None]
    elif preset == "int_ch":
        batch["feat_idx"] = batch["feat_idx"][:, :, :1, :]
    mb = {k: batch[k] for k in ("feat_idx", "rels_mask") if k in batch}

    rng = None if deterministic else jax.random.PRNGKey(3)
    hybrid = apply_model(
        bundle.params, bundle.spec, mb, tables=tables,
        deterministic=deterministic, rng=rng, use_tabular=False,
    )

    dense_feats = _dense_from_packed(raw_tables, np.asarray(batch["feat_idx"]))
    if preset == "int_ch":
        dense_feats = dense_feats[:, :, 0, :]
    dense_batch = {"features": dense_feats}
    if "rels_mask" in mb:
        dense_batch["rels_mask"] = mb["rels_mask"]
    dense = apply_model(
        bundle.params, bundle.spec, dense_batch,
        deterministic=deterministic, rng=rng,
    )
    for key in ("inters", "rels"):
        if dense.get(key) is None:
            assert hybrid.get(key) is None
            continue
        np.testing.assert_allclose(
            np.asarray(hybrid[key]), np.asarray(dense[key]),
            atol=2e-5, rtol=1e-5,
            err_msg="%s/%s det=%s" % (preset, key, deterministic),
        )


def test_hybrid_dropout_stream_text_modality():
    """Text-only Modalities: hybrid and dense paths share the dropout
    stream. (NOTE: modality 't'/'v' WITH tracks is head-incompatible in the
    reference itself — Modalities.__init__ sizes out_ints for the track
    branch that forward never concatenates (ref model.py:39-50,78-86) — so
    both paths here raise the same shape error on that config.)"""
    import jax.numpy as jnp

    cfg = _cfg("modalities").with_tasks(modality="t", tracks=False)
    bundle = create_model(cfg, 9)
    raw_tables = make_tables(bundle.spec, 32, 48, seed=11)
    tables = {k: jnp.asarray(v) for k, v in raw_tables.items()}
    batch = make_batch(bundle.spec, 5, 32, 48, seed=12)
    batch["feat_idx"] = batch["feat_idx"][:, 0, :1, :]
    mb = {"feat_idx": batch["feat_idx"]}
    rng = jax.random.PRNGKey(7)
    hybrid = apply_model(
        bundle.params, bundle.spec, mb, tables=tables,
        deterministic=False, rng=rng, use_tabular=False,
    )
    dense_feats = _dense_from_packed(raw_tables, np.asarray(batch["feat_idx"]))
    dense = apply_model(
        bundle.params, bundle.spec, {"features": dense_feats},
        deterministic=False, rng=rng,
    )
    np.testing.assert_allclose(
        np.asarray(hybrid["inters"]), np.asarray(dense["inters"]),
        atol=2e-5, rtol=1e-5,
    )
