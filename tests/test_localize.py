"""Batch-local table projection (data/localize.py): remapped batches must
produce the same forward/loss/trajectory as full-table batches, and the
profitability gate must keep toy-scale runs on the plain path."""

import numpy as np
import pytest


def _bundle(**over):
    from lirec_tpu import config as config_lib
    from lirec_tpu.models.factory import create_model

    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_dims(
        text_dim=16, visual_dim=32, text_layers=4, joint_dim=16
    ).with_runtime(compute_dtype="float32")
    if over:
        cfg = cfg.with_optim(**over)
    return cfg, create_model(cfg, 11, n_rels=7)


def test_localize_batch_remap_roundtrip():
    from lirec_tpu.data.localize import localize_batch

    rng = np.random.default_rng(0)
    fi = np.stack(
        [
            rng.integers(0, 40, (8, 5, 4)),
            rng.integers(0, 60, (8, 5, 4)),
            rng.integers(0, 60, (8, 5, 4)),
        ],
        axis=-1,
    ).astype(np.int32)
    batch = {"feat_idx": fi, "labels": np.zeros(8, np.int32)}
    out = localize_batch(batch, cap_clip=256, cap_track=256)
    uc, ut, nfi = out["uniq_clip"], out["uniq_track"], out["feat_idx"]
    # resolving the remapped ids through the unique lists reproduces the
    # original global ids exactly
    np.testing.assert_array_equal(uc[nfi[..., 0]], fi[..., 0])
    np.testing.assert_array_equal(ut[nfi[..., 1]], fi[..., 1])
    np.testing.assert_array_equal(ut[nfi[..., 2]], fi[..., 2])
    assert uc.shape == (256,) and ut.shape == (256,)
    # capacity overflow -> None (caller grows)
    assert localize_batch(batch, cap_clip=4, cap_track=256) is None


def test_apply_localized_equivalence():
    """Same rng, deterministic=False: the localized batch must produce the
    same outputs and loss as the full-table batch (row-independent GEMMs;
    the dropout stream is drawn post-gather so it is shape-identical)."""
    import jax

    from lirec_tpu.data.localize import localize_batch
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    _, bundle = _bundle()
    tables = make_tables(bundle.spec, 96, 128)
    batch = make_batch(bundle.spec, 8, 96, 128, seed=3)
    loc = localize_batch(batch, cap_clip=128, cap_track=128)
    assert loc is not None
    rng = jax.random.PRNGKey(5)

    full = bundle.apply(
        bundle.params, {k: batch[k] for k in ("feat_idx", "rels_mask")},
        tables=tables, deterministic=False, rng=rng, use_tabular=False,
    )
    local = bundle.apply(
        bundle.params,
        {k: loc[k] for k in
         ("feat_idx", "rels_mask", "uniq_clip", "uniq_track")},
        tables=tables, deterministic=False, rng=rng, use_tabular=False,
    )
    for key in ("inters", "rels"):
        np.testing.assert_allclose(
            np.asarray(local[key]), np.asarray(full[key]),
            rtol=1e-6, atol=1e-6,
        )
    l_full = bundle.loss(full, batch, rng=jax.random.PRNGKey(9))
    l_loc = bundle.loss(local, loc, rng=jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.asarray(l_loc), np.asarray(l_full), rtol=1e-6
    )


def test_localizer_profitability_gate():
    from lirec_tpu.data.localize import Localizer
    from lirec_tpu.utils.fake_batch import make_batch

    _, bundle = _bundle()
    # tiny tables: batch-unique rounds up to >= table rows -> plain path
    batches = [make_batch(bundle.spec, 8, 96, 128, seed=s) for s in (1, 2)]
    loc = Localizer(bundle.spec, n_clips=96, n_tracks=128)
    out = loc.maybe_localize(batches)
    assert out is batches and not loc.applied and not loc.enabled
    # force=True overrides the gate
    loc_f = Localizer(bundle.spec, n_clips=96, n_tracks=128, force=True)
    out_f = loc_f.maybe_localize(batches)
    assert loc_f.applied and all("uniq_clip" in b for b in out_f)
    # capacities are uniform across the call (stackable for the sweep)
    assert len({b["uniq_clip"].shape for b in out_f}) == 1


def test_train_localized_trajectory(synth_cfg, synth_root):
    """Forced localization must not change the training trajectory
    (CPU f32; the gate would keep it off at this scale)."""
    from lirec_tpu import config as config_lib
    from lirec_tpu.data.dataset import InteractionDataset
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train.loop import train

    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    cfg = cfg.replace(dims=synth_cfg.dims, paths=synth_cfg.paths)
    cfg = cfg.with_runtime(compute_dtype="float32").with_optim(
        batch_size=8, epochs=2, save_model=False, lr=1e-3
    )
    ds = InteractionDataset(cfg, mode="train")
    ds.cache()
    ds.init_relships()
    bundle = create_model(
        cfg, ds.n_classes, n_rels=max(len(ds.rels_list) - 1, 0)
    )

    runs = {}
    for name, flag in (("plain", False), ("localized", True)):
        out = train(
            cfg, bundle, ds, verbose=False, localize_tables=flag,
        )
        runs[name] = out
    assert runs["localized"]["localized_tables"]
    assert not runs["plain"]["localized_tables"]
    np.testing.assert_allclose(
        runs["localized"]["losses"], runs["plain"]["losses"],
        rtol=1e-5, atol=1e-6,
    )


def test_localize_eval_ctx_triples_roundtrip():
    """triples[b][tidx] must reconstruct the original ctx index triples
    exactly; slot 0 and the ragged tail are untouched (zeros in tidx)."""
    import numpy as np

    from lirec_tpu.data.localize import localize_eval_ctx_triples

    rng = np.random.default_rng(3)
    N, T, R, n_clips, n_tracks = 19, 4, 5, 40, 60
    fi = np.stack(
        [
            rng.integers(0, n_clips, (N, T, 1 + R)),
            rng.integers(0, n_tracks, (N, T, 1 + R)),
            rng.integers(0, n_tracks, (N, T, 1 + R)),
        ],
        axis=-1,
    ).astype(np.int32)
    B, n_full = 8, 2
    tidx, triples = localize_eval_ctx_triples(fi, B, n_full, n_tracks)
    assert tidx.shape == (N, T, R) and tidx.dtype == np.int32
    assert triples.shape[0] == n_full and triples.shape[2] == 3
    assert triples.shape[1] % 8 == 0
    for b in range(n_full):
        rows = fi[b * B : (b + 1) * B, :, 1:, :]
        rec = triples[b][tidx[b * B : (b + 1) * B]]
        np.testing.assert_array_equal(rec, rows)
        # per-batch dedup actually happened
        key = (
            rows[..., 0].astype(np.int64) * n_tracks + rows[..., 1]
        ) * n_tracks + rows[..., 2]
        n_uniq = np.unique(key).size
        assert n_uniq <= triples.shape[1] < n_uniq + 8
    # tail rows (beyond n_full*B) left as zeros
    assert (tidx[n_full * B :] == 0).all()
