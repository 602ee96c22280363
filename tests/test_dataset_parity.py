"""Golden parity: our dataset vs the ACTUAL reference dataset code, running
both on the same synthetic fixtures. This is the strongest ingest oracle we
have without the 80 GB drop."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.data import synthetic
from lirec_tpu.data.dataset import InteractionDataset, first_choice

from tests import reference_bridge as bridge

pytestmark = pytest.mark.skipif(
    not bridge.reference_available(), reason="/root/reference not mounted"
)


def _preset_cfg(synth_root, name, **kw):
    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset(name, data_root=synth_root, **kw)
    return cfg.replace(dims=base.dims, paths=base.paths)


def _compare_sample(mine_dense, ref_sample, keys, idx, atol=1e-5):
    for key in keys:
        a = np.asarray(mine_dense[key], dtype=np.float64)
        b = np.asarray(ref_sample[key], dtype=np.float64)
        assert a.shape == b.shape, (
            "sample %d key %r shape %s vs ref %s" % (idx, key, a.shape, b.shape)
        )
        np.testing.assert_allclose(
            a, b, atol=atol, rtol=1e-5,
            err_msg="sample %d key %r" % (idx, key),
        )


def _run_parity(synth_root, preset_name, mode, keys, **preset_kw):
    cfg = _preset_cfg(synth_root, preset_name, **preset_kw)
    bridge.import_reference()
    bridge.write_mg_pickle(cfg)
    bridge.configure_opt(cfg)

    ref = bridge.import_reference()
    with bridge.first_element_choice():
        ref_ds = ref.dataset.MixedFeaturesDataset(mode=mode)
        ref_ds.cache()
        if cfg.tasks.rels or cfg.tasks.rels_multitask:
            ref_ds.init_relships()

        mine = InteractionDataset(cfg, mode=mode, label_chooser=first_choice)
        mine.cache()
        if cfg.tasks.rels or cfg.tasks.rels_multitask:
            mine.init_relships()

        assert len(mine) == len(ref_ds)
        assert mine.n_classes == ref_ds.n_classes
        if cfg.tasks.rels_multitask:
            assert mine.rels_list == ref_ds.rels_list
            assert mine.rels2idx == ref_ds.rels2idx

        for i in range(len(mine)):
            ref_sample = ref_ds[i]
            my_sample = mine.to_dense(mine.__getitem__(i))
            present = [k for k in keys if k in ref_sample]
            missing = [k for k in keys if (k in ref_sample) != (k in my_sample)]
            assert not missing, "sample %d key presence mismatch: %s" % (
                i, missing,
            )
            _compare_sample(my_sample, ref_sample, present, i)
    return mine, ref_ds


def test_parity_modalities(synth_root):
    _run_parity(
        synth_root,
        "modalities",
        "val",
        keys=["features", "labels", "just_zeros", "multilab_weights",
              "soft_labels"],
    )


def test_parity_int_rels(synth_root):
    _run_parity(
        synth_root,
        "int_rels",
        "val",
        keys=["features", "labels", "rels_label", "rels_mask", "hash_rel",
              "just_zeros", "multilab_weights"],
    )


def test_parity_int_ch(synth_root):
    _run_parity(
        synth_root,
        "int_ch",
        "test",
        keys=["features", "labels", "mem_mask", "gt_tracks", "n_names",
              "just_zeros", "multilab_weights"],
    )


def test_parity_int_rel_ch(synth_root):
    mine, ref_ds = _run_parity(
        synth_root,
        "int_rel_ch",
        "test",
        keys=["features", "labels", "mem_mask", "gt_tracks", "n_names",
              "rels_label", "rels_mask", "hash_rel", "just_zeros",
              "multilab_weights"],
    )
    # hash tables line up too
    assert mine.hashidx_rels == ref_ds.hashidx_rels


def test_parity_int_rel_ch_train_mode(synth_root):
    """Train mode differs only in context subsampling randomness; with few
    context clips (<= 18) there is no sampling, so parity holds there too."""
    _run_parity(
        synth_root,
        "int_rel_ch",
        "train",
        keys=["features", "labels", "mem_mask", "gt_tracks", "rels_label",
              "rels_mask", "just_zeros", "multilab_weights"],
    )


def test_parallel_cache_matches_sequential(synth_root):
    """Threaded feature warm-up must produce identical tables."""
    cfg = _preset_cfg(synth_root, "int_rel_ch")
    a = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
    a.cache()
    b = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
    b.cache(parallel_workers=4)
    np.testing.assert_array_equal(a.tables.text, b.tables.text)
    np.testing.assert_array_equal(a.tables.visual, b.tables.visual)
    np.testing.assert_array_equal(a.tables.track, b.tables.track)
    assert a.tables._clip_index == b.tables._clip_index
    assert a.tables._track_index == b.tables._track_index


def test_parity_raw_classes_unmerged(synth_root):
    """merged=False (raw interaction classes) keeps sample parity, including
    the merged-indexed multilab_weights quirk (ref :592-601)."""
    cfg = _preset_cfg(synth_root, "int_ch").with_tasks(merged=False)
    bridge.import_reference()
    bridge.write_mg_pickle(cfg)
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    with bridge.first_element_choice():
        ref_ds = ref.dataset.MixedFeaturesDataset(mode="val")
        ref_ds.cache()
        mine = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
        mine.cache()
        assert mine.n_classes == ref_ds.n_classes > 7  # raw, not merged
        for i in range(len(mine)):
            rs = ref_ds[i]
            ms = mine.to_dense(mine.__getitem__(i))
            for key in ("features", "labels", "mem_mask", "gt_tracks",
                        "multilab_weights", "multilab_weights_axl"):
                np.testing.assert_allclose(
                    np.asarray(ms[key], np.float64),
                    np.asarray(rs[key], np.float64),
                    atol=1e-5, err_msg="sample %d key %r" % (i, key),
                )


def test_parity_sanity_class_subset(synth_root):
    """inter_class='m' (sanity-check subset) keeps sample parity, including
    the local-index label space and class-filtered soft labels."""
    cfg = _preset_cfg(synth_root, "modalities")
    cfg = cfg.with_tasks(inter_class="m").with_runtime(sanity_check=False)
    bridge.import_reference()
    bridge.write_mg_pickle(cfg)
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    with bridge.first_element_choice():
        ref_ds = ref.dataset.MixedFeaturesDataset(mode="val")
        ref_ds.cache()
        mine = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
        mine.cache()
        assert len(mine) == len(ref_ds) > 0
        for i in range(len(mine)):
            rs = ref_ds[i]
            ms = mine.to_dense(mine.__getitem__(i))
            for key in ("features", "labels", "multilab_weights",
                        "soft_labels"):
                if key not in rs:
                    continue
                np.testing.assert_allclose(
                    np.asarray(ms[key], np.float64),
                    np.asarray(rs[key], np.float64),
                    atol=1e-5, err_msg="sample %d key %r" % (i, key),
                )
