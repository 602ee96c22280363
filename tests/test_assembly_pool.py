"""AssemblyPool workers: identical batches at any worker count (per-sample
PRNG streams), and the train loop runs end to end with workers on."""

import numpy as np

from lirec_tpu import config as config_lib
from lirec_tpu.data import synthetic
from lirec_tpu.data.dataset import InteractionDataset
from lirec_tpu.data.pipeline import BatchIterator, _assemble_batch_with


def _dataset(synth_root):
    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    ).with_optim(batch_size=7, epochs=2, save_model=False, lr=1e-3)
    ds = InteractionDataset(cfg, mode="train")
    ds.cache()
    ds.init_relships()
    return cfg, ds


def _epochs(it, n=2):
    return [[b for b in it] for _ in range(n)]


def test_worker_counts_agree(synth_root):
    cfg, ds = _dataset(synth_root)
    pooled_it = BatchIterator(
        ds, 7, shuffle=True, seed=3, workers=2, fast_assembly=False
    )
    pooled = _epochs(pooled_it)
    pooled_it.close()
    # the workers=0 per-sample path (in-process, per-sample streams)
    default = _epochs(
        BatchIterator(ds, 7, shuffle=True, seed=3, fast_assembly=False)
    )
    # the plan-based whole-epoch path (the default)
    planned = _epochs(BatchIterator(ds, 7, shuffle=True, seed=3))
    # the inline fallback a failed pool spawn uses
    fallback_it = BatchIterator(
        ds, 7, shuffle=True, seed=3, workers=1, fast_assembly=False
    )
    fallback_it._pool = False
    fallback = _epochs(fallback_it)
    for other in (default, planned, fallback):
        for eb, es in zip(pooled, other):
            assert len(eb) == len(es)
            for bb, bs in zip(eb, es):
                assert set(bb) == set(bs)
                for k in bb:
                    np.testing.assert_array_equal(bb[k], bs[k])


def test_train_with_assembly_workers(synth_root):
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train.loop import train

    cfg, ds = _dataset(synth_root)
    bundle = create_model(
        cfg, ds.n_classes, n_rels=max(len(ds.rels_list) - 1, 0)
    )
    out = train(cfg, bundle, ds, verbose=False, assembly_workers=2)
    assert len(out["losses"]) == 2
    assert np.isfinite(out["losses"]).all()


def test_assemble_batch_matches_getitem(synth_root):
    _, ds = _dataset(synth_root)
    batch = _assemble_batch_with(ds, ([0, 1], 5, 7))
    from lirec_tpu.data.pipeline import collate

    manual = collate([
        ds.__getitem__(i, np.random.default_rng((5, 7, i))) for i in (0, 1)
    ])
    for k in manual:
        np.testing.assert_array_equal(batch[k], manual[k])
