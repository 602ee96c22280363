"""The one-dispatch-per-epoch training sweep (train/loop.make_epoch_sweep)
must produce the per-batch loop's parameter trajectory — same per-step PRNG
folding, ragged leftover handled by loss_weight padding."""

import jax
import numpy as np

from lirec_tpu import config as config_lib
from lirec_tpu.data import synthetic
from lirec_tpu.data.dataset import InteractionDataset
from lirec_tpu.models.factory import create_model
from lirec_tpu.train.loop import train


def _setup(synth_root, batch_size):
    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset("int_rel_ch", data_root=synth_root)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    ).with_optim(batch_size=batch_size, epochs=2, save_model=False, lr=1e-3)
    ds = InteractionDataset(cfg, mode="train")
    ds.cache()
    ds.init_relships()
    bundle = create_model(
        cfg, ds.n_classes, n_rels=max(len(ds.rels_list) - 1, 0)
    )
    return cfg, ds, bundle


def _run(synth_root, batch_size, **kw):
    cfg, ds, bundle = _setup(synth_root, batch_size)
    out = train(cfg, bundle, ds, verbose=False, **kw)
    return out


def test_epoch_sweep_matches_per_batch(synth_root):
    # batch 7 leaves a ragged leftover on the synthetic train split,
    # exercising the loss_weight pad against the per-batch unpadded path
    sweep = _run(synth_root, 7, epoch_sweep=True)
    batched = _run(synth_root, 7, epoch_sweep=False)
    np.testing.assert_allclose(
        sweep["losses"], batched["losses"], rtol=1e-5, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        sweep["params"], batched["params"],
    )


def test_epoch_sweep_under_mesh_matches_single_device(synth_root):
    from lirec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(4, 2))
    single = _run(synth_root, 8, epoch_sweep=True)
    sharded = _run(synth_root, 8, epoch_sweep=True, mesh=mesh)
    np.testing.assert_allclose(
        single["losses"], sharded["losses"], rtol=1e-4, atol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        single["params"], sharded["params"],
    )


def test_epoch_sweep_chunked_matches_unchunked(synth_root):
    whole = _run(synth_root, 7, epoch_sweep=True)
    chunked = _run(synth_root, 7, epoch_sweep=True, sweep_max_steps=1)
    np.testing.assert_allclose(
        whole["losses"], chunked["losses"], rtol=1e-6, atol=1e-7
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        whole["params"], chunked["params"],
    )
