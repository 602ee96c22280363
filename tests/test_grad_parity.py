"""Training-correctness oracles vs the reference:

1. gradient parity — torch autograd through the reference model+loss vs
   jax.grad through ours, same weights/batch, dropout disabled;
2. optimizer parity — one torch.optim.Adam(weight_decay=...) step vs our
   optax chain on identical gradients (verifies decay-before-moments).
"""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.models.factory import create_model
from lirec_tpu.train.optim import make_optimizer

from tests import reference_bridge as bridge

pytestmark = pytest.mark.skipif(
    not bridge.reference_available(), reason="/root/reference not mounted"
)

TEXT, VIS, JOINT = 16, 32, 16
MLP = TEXT + VIS + 2 * VIS


def _cfg(preset, **kw):
    cfg = config_lib.preset(preset, data_root="/tmp/x", **kw)
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    cfg = cfg.with_runtime(compute_dtype="float32")
    return cfg.with_optim(dropout=0.0)  # isolate grads from dropout RNG


def _torch_model_with_params(ref, cfg, n_classes, n_rels, params):
    # dropout p=0 -> identity even in train mode
    return bridge.transplant_params(
        ref, cfg, n_classes, n_rels, params, train_mode=True
    )


@pytest.mark.parametrize("tr_correct", [False, True])
def test_gradient_parity_int_rel_ch(tr_correct):
    import jax
    import torch

    cfg = _cfg("int_rel_ch", tr_correct=tr_correct)
    ref = bridge.import_reference()
    rng = np.random.default_rng(0)
    n_classes, n_rels = 7, 6
    bundle = create_model(cfg, n_classes, n_rels=n_rels)
    B, T, R = 5, 20, cfg.tasks.rels_n_clips
    feats = rng.standard_normal((B, T, R + 1, MLP)).astype(np.float32)
    rels_mask = (rng.random((B, T, R)) < 0.5).astype(np.float32)
    rels_mask[:, :, 0] = 1
    batch = {
        "features": feats,
        "rels_mask": rels_mask,
        "labels": rng.integers(0, n_classes, B),
        "rels_label": rng.integers(0, n_rels + 1, (B, T)),
        "mem_mask": (rng.random((B, T)) < 0.8).astype(np.float32),
        "gt_tracks": np.stack(
            [np.zeros(B, np.int64), rng.integers(0, 5, B)], 1
        ),
        "multilab_weights": (rng.random((B, n_classes)) < 0.9).astype(
            np.float32
        ),
    }
    batch["mem_mask"][:, 0] = 1

    def loss_fn(p):
        out = bundle.apply(
            p, {"features": feats, "rels_mask": rels_mask},
            deterministic=False, rng=jax.random.PRNGKey(0),
        )
        return bundle.loss(out, batch)

    my_grads = jax.grad(loss_fn)(bundle.params)

    tm = _torch_model_with_params(ref, cfg, n_classes, n_rels, bundle.params)
    tb = {
        k: torch.tensor(v)
        for k, v in batch.items()
        if k not in ("features", "rels_mask")
    }
    tb["features"] = torch.tensor(feats, dtype=torch.float64)
    tb["rels_mask"] = torch.tensor(rels_mask)
    with bridge.legacy_byte_masks():
        ref_loss_mod = ref.model.MarginTrackRelsLoss(n_rels=n_rels)
        out = tm(tb)
        loss = ref_loss_mod(out, tb)
        loss.backward()

    checked = 0
    for name, param in tm.named_parameters():
        base, kind = name.rsplit(".", 1)
        key = "gates_ints" if base == "gates_ints.fc_out" else base
        mine = np.asarray(
            my_grads[key]["kernel" if kind == "weight" else "bias"]
        )
        theirs = param.grad.numpy()
        if kind == "weight":
            theirs = theirs.T
        np.testing.assert_allclose(
            mine, theirs, atol=2e-5, rtol=1e-4, err_msg=name
        )
        checked += 1
    assert checked == len(jax.tree.leaves(my_grads))


def test_gradient_parity_modalities():
    import jax
    import torch

    cfg = _cfg("modalities")
    ref = bridge.import_reference()
    rng = np.random.default_rng(1)
    n_classes = 7
    bundle = create_model(cfg, n_classes)
    B = 6
    feats = rng.standard_normal((B, 1, MLP)).astype(np.float32)
    batch = {
        "features": feats,
        "labels": rng.integers(0, n_classes, B),
        "multilab_weights": (rng.random((B, n_classes)) < 0.9).astype(
            np.float32
        ),
    }

    def loss_fn(p):
        out = bundle.apply(
            p, {"features": feats}, deterministic=False,
            rng=jax.random.PRNGKey(0),
        )
        return bundle.loss(out, batch)

    my_grads = jax.grad(loss_fn)(bundle.params)
    tm = _torch_model_with_params(ref, cfg, n_classes, 0, bundle.params)
    tb = {k: torch.tensor(v) for k, v in batch.items()}
    with bridge.legacy_byte_masks():
        loss = ref.model.MaxMarginCrossEntropyLoss()(tm(tb), tb)
        loss.backward()
    for name, param in tm.named_parameters():
        base, kind = name.rsplit(".", 1)
        mine = np.asarray(
            my_grads[base]["kernel" if kind == "weight" else "bias"]
        )
        theirs = param.grad.numpy()
        if kind == "weight":
            theirs = theirs.T
        np.testing.assert_allclose(
            mine, theirs, atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_adam_update_parity():
    """One optimizer step on fixed grads: torch Adam(weight_decay) ==
    our add_decayed_weights -> scale_by_adam -> lr chain."""
    import torch

    rng = np.random.default_rng(2)
    w0 = rng.standard_normal((8, 4)).astype(np.float32)
    g = rng.standard_normal((8, 4)).astype(np.float32)
    lr, wd = 3e-5, 1e-5

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    tw.grad = torch.tensor(g.copy())
    for _ in range(3):
        opt.step()

    import jax.numpy as jnp

    tx = make_optimizer(lr, wd)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6, rtol=1e-5
    )
