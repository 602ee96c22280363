"""Golden parity: JAX models/losses vs the reference torch modules on random
weights and inputs (f32, eval mode)."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.models import losses as jl
from lirec_tpu.models.factory import create_model

from tests import reference_bridge as bridge

pytestmark = pytest.mark.skipif(
    not bridge.reference_available(), reason="/root/reference not mounted"
)

TEXT, VIS, JOINT = 16, 32, 16
MLP = TEXT + VIS + 2 * VIS


def _cfg(preset_name, **kw):
    cfg = config_lib.preset(preset_name, data_root="/tmp/x", **kw)
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    return cfg.with_runtime(compute_dtype="float32").with_tasks(
        inter_class="all"
    )


def _torch_model(cfg, n_classes, n_rels, params):
    """Fresh reference model with our params transplanted."""
    ref = bridge.import_reference()
    return bridge.transplant_params(ref, cfg, n_classes, n_rels, params)


def _compare(mine, theirs, atol=2e-5):
    np.testing.assert_allclose(
        np.asarray(mine, dtype=np.float64),
        theirs.detach().numpy().astype(np.float64),
        atol=atol,
        rtol=1e-4,
    )


def test_modalities_forward_parity():
    import torch

    cfg = _cfg("modalities")
    rng = np.random.default_rng(0)
    n_classes = 7
    bundle = create_model(cfg, n_classes)
    feats = rng.standard_normal((5, 1, MLP)).astype(np.float32)
    out = bundle.apply(bundle.params, {"features": feats})
    tm = _torch_model(cfg, n_classes, 0, bundle.params)
    with torch.no_grad():
        ref_out = tm({"features": torch.tensor(feats)})
    _compare(out["inters"], ref_out["inters"])


def test_midfusion_forward_parity():
    import torch

    cfg = _cfg("int_rels")
    rng = np.random.default_rng(1)
    n_classes, n_rels = 7, 6
    bundle = create_model(cfg, n_classes, n_rels)
    B, R = 4, cfg.tasks.rels_n_clips
    feats = rng.standard_normal((B, R + 1, MLP)).astype(np.float32)
    rels_mask = (rng.random((B, R, 1)) < 0.6).astype(np.float32)
    rels_mask[:, 0] = 1  # the dataset guarantees >=1 context clip
    out = bundle.apply(
        bundle.params, {"features": feats, "rels_mask": rels_mask}
    )
    tm = _torch_model(cfg, n_classes, n_rels, bundle.params)
    with torch.no_grad():
        # float64 input: the reference relies on `.float()` making a
        # contiguous copy before `.view` (real loader yields float64)
        ref_out = tm(
            {
                "features": torch.tensor(feats, dtype=torch.float64),
                "rels_mask": torch.tensor(rels_mask),
            }
        )
    _compare(out["inters"], ref_out["inters"])
    _compare(out["rels"], ref_out["rels"])


def test_maxtracks_forward_parity_ctx_off():
    import torch

    cfg = _cfg("int_ch")
    rng = np.random.default_rng(2)
    n_classes = 7
    bundle = create_model(cfg, n_classes)
    B, T = 3, 20
    feats = rng.standard_normal((B, T, MLP)).astype(np.float32)
    out = bundle.apply(bundle.params, {"features": feats})
    tm = _torch_model(cfg, n_classes, 0, bundle.params)
    with torch.no_grad():
        ref_out = tm({"features": torch.tensor(feats)})
    _compare(out["inters"], ref_out["inters"].reshape(B, T, n_classes))


def test_maxtracks_forward_parity_full():
    import torch

    cfg = _cfg("int_rel_ch")
    rng = np.random.default_rng(3)
    n_classes, n_rels = 7, 6
    bundle = create_model(cfg, n_classes, n_rels)
    B, T, R = 3, 20, cfg.tasks.rels_n_clips
    feats = rng.standard_normal((B, T, R + 1, MLP)).astype(np.float32)
    rels_mask = (rng.random((B, T, R)) < 0.4).astype(np.float32)
    rels_mask[:, 5:] = 0  # empty contexts exercise the divider guard
    out = bundle.apply(
        bundle.params, {"features": feats, "rels_mask": rels_mask}
    )
    tm = _torch_model(cfg, n_classes, n_rels, bundle.params)
    with torch.no_grad():
        ref_out = tm(
            {
                "features": torch.tensor(feats),
                "rels_mask": torch.tensor(rels_mask),
            }
        )
    _compare(out["inters"], ref_out["inters"])
    _compare(out["rels"], ref_out["rels"])


# ---------------------------------------------------------------- losses


def _loss_batch(rng, B=6, T=20, C=7, R=6, ctx=18):
    labels = rng.integers(0, C, B)
    mem = np.zeros((B, T), np.float32)
    for i in range(B):
        mem[i, : rng.integers(2, T + 1)] = 1
    gt = np.zeros((B, 2), np.int64)
    gt[rng.random(B) < 0.4, 1] = rng.integers(1, 5)
    multilab = (rng.random((B, C)) < 0.9).astype(np.float32)
    rels_label = rng.integers(0, R + 1, (B, T))
    return {
        "labels": labels,
        "mem_mask": mem,
        "gt_tracks": gt,
        "multilab_weights": multilab,
        "rels_label": rels_label,
    }


def _to_torch(d):
    import torch

    return {k: torch.tensor(v) for k, v in d.items()}


@pytest.mark.parametrize("tr_correct", [False, True])
@pytest.mark.parametrize("sum_max", [False, True])
def test_margin_loss_parity(tr_correct, sum_max):
    import torch

    cfg = _cfg("int_ch", tr_correct=tr_correct).with_tasks(
        tr_max_neg=sum_max, tr_sum_max_flag=sum_max
    )
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    rng = np.random.default_rng(4)
    B, T, C = 6, 20, 7
    batch = _loss_batch(rng, B=B, T=T, C=C)
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    mine = jl.margin_loss(
        {"inters": logits},
        batch,
        tr_margin=cfg.optim.tr_margin,
        tr_correct=tr_correct,
        tr_max_neg=sum_max,
        tr_sum_max_flag=sum_max,
    )
    tb = _to_torch(batch)
    with bridge.legacy_byte_masks():
        ref_loss = ref.model.MarginLoss()(
            {"inters": torch.tensor(logits.copy())}, tb
        )
    np.testing.assert_allclose(
        float(mine), float(ref_loss), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("tr_correct", [False, True])
@pytest.mark.parametrize("sum_max", [False, True])
def test_margin_track_rels_loss_parity(tr_correct, sum_max):
    import torch

    cfg = _cfg("int_rel_ch", tr_correct=tr_correct).with_tasks(
        tr_max_neg=sum_max, tr_sum_max_flag=sum_max
    )
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    rng = np.random.default_rng(5)
    B, T, C, R = 6, 20, 7, 6
    batch = _loss_batch(rng, B=B, T=T, C=C, R=R)
    ints = rng.standard_normal((B, T, C)).astype(np.float32)
    rels = rng.standard_normal((B, T, R)).astype(np.float32)
    mine = jl.margin_track_rels_loss(
        {"inters": ints, "rels": rels},
        batch,
        R,
        tr_margin=cfg.optim.tr_margin,
        lymbda=cfg.optim.lymbda,
        tr_correct=tr_correct,
        tr_max_neg=sum_max,
        tr_sum_max_flag=sum_max,
    )
    tb = _to_torch(batch)
    with bridge.legacy_byte_masks():
        ref_loss = ref.model.MarginTrackRelsLoss(n_rels=R)(
            {
                "inters": torch.tensor(ints.copy()),
                "rels": torch.tensor(rels.copy()),
            },
            tb,
        )
    np.testing.assert_allclose(
        float(mine), float(ref_loss), atol=1e-5, rtol=1e-5
    )


def test_multitask_max_margin_parity():
    import torch

    cfg = _cfg("int_rels")
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    rng = np.random.default_rng(6)
    B, C, R = 6, 7, 6
    inters = rng.standard_normal((B, C)).astype(np.float32)
    rels = rng.standard_normal((B, R)).astype(np.float32)
    labels = np.zeros((B, 19, 1), np.int64)
    labels[:, 0, 0] = rng.integers(0, C, B)
    rels_label = rng.integers(0, R + 1, B)
    multilab = (rng.random((B, C)) < 0.9).astype(np.float32)
    batch = {
        "labels": labels,
        "rels_label": rels_label,
        "multilab_weights": multilab,
    }
    mine = jl.multitask_max_margin_loss(
        {"inters": inters, "rels": rels},
        batch,
        R,
        margin=cfg.optim.margin,
        lymbda=cfg.optim.lymbda,
    )
    with bridge.legacy_byte_masks():
        ref_loss = ref.model.MultiTaskMaxMargin(n_rels=R)(
            {
                "inters": torch.tensor(inters.copy()),
                "rels": torch.tensor(rels.copy()),
            },
            _to_torch(batch),
        )
    np.testing.assert_allclose(
        float(mine), float(ref_loss), atol=1e-5, rtol=1e-5
    )


def test_max_margin_ce_parity():
    import torch

    cfg = _cfg("modalities")
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    rng = np.random.default_rng(7)
    B, C = 6, 7
    inters = rng.standard_normal((B, C)).astype(np.float32)
    labels = rng.integers(0, C, B)
    multilab = (rng.random((B, C)) < 0.9).astype(np.float32)
    batch = {"labels": labels, "multilab_weights": multilab}
    mine = jl.max_margin_ce_loss(
        {"inters": inters}, batch, margin=cfg.optim.margin
    )
    with bridge.legacy_byte_masks():
        ref_loss = ref.model.MaxMarginCrossEntropyLoss()(
            {"inters": torch.tensor(inters.copy())}, _to_torch(batch)
        )
    np.testing.assert_allclose(
        float(mine), float(ref_loss), atol=1e-5, rtol=1e-5
    )
