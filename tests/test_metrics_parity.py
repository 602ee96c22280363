"""Golden parity: metric accumulators vs the reference `utils/evaluation.py`
on randomized inputs (many trials to cover the boolean-narrowing branches)."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.data import synthetic
from lirec_tpu.evaluation.metrics import MetricAccumulator, RelationshipsAcc

from tests import reference_bridge as bridge

pytestmark = pytest.mark.skipif(
    not bridge.reference_available(), reason="/root/reference not mounted"
)


@pytest.fixture(scope="module")
def ref_eval(synth_root):
    cfg = synthetic.make_config(synth_root)
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    ref.opt.soft_gt = False
    return ref


def _random_grounding_batch(rng, B=16, T=20, C=9, R=6):
    logits = rng.standard_normal((B, T, C)) * 2
    rels = rng.standard_normal((B, T, R)) * 2
    mask = np.zeros((B, T))
    for i in range(B):
        mask[i, : rng.integers(1, T + 1)] = 1
    gt_tracks = np.zeros((B, 2), int)
    second = rng.random(B) < 0.5
    gt_tracks[second, 1] = rng.integers(1, T, second.sum())
    gt_classes = rng.integers(0, C, B)
    gt_rels = rng.integers(0, R + 1, (B, T))
    just_zeros = rng.random(B) < 0.25
    return logits, rels, mask, gt_tracks, gt_classes, gt_rels, just_zeros


def test_update_probs_parity(ref_eval):
    rng = np.random.default_rng(0)
    mine = MetricAccumulator()
    ref_prec = ref_eval.evaluation.Precision()
    conf_m = np.zeros((9, 9))
    conf_r = np.zeros((9, 9))
    for _ in range(5):
        probs = rng.standard_normal((17, 9))
        gt = rng.integers(0, 9, 17)
        conf_m = mine.update_probs(probs, gt, conf_mat=conf_m)
        conf_r = ref_prec.update_probs(probs.copy(), gt.copy(), conf_mat=conf_r)
    assert mine._top1 == ref_prec._top1
    assert mine._top3 == ref_prec._top3
    assert mine._top5 == ref_prec._top5
    assert mine.total == ref_prec.total
    np.testing.assert_array_equal(conf_m, conf_r)


def test_update_probs_soft_parity(ref_eval):
    rng = np.random.default_rng(1)
    ref_eval.opt.soft_gt = True
    try:
        mine = MetricAccumulator()
        ref_prec = ref_eval.evaluation.Precision()
        C = 9
        for _ in range(5):
            probs = rng.standard_normal((13, C))
            gt = rng.integers(0, C, 13)
            soft = np.ones((13, C)) * -1
            soft[:, 0] = gt
            # add one random overlapping class for ~60% of rows
            pick = rng.random(13) < 0.6
            soft[pick, 1] = rng.integers(0, C, int(pick.sum()))
            conf = np.zeros((C, C))
            mine.update_probs(probs, gt, soft_labels=soft, conf_mat=conf)
            ref_prec.update_probs(
                probs.copy(), gt.copy(), soft_labels=soft.copy(),
                conf_mat=np.zeros((C, C)),
            )
        assert mine._top1_sf == ref_prec._top1_sf
        assert mine._top5_sf == ref_prec._top5_sf
    finally:
        ref_eval.opt.soft_gt = False


def test_update_probs_max_tracks_parity(ref_eval):
    rng = np.random.default_rng(2)
    mine = MetricAccumulator()
    ref_prec = ref_eval.evaluation.Precision()
    for _ in range(8):
        logits, _, mask, gt_tracks, gt_classes, _, just_zeros = (
            _random_grounding_batch(rng)
        )
        mine.update_probs_max_tracks(
            logits, gt_tracks, gt_classes, mask=mask, just_zeros=just_zeros
        )
        ref_prec.update_probs_max_tracks(
            logits.copy(),
            gt_tracks.copy(),
            gt_classes.copy(),
            mask=mask.copy(),
            just_zeros=just_zeros.copy(),
        )
    assert mine.total == ref_prec.total
    assert mine.total_cl == ref_prec.total_cl
    assert mine._top1 == ref_prec._top1
    assert mine._trks_top1 == ref_prec._trks_top1
    assert mine._cls_top1 == ref_prec._cls_top1


def test_update_probs_max_tracks_rels_parity(ref_eval):
    import torch

    rng = np.random.default_rng(3)
    R = 6
    mine = MetricAccumulator(n_rels=R + 1)
    ref_prec = ref_eval.evaluation.Precision(n_rels=R + 1)
    for _ in range(8):
        logits, rels, mask, gt_tracks, gt_classes, gt_rels, just_zeros = (
            _random_grounding_batch(rng, R=R)
        )
        # reference receives the torch nonzero [K, 1] tensor
        # (ref mlp/test.py:62); K>=2 to dodge the squeeze() edge case
        n_rels_data = R + 1
        while True:
            ridx = np.nonzero(gt_rels[:, 0] - n_rels_data + 1)[0]
            if len(ridx) >= 2:
                break
            gt_rels[:, 0] = rng.integers(0, R + 1, len(gt_rels))
        mine.update_probs_max_tracks_rels(
            logits,
            rels,
            gt_classes=gt_classes,
            gt_rels=gt_rels,
            gt_tracks=gt_tracks,
            mask=mask,
            just_zeros=just_zeros,
            rels_sample_idx=ridx,
        )
        rmask = torch.nonzero(
            torch.tensor(gt_rels[:, 0]) - n_rels_data + 1
        )
        ref_prec.update_probs_max_tracks_rels(
            logits.copy(),
            rels.copy(),
            gt_classes.copy(),
            gt_rels.copy(),
            gt_tracks=gt_tracks.copy(),
            just_zeros=just_zeros.copy(),
            mask=mask.copy(),
            rels_mask=rmask,
        )
    assert mine.total == ref_prec.total
    assert mine.total_cl == ref_prec.total_cl
    assert mine.total_rels == ref_prec.total_rels
    assert mine._top1 == ref_prec._top1
    assert mine._trks_top1 == ref_prec._trks_top1
    assert mine._cls_top1 == ref_prec._cls_top1
    assert mine._rels_top1 == ref_prec._rels_top1


def test_relationships_acc_parity(ref_eval):
    rng = np.random.default_rng(4)
    R = 6
    mine = RelationshipsAcc(n_rels=R + 1)
    ref_acc = ref_eval.evaluation.RelationshipsAcc(n_rels=R + 1)
    for _ in range(6):
        n = 11
        probs = rng.standard_normal((n, R))
        gt = rng.integers(0, R, n)
        hashes = rng.integers(0, 9, n)  # overlaps across updates
        mine.update(probs, gt, hashes)
        ref_acc.update(probs.copy(), gt.copy(), hashes.copy())
    assert mine.top1() == ref_acc.top1()
    assert mine.top3() == ref_acc.top3()
    np.testing.assert_array_equal(mine.conf_mat, ref_acc.conf_mat)


@pytest.mark.parametrize("with_rels", [False, True])
def test_device_predictions_match_host_counters(ref_eval, with_rels):
    """grounding_predictions + update_from_predictions must produce the same
    counters as the host update_probs_max_tracks[_rels]."""
    from lirec_tpu.evaluation.device_metrics import grounding_predictions
    from lirec_tpu.evaluation.metrics import MetricAccumulator

    rng = np.random.default_rng(7)
    R = 6
    host = MetricAccumulator(n_rels=R + 1)
    dev = MetricAccumulator(n_rels=R + 1)
    for _ in range(6):
        logits, rels, mask, gt_tracks, gt_classes, gt_rels, just_zeros = (
            _random_grounding_batch(rng, R=R)
        )
        ridx = np.nonzero(gt_rels[:, 0] - (R + 1) + 1)[0]
        preds = grounding_predictions(
            logits.astype(np.float32),
            mask,
            gt_classes,
            pr_probs_rels=rels.astype(np.float32) if with_rels else None,
            gt_rels=gt_rels if with_rels else None,
        )
        preds = {k: np.asarray(v) for k, v in preds.items()}
        if with_rels:
            host.update_probs_max_tracks_rels(
                logits, rels, gt_classes=gt_classes, gt_rels=gt_rels,
                gt_tracks=gt_tracks, mask=mask, just_zeros=just_zeros,
                rels_sample_idx=ridx,
            )
            dev.update_from_predictions(
                preds, gt_classes=gt_classes, gt_tracks=gt_tracks,
                just_zeros=just_zeros, gt_rels=gt_rels, rels_sample_idx=ridx,
            )
        else:
            host.update_probs_max_tracks(
                logits, gt_tracks, gt_classes, mask=mask,
                just_zeros=just_zeros,
            )
            dev.update_from_predictions(
                preds, gt_classes=gt_classes, gt_tracks=gt_tracks,
                just_zeros=just_zeros,
            )
    for attr in ("_top1", "_trks_top1", "_cls_top1", "_rels_top1", "total",
                 "total_cl", "total_rels"):
        assert getattr(host, attr) == getattr(dev, attr), attr
