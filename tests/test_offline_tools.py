"""Offline tooling: BERT extraction plumbing (fake backend), feature
relocation, token2idx verification, resume-train, metric extras."""

import os
import os.path as ops

import numpy as np
import pytest


def test_extract_text_fake_backend(synth_root, tmp_path):
    from lirec_tpu.cli.extract_text import main

    out_dir = str(tmp_path / "bert_out")
    n = main(
        ["--data-root", synth_root, "--out-dir", out_dir,
         "--backend", "fake", "--text-dim", "8", "--text-layers", "2",
         "--quiet"]
    )
    assert n > 0
    # resumable: second run extracts nothing
    n2 = main(
        ["--data-root", synth_root, "--out-dir", out_dir,
         "--backend", "fake", "--text-dim", "8", "--text-layers", "2",
         "--quiet"]
    )
    assert n2 == 0
    # format: token2idx line count == embedding rows, loadable shape
    movie_dir = ops.join(out_dir, "tt0108160")
    files = sorted(os.listdir(movie_dir))
    npys = [f for f in files if f.endswith(".npy")]
    assert npys
    emb = np.load(ops.join(movie_dir, npys[0]))
    assert emb.shape[1] == 16  # layers * dim
    with open(ops.join(movie_dir, npys[0][:-4] + ".token2idx")) as f:
        n_tokens = sum(1 for line in f if line.strip())
    assert n_tokens == emb.shape[0]


def test_verify_features_roundtrip(synth_root, tmp_path):
    from lirec_tpu.cli.verify_features import check_token2idx, copy_features

    src = ops.join(synth_root, "features", "bert", "bert_base")
    dst = str(tmp_path / "relocated")
    n = copy_features(src, dst, verbose=False)
    assert n > 0
    assert copy_features(src, dst, verbose=False) == 0  # idempotent
    assert check_token2idx(dst, verbose=False) == []
    # corrupt one file -> mismatch reported
    movie = os.listdir(dst)[0]
    files = [f for f in os.listdir(ops.join(dst, movie)) if f.endswith(".npy")]
    path = ops.join(dst, movie, files[0])
    emb = np.load(path)
    np.save(path, emb[:-1])
    bad = check_token2idx(dst, verbose=False)
    assert len(bad) == 1


def test_resume_train_roundtrip(synth_root, tmp_path):
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / "store")
    dims = ["--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
            "--joint-dim", "16", "--compute-dtype", "float32",
            "--batch-size", "8", "--quiet"]
    run_entry(
        "int_ch",
        ["--data-root", synth_root, "--store-root", store, "--train",
         "--epochs", "2"] + dims,
    )
    out = run_entry(
        "int_ch",
        ["--data-root", synth_root, "--store-root", store, "--resume-train",
         "--resume-path", store + "/1.ckpt", "--epochs", "4"] + dims,
    )
    # resumed from epoch 2: exactly 2 more epochs trained
    assert len(out["train"]["losses"]) == 2


def test_metric_extras():
    from lirec_tpu.evaluation.metrics import MetricAccumulator

    m = MetricAccumulator(n_rels=4)
    rng = np.random.default_rng(0)
    pr = rng.standard_normal((6, 5))
    gt = (rng.random((6, 5)) < 0.4).astype(int)
    m.multiclasses_update(pr, gt, thr=0.5)
    assert m._fp_tp == int((1 / (1 + np.exp(-pr)) >= 0.5).sum())
    assert m._fn_tp == int(gt.sum())
    assert 0 <= m.precision() <= 1 and 0 <= m.recall() <= 1

    m2 = MetricAccumulator()
    gt2 = np.zeros((3, 6), int)
    gt2[:, :2] = 1
    pr2 = rng.standard_normal((3, 6))
    m2.multiclass_max_update(pr2, gt2)
    assert m2.total == 6

    emb = rng.standard_normal((4, 8))
    out = rng.standard_normal((3, 1, 8))
    order = MetricAccumulator.closest_label(out, emb)
    manual = np.argsort(
        ((out[:, 0, :][:, None, :] - emb[None]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(order, manual)

    m3 = MetricAccumulator(n_rels=3)
    m3.movie_paar[1][:] = [5.0, 1.0, 0.0]
    m3.movie_paar[2][:] = [0.0, 2.0, 1.0]
    m3.movie_rels()
    assert m3.rels_global() == 0.5


def test_extract_sliding_window_no_duplicate_sep(tmp_path):
    """Multi-speaker blocks: each window appends only its second segment
    (regression: an off-by-one duplicated the mid-window [SEP])."""
    import os.path as ops

    from lirec_tpu.cli.extract_text import FakeEncoder, extract

    d = tmp_path / "dialogs" / "tt0000001"
    d.mkdir(parents=True)
    (d / "scene-001.ss-0000.es-0010.webvtt").write_text(
        "WEBVTT\n\n00:00:01.000 --> 00:00:04.000\n"
        "- First speaker line.\n- Second speaker here.\n- Third one too.\n\n"
    )
    out = tmp_path / "out"
    extract(str(tmp_path / "dialogs"), str(out), FakeEncoder(2, 4),
            verbose=False)
    tokens = [
        line.split()[0]
        for line in (out / "tt0000001" / "tt0000001_001.token2idx")
        .read_text().splitlines()
    ]
    assert tokens.count("[CLS]") == 1
    for a, b in zip(tokens, tokens[1:]):
        assert not (a == "[SEP]" and b == "[SEP]"), tokens
    # 3 speakers -> 2 windows; all three sentences' tokens present once
    assert tokens.count("[SEP]") == 3


def test_tracks_search():
    from lirec_tpu.evaluation.metrics import TracksSearch

    ts = TracksSearch()
    # 3 track pairs x 4 interactions; global max at (track 1, inter 2)
    score = np.array([
        [0.1, 0.2, 0.3, 0.0],
        [0.0, 0.1, 0.9, 0.2],
        [0.3, 0.0, 0.1, 0.1],
    ])
    ts.track_pair(score, gt_inter_idx=2, gt_track_idxs=[1])
    assert ts.top1() == 1.0 and ts.top1_gt_inter() == 1.0
    ts.track_pair(score, gt_inter_idx=0, gt_track_idxs=[0])
    assert ts.top1() == 0.5
    assert abs(ts.random() - 1 / 3) < 1e-9


def test_update_probs_top_n_labels():
    from lirec_tpu.evaluation.metrics import MetricAccumulator

    m = MetricAccumulator()
    probs = np.array([[0.1, 0.5, 0.4], [0.9, 0.05, 0.05]])
    top, p = m.update_probs(probs, np.array([1, 0]), top_n_labels=2)
    np.testing.assert_array_equal(top, [[1, 2], [0, 1]])
    np.testing.assert_allclose(p, [[0.5, 0.4], [0.9, 0.05]])


def test_best_n_saver_policy_matches_reference():
    """BestNSaver keep/evict decisions == reference ModelSaver on the same
    metric sequences (ref utils/model_saver.py:31-51)."""
    from tests import reference_bridge as bridge

    if not bridge.reference_available():
        import pytest

        pytest.skip("/root/reference not mounted")
    import importlib

    ref = bridge.import_reference()
    ref_saver_mod = importlib.import_module("utils.model_saver")
    from lirec_tpu.checkpoint.saver import BestNSaver

    rng = np.random.default_rng(11)
    mine = BestNSaver(n=4)
    theirs = ref_saver_mod.ModelSaver(n=4)
    for epoch in range(25):
        val = {
            "total": float(rng.random()),
            "ints": float(rng.random()),
            "rels": float(rng.random()),
        }
        c_mine = mine.check(val)
        c_theirs = theirs.check(val)
        assert c_mine == c_theirs, epoch
        if c_mine:
            mine.update(val, {"params": {}, "epoch": epoch}, epoch)
            theirs.update(val, {"epoch": epoch}, epoch)
    for key in ("total", "ints", "rels"):
        assert mine.eval[key] == theirs.eval[key], key
        assert mine.worst_idx[key] == theirs.worst_idx[key], key


def test_graphs_demo_cli(synth_cfg, capsys):
    """The py3loader startup.py equivalent (ref moviegraphs/py3loader/
    startup.py): census + cast + clip pprint over either graph format."""
    from lirec_tpu.cli.graphs_demo import main

    assert main([synth_cfg.paths.annotations]) == 0
    out = capsys.readouterr().out
    assert "movies with graphs" in out
    assert "Selected movie:" in out
    assert "Graph information:" in out
    assert main([synth_cfg.paths.annotations, "--movie", "nope"]) == 1
