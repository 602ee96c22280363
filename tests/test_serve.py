"""Inference server: drive it over a real socket."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.cli.serve import InferenceEngine, make_handler
from lirec_tpu.models.factory import create_model
from lirec_tpu.utils.fake_batch import make_batch, make_tables


@pytest.fixture(scope="module")
def server():
    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, 9, n_rels=6)
    tables = make_tables(bundle.spec, 32, 48, seed=1)
    engine = InferenceEngine(bundle, tables, topk=3, max_batch=8)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield "http://127.0.0.1:%d" % httpd.server_port, bundle
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz(server):
    base, bundle = server
    with urllib.request.urlopen(base + "/healthz") as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"
    assert payload["n_classes"] == 9


def test_predict(server):
    base, bundle = server
    batch = make_batch(bundle.spec, 3, 32, 48, seed=2)
    samples = [
        {
            "feat_idx": batch["feat_idx"][i].tolist(),
            "rels_mask": batch["rels_mask"][i].tolist(),
        }
        for i in range(3)
    ]
    status, payload = _post(base + "/predict", {"samples": samples})
    assert status == 200
    preds = payload["predictions"]
    assert len(preds) == 3
    for p in preds:
        assert len(p["interactions"]) == 3
        assert len(p["relationships"]) == 3
        assert 0 <= p["best_track"] < 20
        assert all(0 <= x["score"] <= 1 for x in p["interactions"])
    # padding: scores match direct forward on the unpadded batch
    mb = {k: batch[k][:3] for k in ("feat_idx", "rels_mask")}
    import jax.numpy as jnp

    tables = {
        k: jnp.asarray(v)
        for k, v in make_tables(bundle.spec, 32, 48, seed=1).items()
    }
    out = bundle.apply(bundle.params, mb, tables=tables)
    s = 1 / (1 + np.exp(-np.asarray(out["inters"], np.float64)[0]))
    assert abs(preds[0]["track_scores"][0] - s.max(axis=1)[0]) < 1e-4


def test_predict_bad_requests(server):
    base, _ = server
    status, payload = _post(base + "/predict", {"nope": 1})
    assert status == 400 and "error" in payload
    status, payload = _post(base + "/predict", {"samples": [{"feat_idx": [1]}]})
    assert status == 400
    status, payload = _post(base + "/missing", {})
    assert status == 404


def test_serve_non_maxtracks_preset():
    """int_rels preset (no hypothesis axis) must serve too (regression:
    the engine assumed [B, T, C] outputs)."""
    from lirec_tpu.cli.serve import InferenceEngine

    cfg = config_lib.preset("int_rels", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, 9, n_rels=6)
    tables = make_tables(bundle.spec, 32, 48, seed=3)
    engine = InferenceEngine(bundle, tables, topk=2, max_batch=8)
    batch = make_batch(bundle.spec, 2, 32, 48, seed=4)
    feat_idx = np.asarray(batch["feat_idx"][:, 0])  # [B, 1+R, 3]
    rels_mask = np.asarray(batch["rels_mask"][:, 0])  # [B, R]
    out = engine.predict(feat_idx, rels_mask)
    assert len(out) == 2 and len(out[0]["interactions"]) == 2
    assert out[0]["best_track"] == 0


def test_serve_rejects_bad_geometry_and_indices(server):
    base, bundle = server
    batch = make_batch(bundle.spec, 1, 32, 48, seed=5)
    good = {
        "feat_idx": batch["feat_idx"][0].tolist(),
        "rels_mask": batch["rels_mask"][0].tolist(),
    }
    # out-of-range table index -> 400, not silent clamping
    bad = json.loads(json.dumps(good))
    bad["feat_idx"][0][0][0] = 10**9
    status, payload = _post(base + "/predict", {"samples": [bad]})
    assert status == 400 and "out of range" in payload["error"]
    # wrong context length -> 400
    bad2 = json.loads(json.dumps(good))
    bad2["feat_idx"] = [row[:5] for row in bad2["feat_idx"]]
    status, payload = _post(base + "/predict", {"samples": [bad2]})
    assert status == 400


def test_bucket_never_exceeds_max_batch():
    from lirec_tpu.cli.serve import InferenceEngine

    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, 9, n_rels=6)
    engine = InferenceEngine(
        bundle, make_tables(bundle.spec, 32, 48), max_batch=6
    )
    assert engine._bucket(5) == 6  # clamped, not 8


def test_oversized_body_rejected_before_read(server):
    """Content-Length above the max_batch-derived bound -> 413 without
    reading the body (the request is never parsed)."""
    import urllib.error
    import urllib.request

    base, _ = server
    big = 9 << 20  # > max_batch(8) << 20
    req = urllib.request.Request(
        base + "/predict",
        data=b"x" * 1024,  # body smaller than claimed: server must not block
        headers={"Content-Type": "application/json",
                 "Content-Length": str(big)},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            status, payload = resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        status, payload = err.code, json.loads(err.read())
    assert status == 413
    assert "exceeds" in payload["error"]


def test_negative_content_length_rejected(server):
    """Content-Length: -1 must not reach rfile.read(-1) (blocks to EOF)."""
    import http.client

    base, _ = server
    host = base.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=10)
    conn.putrequest("POST", "/predict", skip_accept_encoding=True)
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", "-1")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_engine_warm_compiles_buckets():
    """warm() pre-runs the forward for the requested pow2 buckets so the
    first real request skips the compile."""
    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, 9, n_rels=6)
    engine = InferenceEngine(
        bundle, make_tables(bundle.spec, 32, 48, seed=1), max_batch=8
    )
    engine.warm([1, 3])
    feat_idx = np.zeros((2, engine.n_hyps, engine.n_ctx, 3), np.int32)
    rels_mask = np.zeros(
        (2, engine.n_hyps, engine.n_ctx - 1), np.int64
    )
    out = engine.predict(feat_idx, rels_mask)
    assert len(out) == 2
