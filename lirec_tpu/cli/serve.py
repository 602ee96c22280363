"""Inference server: the deployment surface the reference never had.

A lightweight HTTP/JSON server around the jit-compiled eval forward:

    POST /predict   {"samples": [{"feat_idx": [[c,t1,t2] x (1+R)] x T,
                                  "rels_mask": [[0/1 x R] x T]}, ...]}
      -> {"predictions": [{"interactions": [{"label": i, "score": s} topk],
                           "relationships": [...],
                           "track_scores": [...]}, ...]}
    GET  /healthz   -> {"status": "ok", ...}

Requests are padded to power-of-two batch buckets so the number of
compiled shapes stays bounded; the first request per bucket pays the
compile, later ones are steady-state. Feature tables are embedded once at
startup (models/tabular.embed_all).
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import numpy as np


class InferenceEngine:
    """jit-warmed forward over fixed feature tables."""

    def __init__(self, bundle, tables, topk: int = 5, max_batch: int = 64):
        import jax
        import jax.numpy as jnp

        from lirec_tpu.models.tabular import embed_all

        self.bundle = bundle
        self.topk = topk
        self.max_batch = max_batch
        self.tables = jax.tree.map(jnp.asarray, tables)
        self.n_clip_rows = int(self.tables["text"].shape[0])
        self.n_track_rows = int(self.tables["track"].shape[0])
        spec = bundle.spec
        # fixed request geometry: only the batch dim varies (bucketed), so
        # the compiled-shape set stays bounded
        self.n_hyps = 20 if spec.tr_maximize else 1
        self.n_ctx = (18 + 1) if spec.ctx else 1
        self.embedded = jax.jit(
            lambda p, tb: embed_all(p, spec, tb)
        )(bundle.params, self.tables)
        self._lock = threading.Lock()

        @jax.jit
        def forward(params, feat_idx, rels_mask, tables, embedded):
            out = bundle.apply(
                params,
                {"feat_idx": feat_idx, "rels_mask": rels_mask},
                tables=tables,
                embedded=embedded,
            )
            return out["inters"], out.get("rels")

        self._forward_jit = forward
        # per-bucket AOT executable cache: a restarted server pays ~0.1 s
        # per warmed bucket instead of the remote compile (~2 min each
        # through the tunnel) — utils/aot_cache.py
        self._compiled = {}

    def _forward(self, params, feat_idx, rels_mask, tables, embedded):
        from lirec_tpu.utils import aot_cache

        # normalize dtypes so warm() and the request handler share one
        # executable per bucket (and key on dtype anyway: an AOT Compiled
        # rejects mismatched avals instead of recompiling like jit);
        # int32 — jax canonicalizes int64 down to it anyway (x64 off)
        feat_idx = np.asarray(feat_idx, np.int32)
        rels_mask = np.asarray(rels_mask, np.int32)
        key = (
            feat_idx.shape, str(feat_idx.dtype),
            rels_mask.shape, str(rels_mask.dtype),
        )
        fn = self._compiled.get(key)
        if fn is None:
            fn = aot_cache.cached_compile(
                self._forward_jit, params, feat_idx, rels_mask, tables,
                embedded, label="serve_forward",
            )
            self._compiled[key] = fn
        return fn(params, feat_idx, rels_mask, tables, embedded)

    def _bucket(self, n: int) -> int:
        return min(1 << max(0, (n - 1)).bit_length(), self.max_batch)

    def warm(self, buckets) -> None:
        """Compile the forward for the given batch buckets up front (row 0
        of every table is zeros, so all-zero index requests are valid) —
        first-request latency drops from the compile time (~2 min through
        a tunneled chip) to the steady-state few ms."""
        for b in sorted({self._bucket(int(x)) for x in buckets}):
            feat_idx = np.zeros((b, self.n_hyps, self.n_ctx, 3), np.int32)
            rels_mask = np.zeros((b, self.n_hyps, self.n_ctx - 1), np.int32)
            if not self.bundle.spec.tr_maximize:
                feat_idx = feat_idx[:, 0]
                rels_mask = rels_mask[:, 0]
            self.predict(feat_idx, rels_mask)

    def _validate(self, feat_idx: np.ndarray, rels_mask: np.ndarray) -> None:
        if self.bundle.spec.tr_maximize:
            expect = (self.n_hyps, self.n_ctx, 3)
            mask_expect = (self.n_hyps, self.n_ctx - 1)
        else:
            expect = (self.n_ctx, 3)
            mask_expect = (self.n_ctx - 1,)
        if feat_idx.shape[1:] != expect:
            raise ValueError(
                "feat_idx must be [B, %s] for this preset; got %s"
                % (", ".join(map(str, expect)), feat_idx.shape)
            )
        if self.n_ctx > 1 and rels_mask.shape[1:] != mask_expect:
            raise ValueError(
                "rels_mask must be [B, %s]; got %s"
                % (", ".join(map(str, mask_expect)), rels_mask.shape)
            )
        # XLA gathers clamp out-of-range indices silently; reject instead
        clip = feat_idx[..., 0]
        trk = feat_idx[..., 1:]
        if clip.min() < 0 or clip.max() >= self.n_clip_rows:
            raise ValueError(
                "clip index out of range [0, %d)" % self.n_clip_rows
            )
        if trk.min() < 0 or trk.max() >= self.n_track_rows:
            raise ValueError(
                "track index out of range [0, %d)" % self.n_track_rows
            )

    def predict(self, feat_idx: np.ndarray, rels_mask: np.ndarray):
        """feat_idx [B, T, 1+R, 3]; rels_mask [B, T, R] -> per-sample topk."""
        import jax

        B = feat_idx.shape[0]
        if B > self.max_batch:
            raise ValueError("batch too large: %d > %d" % (B, self.max_batch))
        self._validate(feat_idx, rels_mask)
        padded = self._bucket(B)
        if padded != B:
            feat_idx = np.concatenate(
                [feat_idx, np.zeros((padded - B,) + feat_idx.shape[1:],
                                    feat_idx.dtype)]
            )
            rels_mask = np.concatenate(
                [rels_mask, np.zeros((padded - B,) + rels_mask.shape[1:],
                                     rels_mask.dtype)]
            )
        with self._lock:
            inters, rels = self._forward(
                self.bundle.params, feat_idx, rels_mask, self.tables,
                self.embedded,
            )
        from lirec_tpu.evaluation.metrics import _sigmoid as sigmoid

        inters = np.asarray(inters, np.float64)[:B]
        rels = np.asarray(rels, np.float64)[:B] if rels is not None else None
        if inters.ndim == 2:  # non-maxtracks presets: [B, C] -> [B, 1, C]
            inters = inters[:, None, :]
            if rels is not None:
                rels = rels[:, None, :]

        results = []
        for b in range(B):
            s_cl = sigmoid(inters[b])  # [T, C]
            track_scores = s_cl.max(axis=1)
            best_track = int(track_scores.argmax())
            class_scores = s_cl[best_track]
            top_cls = np.argsort(-class_scores)[: self.topk]
            item = {
                "track_scores": [round(float(x), 6) for x in track_scores],
                "best_track": best_track,
                "interactions": [
                    {"label": int(i), "score": round(float(class_scores[i]), 6)}
                    for i in top_cls
                ],
            }
            if rels is not None:
                s_r = sigmoid(rels[b])[min(best_track, rels.shape[1] - 1)]
                top_r = np.argsort(-s_r)[: self.topk]
                item["relationships"] = [
                    {"label": int(i), "score": round(float(s_r[i]), 6)}
                    for i in top_r
                ]
            results.append(item)
        return results


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "n_classes": engine.bundle.spec.n_classes,
                    "n_rels": engine.bundle.spec.n_rels,
                    "max_batch": engine.max_batch,
                })
            else:
                self._send(404, {"error": "unknown path %s" % self.path})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path %s" % self.path})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                # Cap the body before reading it: the largest legal request is
                # max_batch samples of [20, 19, 3] int indices (+ masks), well
                # under 1 MB/sample as JSON text.
                max_body = max(1, engine.max_batch) << 20
                if length < 0 or length > max_body:
                    # negative Content-Length would make read() block
                    # until EOF, parking the handler thread
                    self._send(413, {
                        "error": "request body %d bytes exceeds %d"
                        % (length, max_body)
                    })
                    return
                payload = json.loads(self.rfile.read(length) or b"{}")
                samples = payload["samples"]
                feat_idx = np.asarray(
                    [s["feat_idx"] for s in samples], np.int32
                )
                if all("rels_mask" in s for s in samples):
                    rels_mask = np.asarray(
                        [s["rels_mask"] for s in samples], np.int32
                    )
                else:  # context-free presets don't need a mask
                    rels_mask = np.zeros((len(samples), 1), np.int32)
                if feat_idx.ndim not in (3, 4) or feat_idx.shape[-1] != 3:
                    raise ValueError(
                        "feat_idx must be [T, 1+R, 3] (maxtracks presets) or "
                        "[1+R, 3] per sample; got %s" % (feat_idx.shape,)
                    )
                results = engine.predict(feat_idx, rels_mask)
                self._send(200, {"predictions": results})
            except (KeyError, ValueError, TypeError) as err:
                self._send(400, {"error": str(err)})
            except Exception as err:  # runtime/XLA errors -> clean 500
                self._send(500, {"error": "%s: %s" % (type(err).__name__, err)})

    return Handler


def build_engine_from_args(args) -> InferenceEngine:
    from lirec_tpu import config as config_lib
    from lirec_tpu.cli.common import load_checkpoint_params
    from lirec_tpu.data.dataset import InteractionDataset
    from lirec_tpu.models.factory import create_model

    cfg = config_lib.preset(args.preset, data_root=args.data_root)
    cfg = cfg.with_dims(
        text_dim=args.text_dim, visual_dim=args.visual_dim,
        text_layers=args.text_layers, joint_dim=args.joint_dim,
    )
    ds = InteractionDataset(cfg, mode=args.split)
    ds.cache(parallel_workers=args.cache_workers)
    if cfg.tasks.rels or cfg.tasks.rels_multitask:
        ds.init_relships()
    bundle = create_model(cfg, ds.n_classes, n_rels=max(ds.n_rels - 1, 0))
    params = bundle.params
    if args.resume_path:
        params = load_checkpoint_params(args.resume_path, template=params)
    bundle = bundle._replace(params=params)
    return InferenceEngine(bundle, ds.tables.as_dict(), topk=args.topk,
                           max_batch=args.max_batch)


def main(argv=None):
    p = argparse.ArgumentParser(prog="lirec-tpu serve")
    p.add_argument("--data-root", required=True)
    p.add_argument("--preset", default="int_rel_ch")
    p.add_argument("--split", default="test")
    p.add_argument("--resume-path", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--cache-workers", type=int, default=0)
    p.add_argument("--text-dim", type=int, default=768)
    p.add_argument("--visual-dim", type=int, default=2048)
    p.add_argument("--text-layers", type=int, default=12)
    p.add_argument("--joint-dim", type=int, default=512)
    p.add_argument("--warm-buckets", default="1",
                   help="comma-separated batch sizes whose pow2 buckets "
                        "compile at startup (first request then skips the "
                        "compile); empty string disables")
    args = p.parse_args(argv)

    from lirec_tpu.cli.common import _enable_compilation_cache

    _enable_compilation_cache()
    engine = build_engine_from_args(args)
    if args.warm_buckets:
        buckets = [int(x) for x in args.warm_buckets.split(",") if x]
        print("warming predict buckets %s..." % buckets)
        engine.warm(buckets)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(engine))
    print("serving on http://%s:%d" % (args.host, args.port))
    server.serve_forever()


if __name__ == "__main__":
    main()
