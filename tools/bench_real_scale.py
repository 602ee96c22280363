#!/usr/bin/env python
"""Real-cardinality stress benchmark (VERDICT r3 item 3).

Every r1-r3 headline was measured at toy table sizes (~2k clip rows / ~4k
track rows). Real MovieGraphs splits deduplicate to TENS of thousands of
rows (SURVEY.md §7 throughput note) — and the kernels' VMEM/SMEM gates
are exactly where silent 2x regressions have lived (r1 kernel disable,
r3 B=256 cliff). This tool runs the packed e2e eval sweep AND the full
train step at real dims (768/2048/2048, joint 512) against large
deduplicated tables, reporting throughput AND which kernel tier actually
executed (ops/dispatch.py records every decision; nothing is silent).

Run (real chip): env PYTHONPATH="/root/repo:$PYTHONPATH" \
    python tools/bench_real_scale.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batch", default="64",
        help="batch size, or a comma-separated list (e.g. 64,256) measured "
        "back-to-back in ONE session — the only honest way to compare "
        "batch sizes on the shared chip (BENCH.md methodology note 3)",
    )
    ap.add_argument("--n-clips", type=int, default=12288,
                    help="unique fused clip rows (>=10k = real test split)")
    ap.add_argument("--n-tracks", type=int, default=24576)
    ap.add_argument("--n-batches", type=int, default=168)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument(
        "--iid-batches", action="store_true",
        help="train batches with IID-random indices (the r4-early stress; "
        "default is make_structured_batch, which mirrors the real "
        "loader's per-sample locality — see utils/fake_batch.py)",
    )
    ap.add_argument(
        "--localize", choices=("ablate", "on", "off", "tables", "triple"),
        default="ablate",
        help="batch-local table projection for the train step / ctx "
        "localization tier for eval: 'ablate' (default) measures "
        "off + the forced per-table tier + the forced triple tier in one "
        "session; 'tables'/'triple' force one eval tier",
    )
    args = ap.parse_args()

    import bench
    from lirec_tpu.ops import dispatch

    batch_sizes = [int(b) for b in str(args.batch).split(",")]
    out = {
        "n_clips": args.n_clips,
        "n_tracks": args.n_tracks,
        "batch": batch_sizes[0] if len(batch_sizes) == 1 else batch_sizes,
    }

    for B in batch_sizes:
        suffix = "" if len(batch_sizes) == 1 else "_b%d" % B

        if not args.skip_eval:
            # --localize ablate measures eval with localization OFF then
            # AUTO in the same session (auto == off below the VMEM gate,
            # where the second run just confirms the dispatch decision)
            ev_variants = (
                ((False, ""), ("tables", "_loc"), ("triple", "_tri"))
                if args.localize == "ablate"
                else ((
                    {"on": True, "off": False}.get(
                        args.localize, args.localize
                    ), ""),)
            )
            for loc_flag, lsuf in ev_variants:
                t0 = time.time()
                stats = bench.bench_e2e_eval(
                    B, args.compute_dtype,
                    n_clips=args.n_clips, n_tracks=args.n_tracks,
                    n_batches=args.n_batches,
                    structured=not args.iid_batches,
                    localize_ctx=loc_flag,
                )
                ctx = (
                    dispatch.last_dispatch("fused_ctx_pool_triple")
                    if loc_flag == "triple"
                    else dispatch.last_dispatch("fused_ctx_pool")
                )
                locd = dispatch.last_dispatch("eval_ctx_localize")
                key = "eval" + lsuf + suffix
                out[key + "_clips_per_sec"] = round(
                    stats["clips_per_sec"], 1
                )
                out[key + "_compile_s"] = stats["compile_s"]
                out[key + "_ctx_dispatch"] = ctx
                out[key + "_ctx_localize"] = locd
                log(
                    "EVAL%s B=%d %.1fk clips/sec at %d clip rows / %d "
                    "track rows; ctx kernel -> %s (%s); localize -> %s  "
                    "[%.0fs]"
                    % (lsuf, B, stats["clips_per_sec"] / 1e3, args.n_clips,
                       args.n_tracks, ctx and ctx["path"],
                       ctx and ctx["reason"],
                       locd and "%s (%s)" % (locd["path"], locd["reason"]),
                       time.time() - t0)
                )

        if not args.skip_train:
            # tools/bench_train.measure_modes hard-codes 2048/4096 tables;
            # run the same 'full' sweep at the stress cardinalities instead
            variants = (
                (False, True) if args.localize == "ablate"
                else (args.localize in ("on", "tables", "triple"),)
            )
            for localize in variants:
                res = _train_at_scale(args, B, localize=localize)
                key = ("train_localized" if localize else "train") + suffix
                out[key] = res
                sc = dispatch.last_dispatch("scatter_accum")
                out[key + "_scatter_dispatch"] = sc
                log(
                    "TRAIN B=%d%s %.2f ms/step (%.1fk clips/sec); "
                    "scatter -> %s (%s)"
                    % (
                        B, " (localized)" if localize else "",
                        res["ms"], B / res["ms"],
                        sc and sc["path"], sc and sc["reason"],
                    )
                )

    print(json.dumps(out))


def _train_at_scale(args, B: int, localize: bool = False):
    """Full train step (fwd+loss+bwd+Adam) slope-timed at the stress
    cardinalities — the tools/bench_train.py 'full' mode with big tables."""
    import jax
    import jax.numpy as jnp

    from lirec_tpu import config as config_lib
    from lirec_tpu.cli.common import _enable_compilation_cache
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train import optim as optim_lib
    from lirec_tpu.utils.fake_batch import (
        make_batch, make_structured_batch, make_tables,
    )

    _enable_compilation_cache()
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype=args.compute_dtype)
    bundle = create_model(cfg, 101, n_rels=15)
    n_clips, n_tracks = args.n_clips, args.n_tracks
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, n_clips, n_tracks)
    )
    make = make_batch if args.iid_batches else make_structured_batch
    batches = [
        make(bundle.spec, B, n_clips, n_tracks, seed=s) for s in range(4)
    ]
    info = {}
    if localize:
        from lirec_tpu.data.localize import Localizer, batch_unique_counts

        counts = [batch_unique_counts(b) for b in batches]
        loc = Localizer(bundle.spec, n_clips, n_tracks, force=True)
        batches = loc.maybe_localize(batches)
        info = {
            "unique_clip_per_batch": [c for c, _ in counts],
            "unique_track_per_batch": [t for _, t in counts],
            "cap_clip": loc.cap_clip,
            "cap_track": loc.cap_track,
            "dedup_clip_x": round(n_clips / max(loc.cap_clip, 1), 2),
            "dedup_track_x": round(n_tracks / max(loc.cap_track, 1), 2),
        }
        log(
            "localized: caps %d/%d vs tables %d/%d (dedup %.1fx / %.1fx)"
            % (loc.cap_clip, loc.cap_track, n_clips, n_tracks,
               info["dedup_clip_x"], info["dedup_track_x"])
        )
    stacked = {
        k: jnp.stack([jnp.asarray(b[k]) for b in batches])
        for k in batches[0]
    }
    model_keys = tuple(
        k for k in ("feat_idx", "rels_mask", "uniq_clip", "uniq_track")
        if k in batches[0]
    )
    base_rng = jax.random.key(0, impl="rbg")
    o = cfg.optim
    tx = optim_lib.make_optimizer(o.lr, o.weight_decay)

    # NB: `tables` must be an ARGUMENT, not a closure capture — closed-over
    # arrays are baked into the HLO as literal constants, and at stress
    # cardinality the axon remote-compile request then exceeds the
    # tunnel's body limit (HTTP 413).
    @jax.jit
    def sweep(params, opt_state, stacked, tables, n):
        def body(i, carry):
            params, opt_state, fold = carry
            batch = jax.tree.map(lambda a: a[i % 4], stacked)
            rng = jax.random.fold_in(base_rng, i)
            model_batch = {k: batch[k] for k in model_keys}

            def loss_fn(p):
                outp = bundle.apply(
                    p, model_batch, tables=tables, deterministic=False,
                    rng=rng, use_tabular=False,
                )
                return bundle.loss(
                    outp, batch, rng=jax.random.fold_in(rng, 7)
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, fold + loss

        return jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0))
        )

    params = jax.device_put(bundle.params)
    opt_state = jax.jit(tx.init)(params)

    def timed(n):
        t0 = time.time()
        out = sweep(params, opt_state, stacked, tables, jnp.int32(n))
        float(out[2])
        return time.time() - t0

    t0 = time.time()
    timed(2)
    compile_s = time.time() - t0
    log("train sweep compile+first: %.1fs" % compile_s)
    per = []
    for rep in range(5):
        ts = timed(5 + 2 * rep)
        tl = timed(124 + 2 * rep)
        per.append((tl - ts) / 119)
    ok = sorted(p for p in per if p > 0) or sorted(per)
    return dict(
        {
            "ms": round(ok[len(ok) // 2] * 1000, 3),
            "reps_ms": [round(p * 1000, 3) for p in per],
            "compile_s": round(compile_s, 1),
            "batch_structure": "iid" if args.iid_batches else "structured",
        },
        **info,
    )


if __name__ == "__main__":
    main()
