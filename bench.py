#!/usr/bin/env python
"""Benchmark: flagship eval throughput (clips/sec) vs the PyTorch-CPU
reference compute path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec", "vs_baseline": N}

Ours: the full int_rel_ch model (MidFusionMultiClipMaxTracks + loss) on
packed batches — int32 index triples gathered from deduplicated feature
tables on device, bf16 matmuls (run on whatever jax.devices() offers; the
driver runs it on one real TPU chip).

Baseline: the same workload the reference executes per eval batch — a dense
``[B, 20, 19, 6912]`` float64 batch pushed through an equivalently-shaped
torch model + MarginTrackRels-style loss on CPU (the reference is
single-process torch CPU/GPU; CPU is its floor here, ref SURVEY.md §6).
The measured number is cached in baseline_torch.json; pass
--measure-baseline to refresh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------------------------------- ours (JAX)


def bench_jax(batch_size: int, iters: int, warmup: int, compute_dtype: str):
    import jax

    from lirec_tpu.models.factory import create_model
    from lirec_tpu import config as config_lib
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype=compute_dtype)
    bundle = create_model(cfg, 101, n_rels=15)
    n_clips, n_tracks = 2048, 4096
    import jax.numpy as jnp

    tables = jax.tree.map(jnp.asarray, make_tables(bundle.spec, n_clips, n_tracks))
    # 4 distinct batches cycled on device. Measurement methodology: the
    # remote-TPU tunnel here (a) memoizes identical executions and (b) has
    # a block_until_ready that does not actually wait, so per-step host
    # timing lies. Instead the WHOLE sweep runs on device inside one jit
    # (traced-length fori_loop, one dispatch, one result fetch), and the
    # per-step time is the slope between a short and a long sweep — compile
    # and RPC constants cancel.
    batches = [
        make_batch(bundle.spec, batch_size, n_clips, n_tracks, seed=s)
        for s in range(4)
    ]
    stacked = {
        k: jnp.stack([jnp.asarray(b[k]) for b in batches])
        for k in batches[0]
    }

    from lirec_tpu.models.tabular import embed_all

    import functools

    @functools.partial(jax.jit, static_argnames=("use_pallas",))
    def sweep(params, stacked, tables, n, use_pallas=None):
        # table embeddings amortize over the sweep, as in the eval runner
        embedded = embed_all(params, bundle.spec, tables)

        def body(i, carry):
            batch = jax.tree.map(lambda a: a[i % 4], stacked)
            model_batch = {k: batch[k] for k in ("feat_idx", "rels_mask")}
            out = bundle.apply(
                params, model_batch, tables=tables, embedded=embedded,
                use_pallas=use_pallas,
            )
            loss = bundle.loss(out, batch, rng=jax.random.PRNGKey(0))
            # fold outputs into the carry so nothing is dead code
            return (
                carry
                + loss
                + out["inters"].astype(jnp.float32).sum() * 1e-9
                + out["rels"].astype(jnp.float32).sum() * 1e-9
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    params = jax.device_put(bundle.params)
    log("compiling sweep (%s)..." % jax.default_backend())
    # Measured on v5e (B=64, ablation via this same slope method):
    # - r2: ONE fused pallas kernel (3-table gather + masked mean + tanh,
    #   ops/gather_pool.fused_ctx_pool) WINS in-program: 0.89 -> 0.58
    #   ms/step. The r1 3-call version lost (0.85 -> 1.37): each
    #   pallas_call boundary blocked XLA fusion/overlap. Default-on via
    #   use_pallas=None (auto: TPU + shapes fit).
    # - bf16 feature tables are slower (0.92 vs 0.85 ms/step): gather
    #   of 16-bit rows packs lanes worse than the halved bytes save.
    # - the loss costs ~0.06 ms of the step (fwd-only 0.79 ms).
    # - the training step (hybrid packed forward: table-level first layers,
    #   per-use dropout+second layers; fwd+bwd+Adam) is ~8.0 ms/step with
    #   the rbg PRNG default; was 11.6 ms with gather-then-embed.
    use_pallas = None
    t0 = time.time()
    float(sweep(params, stacked, tables, 2, use_pallas))
    log("compile+first run: %.1fs" % (time.time() - t0))

    def timed(n):
        t0 = time.time()
        float(sweep(params, stacked, tables, n, use_pallas))
        return time.time() - t0

    per_steps = []
    short, long_ = 4, 4 + iters
    for rep in range(3):
        t_short = timed(short + 2 * rep + 1)  # distinct n defeats memoization
        t_long = timed(long_ + 2 * rep)
        per_steps.append(
            (t_long - t_short) / (long_ + 2 * rep - (short + 2 * rep + 1))
        )
        log(
            "rep %d: short %.2fs long %.2fs -> %.2f ms/step"
            % (rep, t_short, t_long, per_steps[-1] * 1000)
        )
    per_step = sorted(per_steps)[len(per_steps) // 2]
    clips_per_sec = batch_size / per_step
    log(
        "jax: %.2f ms/step at B=%d -> %.1f clips/sec"
        % (per_step * 1000, batch_size, clips_per_sec)
    )
    return clips_per_sec


# ------------------------------------------------ ours, end to end (JAX)


def bench_e2e_eval(batch_size: int, compute_dtype: str,
                   n_clips: int = 2048, n_tracks: int = 4096,
                   n_batches: int = 168, dims=None,
                   structured: bool = False, localize_ctx=None):
    """End-to-end eval throughput: packed split (device-resident index
    batches) -> on-device metric sweep -> fetched counters -> metric dict
    on host. This is the full product path of `evaluate_packed` (the whole
    reference `testing()` loop, ref mlp/test.py:17-145), measured with the
    same tunnel-proof slope method: per-BATCH time = slope of total
    end-to-end time (including the host metric finish) over distinct
    batch counts.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lirec_tpu import config as config_lib
    from lirec_tpu.evaluation.packed import (
        device_sweep_builder,
        finish_from_carry,
    )
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.models.tabular import embed_all
    from lirec_tpu.utils.fake_batch import (
        make_batch, make_structured_batch, make_tables,
    )

    C, NR = 101, 15
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype=compute_dtype)
    if dims:
        cfg = cfg.with_dims(**dims)
    bundle = create_model(cfg, C, n_rels=NR)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, n_clips, n_tracks)
    )
    B = batch_size
    N_BATCHES = n_batches  # split size for the long sweep
    # structured=True mirrors the real loader's per-sample index locality
    # (utils/fake_batch.make_structured_batch) — required for a meaningful
    # eval ctx localization measurement; IID draws barely dedup
    make = make_structured_batch if structured else make_batch
    data_host = make(bundle.spec, B * N_BATCHES, n_clips, n_tracks, seed=7)

    t = cfg.tasks
    init_carry, step = device_sweep_builder(bundle, t, C, NR, 0)

    from lirec_tpu.evaluation.packed import inject_loc

    @jax.jit
    def sweep(params, tables, embedded, data, loc, n):
        # n is traced: every distinct batch count is a distinct input to ONE
        # compiled program (no recompiles, no execution memoization)
        def body(i, carry):
            batch = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i * B, B), data
            )
            batch = inject_loc(batch, loc, i)
            return step(params, tables, embedded, carry, batch)

        return jax.lax.fori_loop(0, n, body, init_carry())

    params = jax.device_put(bundle.params)
    embed_jit = jax.jit(lambda p, tb: embed_all(p, bundle.spec, tb))

    # AOT executable cache (utils/aot_cache.py): later processes reload
    # the binaries instead of paying the remote compile-at-load; compile_s
    # below reports exactly what THIS process paid either way
    from lirec_tpu.utils import aot_cache

    compile_t0 = time.time()
    embed_c = aot_cache.cached_compile(
        embed_jit, params, tables, label="bench_embed"
    )
    embed_compile_s = time.time() - compile_t0

    # eval ctx localization (evaluation/packed._maybe_localize_eval_ctx):
    # the exact product-path policy — fires when the embedded ctx tables
    # exceed the kernel's VMEM budget and per-batch local tables fit it
    from lirec_tpu.evaluation.packed import _maybe_localize_eval_ctx

    emb0 = embed_c(params, tables)
    loc = _maybe_localize_eval_ctx(
        type("DS", (), {})(), data_host, emb0,
        B, N_BATCHES, t, None, localize_ctx,
    )
    from lirec_tpu.evaluation.packed import loc_apply_data, loc_device_tree

    data_host = loc_apply_data(data_host, loc)
    data = {k: jnp.asarray(v) for k, v in data_host.items()}
    loc_dev = loc_device_tree(loc)

    sweep_t0 = time.time()
    sweep_c = aot_cache.cached_compile(
        sweep, params, tables, emb0, data, loc_dev,
        jnp.int32(2), label="bench_e2e_sweep",
    )
    sweep_compile_s = time.time() - sweep_t0

    def run(n):
        """One complete eval of n batches; returns (seconds, metric dict)."""
        t0 = time.time()
        emb = embed_c(params, tables)
        carry = sweep_c(params, tables, emb, data, loc_dev, jnp.int32(n))
        out = finish_from_carry(carry, t, NR, 0, "test", False)
        return time.time() - t0, out

    log("compiling e2e sweep (%s)..." % jax.default_backend())
    t0 = time.time()
    run(2)
    # the cold cost this process actually paid for device programs, SPLIT
    # (VERDICT r4 item 4: a 98-s "hit" must be attributable): the
    # cached_compile spans (lower + deserialize on a hit, lower + remote
    # compile on a miss) vs the first execution (the axon service's
    # load/first-exec stall, which shares the hourly variance either way)
    first_exec_s = time.time() - t0
    load_s = embed_compile_s + sweep_compile_s
    compile_s = load_s + first_exec_s
    from lirec_tpu.ops import dispatch as _dispatch

    aot_d = _dispatch.last_dispatch("aot_cache")
    log(
        "compile+first run: %.1fs = load %.1fs + first-exec %.1fs (aot: %s)"
        % (compile_s, load_s, first_exec_s,
           aot_d and "%s/%s" % (aot_d["path"], aot_d["reason"]))
    )

    per_batch = []
    base_short = max(N_BATCHES // 4, 4)
    for rep in range(3):
        n_short, n_long = base_short + 2 * rep + 1, N_BATCHES - 2 * rep
        t_short, _ = run(n_short)
        t_long, out = run(n_long)
        per_batch.append((t_long - t_short) / (n_long - n_short))
        log(
            "e2e rep %d: %d batches %.3fs, %d batches %.3fs -> %.2f ms/batch"
            % (rep, n_short, t_short, n_long, t_long, per_batch[-1] * 1000)
        )
    per = sorted(per_batch)[len(per_batch) // 2]
    clips_per_sec = B / per
    log(
        "jax e2e eval: %.2f ms/batch at B=%d -> %.1f clips/sec "
        "(metric dict keys: %s)"
        % (per * 1000, B, clips_per_sec, sorted(out))
    )
    return {
        "clips_per_sec": clips_per_sec,
        "per_batch_ms": [round(p * 1000, 3) for p in per_batch],
        "spread_ms": round(
            (max(per_batch) - min(per_batch)) * 1000, 3
        ),
        "compile_s": round(compile_s, 1),
        "deserialize_s": round(load_s, 1),
        "first_exec_s": round(first_exec_s, 1),
        "aot": aot_d and {"path": aot_d["path"], "reason": aot_d["reason"]},
    }


# ------------------------------------------------- on-chip parity gate


def parity_gate(batch_size: int = 64, n_batches: int = 8) -> str:
    """Counter parity on the REAL device: one f32 packed metric sweep
    (counters in the carry, fused kernel on) vs the host-loop oracle
    counting the SAME fetched logits in numpy (runner.evaluate's path).
    Identical forward outputs feed both counters, so any mismatch is a
    genuine device-metric bug — not a matmul-precision tie-flip. A wrong
    counter fails the whole bench (exit 1), so a fast-but-broken
    regression can never ship a BENCH_r JSON. Match: ref mlp/test.py
    :138-145 — the metric dict is the product's contract.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lirec_tpu import config as config_lib
    from lirec_tpu.evaluation.device_metrics import grounding_predictions
    from lirec_tpu.evaluation.metrics import MetricAccumulator
    from lirec_tpu.evaluation.packed import device_sweep_builder
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.models.tabular import embed_all
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    C, NR = 101, 15
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, C, n_rels=NR)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, 512, 1024, seed=11)
    )
    B = batch_size
    data = make_batch(bundle.spec, B * n_batches, 512, 1024, seed=13)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    t = cfg.tasks
    params = jax.device_put(bundle.params)
    embedded = jax.jit(lambda p, tb: embed_all(p, bundle.spec, tb))(
        params, tables
    )
    init_carry, step = device_sweep_builder(bundle, t, C, NR, 0)

    apply_jit = jax.jit(
        lambda p, mb, tb, emb: bundle.apply(p, mb, tables=tb, embedded=emb)
    )
    preds_jit = jax.jit(grounding_predictions)
    prec = MetricAccumulator(n_rels=NR)
    carry = init_carry()
    for i in range(n_batches):
        b = {k: v[i * B : (i + 1) * B] for k, v in data.items()}
        carry = jax.jit(step)(params, tables, embedded, carry, b)
        out = apply_jit(
            params, {k: b[k] for k in ("feat_idx", "rels_mask")},
            tables, embedded,
        )
        preds = preds_jit(
            out["inters"], b["mem_mask"], b["labels"],
            pr_probs_rels=out["rels"], gt_rels=b["rels_label"],
        )
        preds = {k: np.asarray(v) for k, v in preds.items()}
        ridx = np.nonzero(np.asarray(b["rels_label"])[:, 0] - NR + 1)[0]
        prec.update_from_predictions(
            preds,
            gt_classes=np.asarray(b["labels"]),
            gt_tracks=np.asarray(b["gt_tracks"]),
            just_zeros=np.asarray(b["just_zeros"]),
            gt_rels=np.asarray(b["rels_label"]),
            rels_sample_idx=ridx,
        )
    carry = jax.tree.map(np.asarray, carry)
    oracle = {
        "total": prec.total, "total_cl": prec.total_cl,
        "total_rels": prec.total_rels, "top1": prec._top1,
        "cls_top1": prec._cls_top1, "trks_top1": prec._trks_top1,
        "rels_top1": prec._rels_top1,
    }
    bad = {
        key: (int(carry[key]), int(val))
        for key, val in oracle.items()
        if int(carry[key]) != int(val)
    }
    if bad:
        log("PARITY FAIL (device sweep vs host oracle): %r" % bad)
        return "fail"
    log(
        "parity ok on %s: %d samples, counters %s"
        % (
            __import__("jax").default_backend(),
            int(carry["total_cl"]),
            {k: int(v) for k, v in oracle.items()},
        )
    )
    return "ok"


# ------------------------------------------------------- baseline (torch CPU)


def measure_torch_baseline(batch_size: int = 8, iters: int = 10):
    """Reference-equivalent eval compute on torch CPU: dense float64 batch,
    per-modality 2-layer MLPs over [B*20, 19, 6912] slices, masked-mean
    context, gate, heads, margin loss (architecture per ref mlp/model.py).

    Compute-only on purpose (no dataloader): the reference's end-to-end rate
    is below this number, so it is the conservative baseline. Per-iteration
    times are recorded so the JSON carries the variance.
    """
    import numpy as np
    import torch

    TEXT, VIS, J = 768, 2048, 512
    MLP = TEXT + VIS + 2 * VIS
    C, R = 101, 15
    T, CTX = 20, 18

    class Branch(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.txt1, self.txt2 = torch.nn.Linear(TEXT, J), torch.nn.Linear(J, J)
            self.vis1, self.vis2 = torch.nn.Linear(VIS, J), torch.nn.Linear(J, J)
            self.ta1, self.ta2 = torch.nn.Linear(VIS, J), torch.nn.Linear(J, J // 2)
            self.tb1, self.tb2 = torch.nn.Linear(VIS, J), torch.nn.Linear(J, J // 2)

        def forward(self, x):
            t = self.txt2(torch.relu(self.txt1(x[..., :TEXT])))
            v = self.vis2(torch.relu(self.vis1(x[..., TEXT:TEXT + VIS])))
            a = self.ta2(torch.relu(self.ta1(x[..., TEXT + VIS:TEXT + 2 * VIS])))
            b = self.tb2(torch.relu(self.tb1(x[..., TEXT + 2 * VIS:])))
            return torch.cat([t, v, a, b], dim=-1)

    class RefLike(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ints = Branch()
            self.ctx = Branch()
            self.gate = torch.nn.Linear(6 * J, 6 * J)
            self.out_ints = torch.nn.Linear(6 * J, C)
            self.out_ctx = torch.nn.Linear(3 * J, R)

        def forward(self, feats, rels_mask):
            B = feats.shape[0]
            flat = feats.reshape(B * T, CTX + 1, MLP).float()
            ints = torch.tanh(self.ints(flat[:, 0]))
            mask = rels_mask.reshape(B * T, CTX, 1).float()
            div = mask.sum(1).clamp(min=1.0)
            ctx = torch.tanh((self.ctx(flat[:, 1:]) * mask).sum(1) / div)
            fused = torch.relu(self.gate(torch.cat([ctx, ints], dim=-1)))
            return (
                self.out_ints(fused).reshape(B, T, C),
                self.out_ctx(ctx).reshape(B, T, R),
            )

    model = RefLike().eval()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((batch_size, T, CTX + 1, MLP))  # float64,
    # as produced by the reference loader (numpy default dtype)
    rels_mask = (rng.random((batch_size, T, CTX)) < 0.4).astype(np.int64)
    labels = torch.tensor(rng.integers(0, C, batch_size))
    tfeats = torch.tensor(feats)
    tmask = torch.tensor(rels_mask)

    def margin_losses(ints, rels):
        s_i, s_r = torch.sigmoid(ints), torch.sigmoid(rels)
        pos = s_i[torch.arange(batch_size), 0, labels]
        neg = s_i.reshape(batch_size, -1)
        li = torch.relu(0.101 - pos[:, None] + neg).sum(1).mean()
        lr = torch.relu(0.101 - pos[:, None] + s_r.reshape(batch_size, -1)).sum(1).mean()
        return li + lr

    per_iter = []
    with torch.no_grad():
        margin_losses(*model(tfeats, tmask))  # warmup
        for _ in range(iters):
            t0 = time.time()
            margin_losses(*model(tfeats, tmask))
            per_iter.append(time.time() - t0)
    dt = float(np.sum(per_iter))
    clips_per_sec = batch_size * iters / dt
    stats = {
        "clips_per_sec": clips_per_sec,
        "iters": iters,
        "batch": batch_size,
        "mean_s": float(np.mean(per_iter)),
        "std_s": float(np.std(per_iter)),
    }
    log(
        "torch-cpu baseline: %d iters x B=%d, %.3fs +/- %.3fs/iter "
        "-> %.2f clips/sec"
        % (iters, batch_size, stats["mean_s"], stats["std_s"], clips_per_sec)
    )
    return stats


BASELINE_FILE = os.path.join(os.path.dirname(__file__), "baseline_torch.json")


def main():
    from lirec_tpu.cli.common import _enable_compilation_cache

    _enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument(
        "--mesh", default=None, metavar="DxM",
        help="multi-chip readiness mode (VERDICT r4 item 6): run the SPMD "
             "packed eval + train sweeps on a DxM (data x model) mesh of "
             "whatever devices exist, check counter parity vs single-"
             "device, and measure XLA's inserted collective bytes/step vs "
             "the documented expectation (tools/bench_mesh.py)")
    ap.add_argument("--mesh-out", default=None,
                    help="also write the full mesh-bench JSON artifact here")
    args, extra = ap.parse_known_args()

    if args.mesh:
        from tools import bench_mesh

        sys.argv = [sys.argv[0], "--mesh", args.mesh,
                    "--batch", str(args.batch),
                    "--compute-dtype", args.compute_dtype] + (
            ["--out", args.mesh_out] if args.mesh_out else []) + extra
        bench_mesh.main()
        return
    if extra:
        ap.error("unrecognized arguments: %s" % " ".join(extra))

    if args.measure_baseline or not os.path.exists(BASELINE_FILE):
        stats = measure_torch_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"torch_cpu_clips_per_sec": stats["clips_per_sec"],
                 "stats": stats,
                 "note": "reference-equivalent dense eval compute, CPU; "
                         "compute-only on both sides (the reference's "
                         "end-to-end rate is below this)"}, f,
            )
    with open(BASELINE_FILE) as f:
        base = json.load(f)["torch_cpu_clips_per_sec"]

    e2e_stats = bench_e2e_eval(args.batch, args.compute_dtype)
    e2e = e2e_stats["clips_per_sec"]
    device_only = bench_jax(args.batch, args.iters, args.warmup,
                            args.compute_dtype)

    # train-step headline: the full fwd+loss+bwd+Adam step, slope-timed;
    # the published number is the MEDIAN of the session's positive-slope
    # reps, with the spread alongside (never the best rep — the r2 "Adam
    # 1.8 ms" retraction, BENCH.md)
    from tools.bench_train import measure_modes

    train = measure_modes(
        ["full"], batch=args.batch, iters=150, reps=5,
        compute_dtype=args.compute_dtype, detailed=True,
    )["full"]
    train_ms = train["ms"]
    log("train step: %.2f ms -> %.0f clips/sec" %
        (train_ms, args.batch / (train_ms / 1000)))

    parity = parity_gate(args.batch)

    print(
        json.dumps(
            {
                "metric": "int_rel_ch end-to-end eval throughput "
                          "(packed dataset -> metric dict)",
                "value": round(e2e, 2),
                "unit": "clips/sec",
                "vs_baseline": round(e2e / base, 2),
                "e2e_per_batch_ms": e2e_stats["per_batch_ms"],
                "e2e_spread_ms": e2e_stats["spread_ms"],
                # operational latency is part of the product: the driver
                # tracks compile-time regressions through this field
                # (r3's went unreported; axon-tunnel remote compiles vary
                # 144-870s run to run — see BENCH.md "cold compile")
                "compile_s_e2e": e2e_stats["compile_s"],
                # the split makes a slow "hit" attributable: deserialize_s
                # is lower + cache load (a regression here is OUR bug),
                # first_exec_s is the axon service's load/first-exec stall
                # (hourly variance, not a cache regression)
                "deserialize_s_e2e": e2e_stats.get("deserialize_s"),
                "first_exec_s_e2e": e2e_stats.get("first_exec_s"),
                "aot_e2e": e2e_stats.get("aot"),
                "device_only_fwd_loss_clips_per_sec": round(device_only, 2),
                "train_ms_per_step": round(train_ms, 3),
                "train_ms_per_step_median": round(train_ms, 3),
                "train_ms_reps": train["reps_ms"],
                "train_ms_spread": train["spread_ms"],
                "train_compile_s": train["compile_s"],
                "train_clips_per_sec": round(args.batch / (train_ms / 1000), 1),
                "parity": parity,
                "baseline_method": "torch-CPU reference-equivalent compute, "
                                   "compute-only both sides, >=10 iters "
                                   "(baseline_torch.json)",
            }
        )
    )
    if parity != "ok":
        sys.exit(1)


if __name__ == "__main__":
    main()
