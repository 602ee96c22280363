#!/usr/bin/env python
"""One-command multi-chip readiness bench (`bench.py --mesh DxM`).

Runs the SPMD packed eval sweep + the SPMD train sweep on whatever devices
exist — today the 8 virtual CPU devices, someday real chips — and reports:

- per-device eval throughput + scaling efficiency vs a same-session
  single-device run of the identical program,
- exact counter parity between the SPMD sweep and the single-device sweep
  (the same oracle discipline as bench.py's parity gate),
- the collective traffic XLA actually inserted per step
  (parallel/collectives.py: op kinds + payload bytes from the optimized
  HLO) against the documented expectation — eval steps should psum only
  counter deltas (~carry bytes); train steps should psum one gradient
  pytree (~param bytes) plus TP boundary activations.

The day real multi-chip hardware appears, the scaling measurement is
`python bench.py --mesh 4x2` — nothing to improvise. On the virtual CPU
mesh the absolute times are meaningless (documented in the artifact);
the counters, collectives, and program shapes are exactly what will run
on hardware.

Distributed layer is introduced by the rebuild (no reference counterpart;
SURVEY.md §5.8) — the expectations here are the rebuild's own contract.
"""

from __future__ import annotations

import functools
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def parse_mesh(s: str):
    parts = s.lower().split("x")
    if len(parts) != 2:
        raise SystemExit("--mesh wants DxM (e.g. 4x2), got %r" % s)
    return int(parts[0]), int(parts[1])


def run(mesh_shape, batch: int = 64, n_batches: int = 32,
        compute_dtype: str = "bfloat16", n_clips: int = 2048,
        n_tracks: int = 4096, dims=None, out_path=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lirec_tpu import config as config_lib
    from lirec_tpu.evaluation.packed import device_sweep_builder
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.models.tabular import embed_all
    from lirec_tpu.parallel import collectives
    from lirec_tpu.parallel.mesh import (
        make_mesh, param_shardings, shard_tree, table_shardings,
    )
    from lirec_tpu.train.optim import make_optimizer
    from lirec_tpu.utils.fake_batch import make_structured_batch, make_tables

    data_ax, model_ax = mesh_shape
    n_dev = data_ax * model_ax
    if len(jax.devices()) < n_dev:
        raise SystemExit(
            "--mesh %dx%d wants %d devices, jax sees %d"
            % (data_ax, model_ax, n_dev, len(jax.devices()))
        )
    mesh = make_mesh(shape=mesh_shape, devices=jax.devices()[:n_dev])
    backend = jax.default_backend()
    log("mesh bench: %dx%d (data x model) on %s" % (
        data_ax, model_ax, backend))

    C, NR = 101, 15
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype=compute_dtype)
    if dims:
        cfg = cfg.with_dims(**dims)
    bundle = create_model(cfg, C, n_rels=NR)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, n_clips, n_tracks)
    )
    B = batch
    assert B % data_ax == 0, (
        "batch %d must be a multiple of the data axis %d" % (B, data_ax))
    data_host = make_structured_batch(
        bundle.spec, B * n_batches, n_clips, n_tracks, seed=7
    )
    t = cfg.tasks
    init_carry, step = device_sweep_builder(bundle, t, C, NR, 0)
    # the SPMD program must mirror production (evaluate_packed passes
    # data_mesh so the fused pallas kernel — no GSPMD rule — runs
    # per-device via shard_map); without it a real-TPU mesh run would
    # dispatch the kernel inside GSPMD and replicate the batch
    _, step_spmd = device_sweep_builder(bundle, t, C, NR, 0,
                                        data_mesh=mesh)

    params = jax.device_put(bundle.params)
    embedded = jax.jit(lambda p, tb: embed_all(p, bundle.spec, tb))(
        params, tables
    )

    # ---- single-device oracle + same-session single-device timing
    data_dev = {k: jnp.asarray(v) for k, v in data_host.items()}

    @jax.jit
    def sweep_single(params, tables, embedded, data, n):
        def body(i, carry):
            b = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i * B, B), data
            )
            return step(params, tables, embedded, carry, b)

        return jax.lax.fori_loop(0, n, body, init_carry())

    def timed(fn, *args):
        def call(n):
            t0 = time.time()
            out = fn(*args, jnp.int32(n))
            jax.tree.map(
                lambda x: x.block_until_ready(), jax.tree.leaves(out)[0]
            )
            # force a host fetch: block_until_ready through a tunnel can lie
            np.asarray(jax.tree.leaves(out)[0])
            return time.time() - t0, out

        per = []
        out = None
        for rep in range(3):
            # distinct trip counts per timed call (chip-timing discipline:
            # identical args can read ~0 through the tunnel, BENCH.md)
            n_l = n_batches - rep
            n_s = max(n_l // 2 - rep, 1)
            ts, _ = call(n_s)
            tl, out = call(n_l)
            per.append((tl - ts) / max(n_l - n_s, 1))
        return sorted(per)[len(per) // 2], per, out

    t0 = time.time()
    sweep_single(params, tables, embedded, data_dev, jnp.int32(2))
    log("single-device eval sweep compiled in %.1fs" % (time.time() - t0))
    single_per, single_reps, single_carry = timed(
        sweep_single, params, tables, embedded, data_dev
    )
    single_cps = B / single_per if single_per > 0 else float("nan")
    log("single-device eval: %.3f ms/batch -> %.1f clips/sec"
        % (single_per * 1000, single_cps))

    # ---- SPMD eval sweep: [n_batches, B, ...], B over 'data'; params,
    # tables, embedded replicated (evaluate_packed's exact layout)
    def shard_batched(v):
        v = np.asarray(v)
        b = v[: n_batches * B].reshape((n_batches, B) + v.shape[1:])
        return jax.device_put(
            b, NamedSharding(mesh, P(None, "data", *([None] * (v.ndim - 1))))
        )

    data_sh = {k: shard_batched(v) for k, v in data_host.items()}
    repl = NamedSharding(mesh, P())
    params_r = jax.device_put(params, jax.tree.map(lambda _: repl, params))
    tables_r = jax.device_put(tables, {k: repl for k in tables})
    embedded_r = jax.device_put(
        embedded, jax.tree.map(lambda _: repl, embedded)
    )

    @jax.jit
    def sweep_spmd(params, tables, embedded, data, n):
        def body(i, carry):
            return step_spmd(
                params, tables, embedded, carry,
                jax.tree.map(lambda a: a[i], data),
            )

        return jax.lax.fori_loop(0, n, body, init_carry())

    t0 = time.time()
    sweep_spmd(params_r, tables_r, embedded_r, data_sh, jnp.int32(2))
    eval_compile_s = time.time() - t0
    log("SPMD eval sweep compiled in %.1fs" % eval_compile_s)
    mesh_per, mesh_reps, mesh_carry = timed(
        sweep_spmd, params_r, tables_r, embedded_r, data_sh
    )
    mesh_cps = B / mesh_per if mesh_per > 0 else float("nan")
    scaling = mesh_cps / (single_cps * n_dev) if single_cps else None
    log("SPMD eval: %.3f ms/batch -> %.1f clips/sec "
        "(%.1f per device; scaling efficiency %.2f)"
        % (mesh_per * 1000, mesh_cps, mesh_cps / n_dev, scaling or -1))

    # counters: SPMD must equal single-device exactly (integer counts)
    a = jax.tree.map(np.asarray, single_carry)
    b = jax.tree.map(np.asarray, mesh_carry)
    counter_diffs = {
        k: (int(np.asarray(a[k]).sum()), int(np.asarray(b[k]).sum()))
        for k in a
        if np.issubdtype(np.asarray(a[k]).dtype, np.integer)
        and not np.array_equal(a[k], b[k])
    }
    counters_match = not counter_diffs
    log("counters match: %s%s" % (
        counters_match, "" if counters_match else " DIFFS %r" % counter_diffs))

    # ---- collective traffic of ONE eval step (the sweep body), measured
    # from the optimized HLO vs the documented expectation
    batch0 = {k: v[0] for k, v in data_sh.items()}
    eval_step_c = jax.jit(step_spmd).lower(
        params_r, tables_r, embedded_r,
        jax.device_put(init_carry(), repl), batch0,
    ).compile()
    eval_coll = collectives.collective_summary(eval_step_c)
    eval_expect = collectives.expected_eval_bytes(init_carry())
    log("eval step collectives: %d ops, %.2f KB/step (expect <= %.2f KB "
        "counter deltas%s)" % (
            eval_coll["n_collectives"], eval_coll["total_bytes"] / 1024,
            eval_expect["carry_bytes"] / 1024,
            " + TP boundaries" if model_ax > 1 else ""))

    # ---- SPMD train: per-batch step for collectives, traced-n sweep for
    # timing (same update math as train/loop.make_epoch_sweep)
    from lirec_tpu.train.loop import MODEL_KEYS, make_train_step

    tx = make_optimizer(cfg.optim.lr, cfg.optim.weight_decay)
    sh_params = shard_tree(
        bundle.params,
        param_shardings(bundle.params, mesh, gates=bundle.spec.gates),
    )
    sh_tables = shard_tree(
        jax.tree.map(np.asarray, tables), table_shardings(tables, mesh)
    )
    opt_state = jax.jit(tx.init)(sh_params)
    tbatch = {
        k: jax.device_put(
            np.asarray(v)[:B],
            NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1)))),
        )
        for k, v in data_host.items()
    }
    tstep = make_train_step(bundle, tx, mesh=mesh)
    train_step_c = tstep.lower(
        sh_params, opt_state, tbatch, sh_tables, jax.random.PRNGKey(0),
        tr_sum_max_flag=True,
    ).compile()
    train_coll = collectives.collective_summary(train_step_c)
    train_expect = collectives.expected_train_bytes(bundle.params, mesh)
    log("train step collectives: %d ops, %.1f MB/step (expect ~%.1f MB "
        "grad psum%s)" % (
            train_coll["n_collectives"], train_coll["total_bytes"] / 2**20,
            train_expect["param_bytes"] / 2**20,
            " + TP boundaries" if model_ax > 1 else ""))

    # timing sweep: 4 distinct batches cycled, params/opt in the carry
    stacked = {
        k: jax.device_put(
            np.asarray(v)[: 4 * B].reshape((4, B) + np.shape(v)[1:]),
            NamedSharding(
                mesh, P(None, "data", *([None] * (np.ndim(v) - 1)))
            ),
        )
        for k, v in data_host.items()
    }

    @jax.jit
    def train_sweep(params, opt_state, stacked, tables, n):
        def body(i, carry):
            params, opt_state, acc = carry
            batch = jax.tree.map(lambda v: v[i % 4], stacked)
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
            rng_drop, rng_loss = jax.random.split(rng)
            model_batch = {k: batch[k] for k in MODEL_KEYS if k in batch}

            def loss_fn(p):
                out = bundle.apply(
                    p, model_batch, tables=tables, deterministic=False,
                    rng=rng_drop, data_mesh=mesh,
                )
                return bundle.loss(out, batch, rng=rng_loss,
                                   tr_sum_max_flag=True)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            import optax

            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, acc + loss

        return jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0))
        )

    t0 = time.time()
    train_sweep(sh_params, opt_state, stacked, sh_tables, jnp.int32(2))
    train_compile_s = time.time() - t0
    log("SPMD train sweep compiled in %.1fs" % train_compile_s)
    tper = []
    for rep in range(3):
        n_s, n_l = 3 + 2 * rep, 15 + 2 * rep
        t0 = time.time()
        out = train_sweep(sh_params, opt_state, stacked, sh_tables,
                          jnp.int32(n_s))
        float(out[2])
        ts = time.time() - t0
        t0 = time.time()
        out = train_sweep(sh_params, opt_state, stacked, sh_tables,
                          jnp.int32(n_l))
        loss = float(out[2])
        tl = time.time() - t0
        tper.append((tl - ts) / (n_l - n_s))
        assert np.isfinite(loss), loss
    train_per = sorted(tper)[len(tper) // 2]
    log("SPMD train: %.3f ms/step (B=%d global)" % (train_per * 1000, B))

    result = {
        "mesh": {"data": data_ax, "model": model_ax},
        "backend": backend,
        "n_devices": n_dev,
        "batch_global": B,
        "compute_dtype": compute_dtype,
        "timings_meaningful": backend not in ("cpu",),
        "eval": {
            "clips_per_sec": round(mesh_cps, 1),
            "clips_per_sec_per_device": round(mesh_cps / n_dev, 1),
            "per_batch_ms": round(mesh_per * 1000, 3),
            "reps_ms": [round(p * 1000, 3) for p in mesh_reps],
            "single_device_clips_per_sec": round(single_cps, 1),
            "scaling_efficiency": round(scaling, 3) if scaling else None,
            "counters_match": counters_match,
            "counter_diffs": counter_diffs,
            "collectives_per_step": eval_coll,
            "expectation": eval_expect,
            "compile_s": round(eval_compile_s, 1),
        },
        "train": {
            "ms_per_step": round(train_per * 1000, 3),
            "reps_ms": [round(p * 1000, 3) for p in tper],
            "collectives_per_step": train_coll,
            "expectation": train_expect,
            "compile_s": round(train_compile_s, 1),
        },
        "note": (
            "virtual-CPU-mesh timings are NOT hardware numbers; counters, "
            "collectives and program shapes are what will run on chips"
            if backend == "cpu" else "real-device mesh run"
        ),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        log("wrote %s" % out_path)
    return result


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="4x2")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=32)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--n-clips", type=int, default=2048)
    ap.add_argument("--n-tracks", type=int, default=4096)
    ap.add_argument("--out", default=None)
    ap.add_argument("--small", action="store_true",
                    help="tiny dims for CPU smoke runs")
    args = ap.parse_args()
    dims = (
        {"text_dim": 32, "visual_dim": 64, "joint_dim": 128}
        if args.small else None
    )
    if args.small:
        args.n_clips, args.n_tracks = 256, 512
    result = run(
        parse_mesh(args.mesh), batch=args.batch, n_batches=args.n_batches,
        compute_dtype=args.compute_dtype, n_clips=args.n_clips,
        n_tracks=args.n_tracks, dims=dims, out_path=args.out,
    )
    print(json.dumps({
        "metric": "meshed e2e eval throughput (%dx%d %s)" % (
            result["mesh"]["data"], result["mesh"]["model"],
            result["backend"]),
        "value": result["eval"]["clips_per_sec"],
        "unit": "clips/sec",
        "vs_baseline": result["eval"]["scaling_efficiency"],
        "counters_match": result["eval"]["counters_match"],
        "eval_collective_bytes_per_step":
            result["eval"]["collectives_per_step"]["total_bytes"],
        "train_collective_bytes_per_step":
            result["train"]["collectives_per_step"]["total_bytes"],
        "train_expected_grad_psum_bytes":
            result["train"]["expectation"]["param_bytes"],
    }))


if __name__ == "__main__":
    main()
