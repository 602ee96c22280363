#!/usr/bin/env python
"""Train-step roofline ablations on the real chip (slope-timed).

Each mode times a fori_loop sweep whose carry holds (params, opt_state,
fold) so steps chain like real training; per-step time is the slope
between two sweep lengths (BENCH.md methodology — host timing through the
tunnel lies, slopes don't).

Modes:
  full        fwd + loss + bwd + optax torch-Adam chain (the r2 default)
  fused-adam  fwd + loss + bwd + single-expression fused Adam update
  sgd         fwd + loss + bwd + p -= lr*g (isolates optimizer cost)
  no-opt      fwd + loss + bwd, grads folded into the carry (no update)
  fwd         fwd + loss only
  no-dropout  full but deterministic=True (isolates dropout cost)
  adam-only   optimizer update alone on frozen grads

Usage: python tools/bench_train.py [--modes full,sgd,...] [--batch 64]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_modes(modes, batch: int = 64, iters: int = 120, reps: int = 5,
                  compute_dtype: str = "bfloat16",
                  strict_prng: bool = False, detailed: bool = False):
    """Slope-time the requested modes; returns {mode: ms_per_step}, the
    ms being the MEDIAN over positive slope reps (never the best rep —
    the r2 "Adam 1.8 ms" retraction came from a best-case readout).
    With ``detailed``, returns {mode: {"ms", "reps_ms", "spread_ms",
    "compile_s"}} so callers can publish the spread.

    Importable (bench.py uses it for the train_ms_per_step headline)."""
    import jax
    import jax.numpy as jnp

    from lirec_tpu import config as config_lib
    from lirec_tpu.cli.common import _enable_compilation_cache
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train import optim as optim_lib
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    _enable_compilation_cache()
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(
        compute_dtype=compute_dtype, fast_prng=not strict_prng
    )
    bundle = create_model(cfg, 101, n_rels=15)
    n_clips, n_tracks = 2048, 4096
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, n_clips, n_tracks)
    )
    B = batch
    batches = [
        make_batch(bundle.spec, B, n_clips, n_tracks, seed=s)
        for s in range(4)
    ]
    stacked = {
        k: jnp.stack([jnp.asarray(b[k]) for b in batches])
        for k in batches[0]
    }
    base_rng = (
        jax.random.PRNGKey(0) if strict_prng
        else jax.random.key(0, impl="rbg")
    )
    o = cfg.optim
    MODEL_KEYS = ("feat_idx", "rels_mask")

    def loss_of(params, batch, rng, deterministic=False, tables=tables):
        # `tables` is threaded as a sweep ARGUMENT (production parity:
        # train/loop passes tables through jit too) — capturing it would
        # bake ~170 MB of constants into the executable, which the AOT
        # cache would then ship through the tunnel at every reload
        model_batch = {k: batch[k] for k in MODEL_KEYS if k in batch}
        # always the hybrid TRAIN forward (use_tabular=False): the tabular
        # eval path (pallas kernel) has no JVP rule and deterministic=True
        # would otherwise dispatch to it
        out = bundle.apply(
            params, model_batch, tables=tables,
            deterministic=deterministic, rng=rng, use_tabular=False,
        )
        return bundle.loss(out, batch, rng=jax.random.fold_in(rng, 7))

    results = {}
    for mode in modes:
        mode = mode.strip()
        deterministic = mode == "no-dropout"
        if mode in ("full", "no-dropout"):
            tx = optim_lib.make_optimizer(o.lr, o.weight_decay)
        elif mode in ("fused-adam", "adam-only"):
            tx = optim_lib.make_fused_adam(o.lr, o.weight_decay)
        else:
            tx = None

        # n is TRACED: every sweep length reuses one compiled program
        # (and distinct lengths defeat execution memoization)
        @functools.partial(jax.jit, static_argnames=("mode",))
        def sweep(params, opt_state, stacked, tbl, n, mode=mode,
                  deterministic=deterministic, tx=tx):
            def body(i, carry):
                params, opt_state, fold = carry
                batch = jax.tree.map(lambda a: a[i % 4], stacked)
                rng = jax.random.fold_in(base_rng, i)
                if mode == "fwd":
                    loss = loss_of(params, batch, rng, deterministic, tbl)
                    return params, opt_state, fold + loss
                if mode == "adam-only":
                    # frozen synthetic grads: params scaled (keeps a data
                    # dependence on the carry so nothing is dead code)
                    grads = jax.tree.map(lambda p: p * 1e-9, params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = jax.tree.map(
                        lambda p, u: p + u, params, updates
                    )
                    return params, opt_state, fold
                loss, grads = jax.value_and_grad(loss_of)(
                    params, batch, rng, deterministic, tbl
                )
                if mode == "no-opt":
                    fold = fold + sum(
                        jnp.sum(g) for g in jax.tree.leaves(grads)
                    ) * 1e-9
                elif mode == "sgd":
                    params = jax.tree.map(
                        lambda p, g: p - o.lr * g.astype(p.dtype),
                        params, grads,
                    )
                else:
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = jax.tree.map(
                        lambda p, u: p + u, params, updates
                    )
                return params, opt_state, fold + loss
            return jax.lax.fori_loop(
                0, n, body, (params, opt_state, jnp.float32(0))
            )

        params = jax.device_put(bundle.params)
        opt_state = (
            jax.jit(tx.init)(params) if tx is not None else jnp.float32(0)
        )

        # AOT executable cache: repeated bench processes reload the sweep
        # binary instead of re-paying the remote compile (utils/aot_cache)
        from lirec_tpu.utils import aot_cache

        compile_t0 = time.time()
        sweep_c = aot_cache.cached_compile(
            sweep, params, opt_state, stacked, tables, jnp.int32(2),
            label="bench_train_%s" % mode, mode=mode,
        )

        def timed(n):
            t0 = time.time()
            out = sweep_c(params, opt_state, stacked, tables, jnp.int32(n))
            jax.tree.map(
                lambda a: getattr(a, "block_until_ready", lambda: a)(), out
            )
            float(out[2])
            return time.time() - t0

        timed(2)
        # cached_compile span + first executed sweep: what this process
        # actually paid (an AOT hit collapses it to the load time)
        compile_s = time.time() - compile_t0
        per = []
        short, long_ = 4, 4 + iters
        for rep in range(reps):
            ts = timed(short + 2 * rep + 1)
            tl = timed(long_ + 2 * rep)
            per.append((tl - ts) / (long_ - short - 1))
        # contended-chip robustness: a rep whose short sweep caught a
        # foreign burst produces a garbage (even negative) slope — median
        # over the positive slopes only
        ok = sorted(p for p in per if p > 0) or sorted(per)
        ms = ok[len(ok) // 2] * 1000
        if detailed:
            results[mode] = {
                "ms": ms,
                "reps_ms": [round(p * 1000, 3) for p in per],
                "spread_ms": round((ok[-1] - ok[0]) * 1000, 3),
                "compile_s": round(compile_s, 1),
            }
        else:
            results[mode] = ms
        log(
            "%-11s %7.3f ms/step  (%5.0f clips/s, compile %.1fs, "
            "reps %s)"
            % (mode, ms, B / (ms / 1000), compile_s,
               ["%.3f" % (p * 1000) for p in per])
        )

    log("-" * 60)
    for mode, ms in results.items():
        log("%-11s %7.3f ms"
            % (mode, ms["ms"] if isinstance(ms, dict) else ms))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--modes", default="full,fused-adam,sgd,no-opt,fwd,"
                                       "no-dropout,adam-only")
    ap.add_argument("--iters", type=int, default=120,
                    help="long-sweep step count; the shared chip's "
                         "run-to-run noise needs ~1s sweeps")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--strict-prng", action="store_true",
                    help="threefry dropout stream (the exact r1 bernoulli "
                         "path) instead of the rbg default")
    args = ap.parse_args()
    results = measure_modes(
        [m for m in args.modes.split(",")], batch=args.batch,
        iters=args.iters, reps=args.reps, compute_dtype=args.compute_dtype,
        strict_prng=args.strict_prng,
    )
    import json

    print(json.dumps({"batch": args.batch, "ms_per_step": results}))


if __name__ == "__main__":
    main()
