#!/usr/bin/env python
"""Host batch-assembly benchmark at real-data scale (VERDICT r3 item 1).

Generates a large synthetic split (default ~20k train samples — the scale
of the reference's real MovieGraphs train split, ref SURVEY.md §7), then
measures ms/sample for every assembly path over whole epochs, each
producing bitwise-identical batches:

  per-sample   the r1-r3 default: `__getitem__` + collate per batch
  workers=4    AssemblyPool (spawn) over the per-sample path
  plan+numpy   precompiled site programs, numpy draw executor
  plan+native  precompiled site programs, C++ engine (the r4 default)

Run: env PYTHONPATH=/root/repo python tools/bench_assembly.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_dataset(root: str, movies: int, scenes: int, extra_rel_p: float):
    from lirec_tpu import config as config_lib
    from lirec_tpu.data import synthetic
    from lirec_tpu.data.dataset import InteractionDataset

    if not os.path.exists(os.path.join(root, "others", "split.json")):
        t0 = time.time()
        spec = synthetic.SyntheticSpec(
            movies={
                "train": ["tt%07d" % i for i in range(movies)],
                "val": ["tt1454029"],
                "test": ["tt0120338"],
            },
            scenes=list(range(2, 2 + 2 * scenes, 2)),
            extra_rel_p=extra_rel_p,
        )
        synthetic.generate(root, spec)
        log("generate: %.1fs" % (time.time() - t0))
    cfg = synthetic.make_config(root)
    p = config_lib.preset("int_rel_ch", data_root=root)
    cfg = cfg.replace(tasks=p.tasks)
    t0 = time.time()
    ds = InteractionDataset(cfg, mode="train")
    ds.cache()
    ds.init_relships()
    log(
        "dataset: %.1fs, %d samples, %d clip rows, %d track rows"
        % (time.time() - t0, len(ds), ds.tables.n_clip_rows,
           ds.tables.n_track_rows)
    )
    return cfg, ds


def run_epochs(it, n_epochs: int) -> float:
    """Wall seconds to drain `n_epochs` epochs of batches."""
    t0 = time.time()
    for _ in range(n_epochs):
        for _b in it:
            pass
    return time.time() - t0


def run_one_path(args) -> None:
    """Measure ONE assembly path (invoked as a subprocess: the per-sample
    path creates millions of transient objects whose GC/heap residue slows
    every path measured after it in the same process by 5-10x)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lirec_tpu.data.pipeline import BatchIterator

    if args.path == "plan-numpy":
        os.environ["LIREC_TPU_NO_NATIVE"] = "1"
    if args.path in ("plan-numpy", "plan-native"):
        # keep these rows measuring the in-memory BUILD (r4-comparable);
        # the disk cache gets its own row below
        os.environ["LIREC_TPU_NO_PLAN_CACHE"] = "1"
    cfg, ds = build_dataset(
        args.root, args.movies, args.scenes, args.extra_rel_p
    )
    kw = {}
    if args.path == "per-sample":
        kw = dict(fast_assembly=False)
    elif args.path == "workers":
        kw = dict(fast_assembly=False, workers=args.workers)
    if args.path == "plan-cache":
        # cold build+save (untimed), then time what a SECOND process pays:
        # fingerprint + npz load + bitwise spot check (data/plan_cache.py)
        ds.assembly_plan()
        ds._assembly_plan = None
    t0 = time.time()
    plan = ds.assembly_plan() if args.path.startswith("plan") else None
    build_s = time.time() - t0
    if args.path == "plan-cache":
        from lirec_tpu.ops import dispatch

        d = dispatch.last_dispatch("assembly_plan_cache")
        assert d and d["reason"] == "hit+verified", d
    it = BatchIterator(ds, args.batch, shuffle=True, seed=3, **kw)
    run_epochs(it, 2)  # warm (pool spawn, program encode, GC settling)
    dt = run_epochs(it, args.epochs)
    it.close()
    us = dt / (args.epochs * len(ds)) * 1e6
    engine = plan.last_engine if plan is not None else "-"
    print(
        "RESULT %s %.2f %.2f %s %d"
        % (args.path, us, build_s, engine, len(ds))
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lirec_bench_assembly")
    ap.add_argument("--movies", type=int, default=5)
    ap.add_argument("--scenes", type=int, default=1250)
    ap.add_argument("--extra-rel-p", type=float, default=0.3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip the per-sample and worker-pool baselines")
    ap.add_argument("--path", help=argparse.SUPPRESS)  # subprocess mode
    args = ap.parse_args()

    if args.path:
        run_one_path(args)
        return

    # generate the dataset once so subprocesses only read it
    import jax

    jax.config.update("jax_platforms", "cpu")
    build_dataset(args.root, args.movies, args.scenes, args.extra_rel_p)

    import subprocess

    paths = ([] if args.skip_slow else ["per-sample", "workers"]) + [
        "plan-numpy", "plan-native", "plan-cache",
    ]
    rows = []
    for path in paths:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--path", path,
            "--root", args.root, "--movies", str(args.movies),
            "--scenes", str(args.scenes),
            "--extra-rel-p", str(args.extra_rel_p),
            "--batch", str(args.batch), "--epochs", str(args.epochs),
            "--workers", str(args.workers),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, check=True,
            env=dict(os.environ, PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                _, name, us, build_s, engine, n = line.split()
                rows.append((name, float(us), float(build_s), engine, int(n)))
                log(
                    "%-12s %8.1f us/sample (plan build %.1fs, engine %s)"
                    % (name, float(us), float(build_s), engine)
                )

    base = rows[0][1]
    n = rows[0][4]
    print("\n| path | us/sample | speedup | s/epoch (%d samples) |" % n)
    print("|---|---|---|---|")
    for name, us, build_s, engine, n in rows:
        print(
            "| %s | %.1f | %.1fx | %.2f |"
            % (name, us, base / us, us * n / 1e6)
        )
    native = [r for r in rows if r[0] == "plan-native"][0]
    print(
        "\nplan build (one-time): %.1fs; engine %s; B=%d"
        % (native[2], native[3], args.batch)
    )
    cached = [r for r in rows if r[0] == "plan-cache"]
    if cached:
        print(
            "plan disk-cache warm load (any later process): %.1fs"
            % cached[0][2]
        )


if __name__ == "__main__":
    main()
