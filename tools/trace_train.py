#!/usr/bin/env python
"""Trace the REAL-SCALE train step and attribute device time to op
categories (VERDICT r4 item 5: give train the same roofline verdict eval
has).

Runs the per-batch train step (fwd+loss+bwd+Adam, localized structured
batches at real-split cardinality) under a jax.profiler trace, then joins
the device timeline against the compiled HLO: every timed op is mapped to
the jax op_name metadata of its fused computation, which carries the
``transpose(jvp(...))`` markers that separate backward from forward work.
Output: a per-category table (µs/step) plus the top individual ops.

Run (real chip): env PYTHONPATH="/root/repo:$PYTHONPATH" \
    python tools/trace_train.py [--steps 24] [--no-localize] [--raw]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# HLO text -> {instruction name: info} (fusion bodies inherit to the fusion)
# --------------------------------------------------------------------------

_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(\w[\w\-]*)\(")
_META_RE = re.compile(r'op_name="([^"]*)"')
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def parse_hlo(text: str):
    """Map every top-level instruction to (op kinds inside, op_names inside).

    Fused computations are parsed first; a `fusion(...)` instruction
    inherits the kinds/op_names of the computation it calls.
    """
    computations = {}  # comp name -> (set of op kinds, set of op_names)
    cur = None
    for line in text.splitlines():
        m = re.match(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*\(", line)
        if ("{" in line and ("fused_computation" in line or "ENTRY" in line
                             or re.match(r"^%?[\w.\-]+\s*\(", line.strip()))):
            mm = re.match(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
            if mm and "=" not in line.split("(")[0]:
                cur = mm.group(1)
                computations[cur] = (set(), set())
        im = _INSTR_RE.match(line)
        if im and cur is not None:
            name, kind = im.group(1), im.group(2)
            computations[cur][0].add(kind)
            for om in _META_RE.finditer(line):
                computations[cur][1].add(om.group(1))
    # second pass: map every instruction name -> info
    instrs = {}
    for line in text.splitlines():
        im = _INSTR_RE.match(line)
        if not im:
            continue
        name, kind = im.group(1), im.group(2)
        kinds, ops = {kind}, set(_META_RE.findall(line))
        if kind == "fusion":
            cm = _CALLS_RE.search(line)
            if cm and cm.group(1) in computations:
                k2, o2 = computations[cm.group(1)]
                kinds |= k2
                ops |= o2
        instrs[name] = (kinds, ops)
    return instrs


def classify(name: str, kinds, op_names):
    """Category for the per-step rollup."""
    joined = " ".join(sorted(op_names))
    bwd = "transpose(" in joined  # jax transpose rule marker
    if "custom-call" in kinds or name.startswith("custom-call"):
        if any("scatter_accum" in o or "gather_h1" in o for o in op_names):
            return "bwd:scatter-kernel(pallas)"
        return ("bwd:" if bwd else "fwd:") + "custom-call"
    if "scatter" in kinds:
        return "bwd:scatter(xla)"
    if "dot" in kinds or "convolution" in kinds:
        return ("bwd:" if bwd else "fwd:") + "gemm"
    if "gather" in kinds or "dynamic-slice" in kinds:
        return ("bwd:" if bwd else "fwd:") + "gather"
    if "dynamic-update-slice" in kinds:
        return ("bwd:" if bwd else "fwd:") + "dus"
    if "copy" in kinds or name.startswith("copy"):
        return "copy/layout"
    if "rng-bit-generator" in kinds:
        return "rng"
    if "all-reduce" in kinds or "all-gather" in kinds:
        return "collective"
    adamish = any(".update(" in o or "adam" in o.lower() for o in op_names)
    if adamish:
        return "optimizer"
    return ("bwd:" if bwd else "fwd:") + "elementwise"


# --------------------------------------------------------------------------
# trace json -> per-op device durations
# --------------------------------------------------------------------------

def load_device_events(trace_dir: str, raw: bool = False):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    ) or sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                  recursive=True)
    )
    if not files:
        raise SystemExit("no trace json under %s" % trace_dir)
    opener = gzip.open if files[-1].endswith(".gz") else open
    with opener(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = (
                ev.get("args", {}).get("name", "")
            )
    # the op-level lane: threads named "XLA Ops" under a device process
    # ("XLA Modules" holds the per-dispatch envelope, "Steps" the step
    # markers — keeping those would double-count everything)
    op_lanes = {
        key for key, name in tid_names.items() if "XLA Ops" in name
    }
    if raw:
        log("process names: %s" % json.dumps(
            {str(k): v for k, v in pid_names.items()}, indent=1))
        log("thread names: %s" % json.dumps(
            {str(k): v for k, v in tid_names.items()}, indent=1))
    out = []
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if op_lanes and (ev.get("pid"), ev.get("tid")) not in op_lanes:
            continue
        out.append(ev)
    if not out:  # fall back: keep everything with a duration
        out = [ev for ev in events if ev.get("ph") == "X" and "dur" in ev]
    return out, pid_names


# --------------------------------------------------------------------------
# the step under test
# --------------------------------------------------------------------------

def build_step(args):
    import jax
    import jax.numpy as jnp

    from lirec_tpu import config as config_lib
    from lirec_tpu.cli.common import _enable_compilation_cache
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train import optim as optim_lib
    from lirec_tpu.utils.fake_batch import make_structured_batch, make_tables

    _enable_compilation_cache()
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype=args.compute_dtype)
    bundle = create_model(cfg, 101, n_rels=15)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, args.n_clips, args.n_tracks)
    )
    batches = [
        make_structured_batch(
            bundle.spec, args.batch, args.n_clips, args.n_tracks, seed=s
        )
        for s in range(4)
    ]
    if not args.no_localize:
        from lirec_tpu.data.localize import Localizer

        loc = Localizer(bundle.spec, args.n_clips, args.n_tracks, force=True)
        batches = loc.maybe_localize(batches)
        log("localized: caps %d/%d" % (loc.cap_clip, loc.cap_track))
    batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    model_keys = tuple(
        k for k in ("feat_idx", "rels_mask", "uniq_clip", "uniq_track")
        if k in batches[0]
    )
    base_rng = jax.random.key(0, impl="rbg")
    o = cfg.optim
    tx = optim_lib.make_optimizer(o.lr, o.weight_decay)

    def step(params, opt_state, batch, tables, i):
        rng = jax.random.fold_in(base_rng, i)
        model_batch = {k: batch[k] for k in model_keys}

        def loss_fn(p):
            outp = bundle.apply(
                p, model_batch, tables=tables, deterministic=False,
                rng=rng, use_tabular=False,
            )
            return bundle.loss(outp, batch, rng=jax.random.fold_in(rng, 7))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    params = jax.device_put(bundle.params)
    opt_state = jax.jit(tx.init)(params)
    return step, params, opt_state, batches, tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-clips", type=int, default=12288)
    ap.add_argument("--n-tracks", type=int, default=24576)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--no-localize", action="store_true")
    ap.add_argument("--raw", action="store_true",
                    help="dump raw process/top-event info to adapt parsing")
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--top", type=int, default=28)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    step, params, opt_state, batches, tables = build_step(args)
    step_j = jax.jit(step)
    lowered = step_j.lower(
        params, opt_state, batches[0], tables, jnp.int32(0)
    )
    compiled = lowered.compile()
    hlo = compiled.as_text()
    instrs = parse_hlo(hlo)
    log("compiled; %d HLO instrs parsed" % len(instrs))

    # warm
    p, s = params, opt_state
    for i in range(4):
        p, s, l = step_j(p, s, batches[i % 4], tables, jnp.int32(i))
    float(l)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="lirec_trace_")
    t0 = time.time()
    jax.profiler.start_trace(trace_dir)
    for i in range(args.steps):
        p, s, l = step_j(p, s, batches[i % 4], tables, jnp.int32(100 + i))
    float(l)
    jax.profiler.stop_trace()
    log("traced %d steps in %.2fs -> %s"
        % (args.steps, time.time() - t0, trace_dir))

    events, pid_names = load_device_events(trace_dir, raw=args.raw)
    per_op = {}
    for ev in events:
        nm = ev["name"]
        per_op.setdefault(nm, [0.0, 0])
        per_op[nm][0] += ev["dur"]  # µs
        per_op[nm][1] += 1
    if args.raw:
        for nm, (dur, n) in sorted(
            per_op.items(), key=lambda kv: -kv[1][0]
        )[:40]:
            log("RAW %10.1fus x%-5d %s" % (dur, n, nm))

    cats = {}
    rows = []
    matched = 0.0
    total = 0.0
    unmatched = {}
    for nm, (dur, n) in per_op.items():
        base = nm.split(" ")[0].lstrip("%")
        info = instrs.get(base)
        if info is None:
            # trace names sometimes drop/alter the ".N" suffix
            stem = re.sub(r"\.\d+$", "", base)
            cands = [k for k in instrs if re.sub(r"\.\d+$", "", k) == stem]
            if len(cands) == 1:
                info = instrs[cands[0]]
            elif cands:
                # same stem, many instances: merge their kinds/op_names
                kinds, ops = set(), set()
                for k in cands:
                    kinds |= instrs[k][0]
                    ops |= instrs[k][1]
                info = (kinds, ops)
            else:
                unmatched[base] = dur
        total += dur
        if info is None:
            cat = "(untyped:%s)" % base.split(".")[0][:18]
        else:
            matched += dur
            cat = classify(base, *info)
        cats.setdefault(cat, 0.0)
        cats[cat] += dur
        rows.append((dur, n, base, cat,
                     sorted(info[1])[:2] if info else []))

    st = args.steps
    log("")
    log("== categories (µs/step, %d steps; HLO-matched %.0f%% of device "
        "time) ==" % (st, 100 * matched / max(total, 1)))
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        log("  %9.1f  %s" % (dur / st, cat))
    log("  %9.1f  TOTAL device" % (total / st))
    if unmatched:
        top_un = sorted(unmatched.items(), key=lambda kv: -kv[1])[:8]
        log("  unmatched event names (top): %s"
            % ", ".join("%s (%.0fus/step)" % (k, v / st)
                        for k, v in top_un))
        some = [k for k in instrs if "fusion" in k][:6]
        log("  sample HLO instr names: %s" % ", ".join(some))
    log("")
    log("== top ops (µs/step) ==")
    for dur, n, base, cat, ops in sorted(rows, reverse=True)[: args.top]:
        hint = ops[0] if ops else ""
        if len(hint) > 90:
            hint = "..." + hint[-87:]
        log("  %8.1f x%-4d %-28s %-26s %s"
            % (dur / st, n // st if st else n, base[:28], cat, hint))

    print(json.dumps({
        "steps": st,
        "total_us_per_step": round(total / st, 1),
        "categories_us_per_step": {
            k: round(v / st, 1) for k, v in cats.items()
        },
        "trace_dir": trace_dir,
    }))


if __name__ == "__main__":
    main()
