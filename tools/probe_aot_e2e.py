#!/usr/bin/env python
"""Probe: AOT-serialize the REAL packed e2e eval sweep executable and
deserialize it in a fresh process — does that dodge the axon-remote
compile/load cost (144-1813 s cold, and ~warm-hit-equals-cold through
the jax persistent cache, BENCH.md "Cold compile")?

tools/probe_aot_cache.py established the mechanism on toy programs
(serialize/deserialize_and_load work on this backend; arg-parameterized
programs deserialize in ~0.2 s; constant-folded ones transfer their
baked weights at ~tunnel bandwidth). This probe answers the question for
the flagship program itself.

Run: env PYTHONPATH="/root/repo:$PYTHONPATH" python tools/probe_aot_e2e.py
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import time

BLOB = "/tmp/lirec_aot_e2e.bin"
B, N_BATCHES, N_CLIPS, N_TRACKS = 64, 168, 2048, 4096  # bench.py defaults


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build():
    """The exact jit program + args bench.bench_e2e_eval runs."""
    import jax
    import jax.numpy as jnp

    from lirec_tpu import config as config_lib
    from lirec_tpu.evaluation.packed import device_sweep_builder, inject_loc
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.models.tabular import embed_all
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    C, NR = 101, 15
    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype="bfloat16")
    bundle = create_model(cfg, C, n_rels=NR)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, N_CLIPS, N_TRACKS)
    )
    data_host = make_batch(
        bundle.spec, B * N_BATCHES, N_CLIPS, N_TRACKS, seed=7
    )
    t = cfg.tasks
    init_carry, step = device_sweep_builder(bundle, t, C, NR, 0)

    def sweep(params, tables, embedded, data, loc, n):
        def body(i, carry):
            batch = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i * B, B), data
            )
            batch = inject_loc(batch, loc, i)
            return step(params, tables, embedded, carry, batch)

        return jax.lax.fori_loop(0, n, body, init_carry())

    params = jax.device_put(bundle.params)
    emb = jax.jit(lambda p, tb: embed_all(p, bundle.spec, tb))(
        params, tables
    )
    data = {k: jnp.asarray(v) for k, v in data_host.items()}
    return sweep, (params, tables, emb, data, {}, jnp.int32(3))


def child():
    import jax
    from jax.experimental import serialize_executable

    t0 = time.time()
    _, args = build()
    jax.block_until_ready(args[0])
    log("CHILD arg rebuild %.1fs" % (time.time() - t0))
    with open(BLOB, "rb") as fh:
        p = pickle.load(fh)
    t0 = time.time()
    loaded = serialize_executable.deserialize_and_load(
        p["s"], p["it"], p["ot"]
    )
    print("CHILD deserialize %.2fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    carry = jax.block_until_ready(loaded(*args))
    print("CHILD first_run %.2fs" % (time.time() - t0), flush=True)
    total = jax.tree_util.tree_leaves(carry)[0]
    print("CHILD carry leaf %s" % (total,), flush=True)


def main():
    if "--child" in sys.argv:
        child()
        return
    import jax
    from jax.experimental import serialize_executable

    log("devices: %s" % jax.devices())
    sweep, args = build()
    t0 = time.time()
    lowered = jax.jit(sweep).lower(*args)
    log("lower %.1fs" % (time.time() - t0))
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    log("compile %.1fs" % compile_s)
    t0 = time.time()
    jax.block_until_ready(compiled(*args))
    log("first run %.2fs" % (time.time() - t0))

    t0 = time.time()
    s, it, ot = serialize_executable.serialize(compiled)
    log("serialize %.2fs, %.1f MB" % (time.time() - t0, len(s) / 1e6))
    with open(BLOB, "wb") as fh:
        pickle.dump({"s": s, "it": it, "ot": ot}, fh)

    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        capture_output=True, text=True,
        env=dict(
            os.environ,
            PYTHONPATH="/root/repo" + os.pathsep
            + os.environ.get("PYTHONPATH", ""),
        ),
    )
    log("child wall %.1fs" % (time.time() - t0))
    print(r.stdout.strip())
    if r.returncode != 0:
        log("child FAILED:\n%s" % r.stderr[-3000:])


if __name__ == "__main__":
    main()
