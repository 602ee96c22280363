#!/usr/bin/env python
"""Probe: can a compiled TPU executable be serialized and reloaded,
dodging the service-side recompile at process start?

Cold compiles through the axon tunnel are service-side and huge
(144-1813 s for the e2e sweep, BENCH.md "Cold compile"); the JAX
persistent compilation cache already covers same-program reloads IF the
backend honors it. This probe measures, on the real chip:

  1. jit compile time for a tiny program (fresh trace);
  2. `jax.experimental.serialize_executable.serialize` support;
  3. deserialize_and_load time + correct execution of the reloaded
     executable in the same process;
  4. whether the serialized blob round-trips across PROCESSES (the case
     that would actually dodge the recompile-at-load).

Run: env PYTHONPATH=/root/repo python tools/probe_aot_cache.py [--child]
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import time

BLOB = "/tmp/lirec_aot_probe.bin"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build():
    import jax
    import jax.numpy as jnp

    def f(x, w1, w2):
        h = jnp.tanh(x @ w1)
        return jnp.sum(h @ w2, axis=-1)

    x = jnp.ones((256, 512), jnp.bfloat16)
    w1 = jnp.ones((512, 512), jnp.bfloat16)
    w2 = jnp.ones((512, 128), jnp.bfloat16)
    return jax.jit(f), (x, w1, w2)


def child():
    import jax
    from jax.experimental import serialize_executable

    jit_f, args = build()
    t0 = time.time()
    with open(BLOB, "rb") as fh:
        payload = pickle.load(fh)
    loaded = serialize_executable.deserialize_and_load(
        payload["serialized"], payload["in_tree"], payload["out_tree"]
    )
    out = loaded(*args)
    jax.block_until_ready(out)
    load_s = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(loaded(*args))
    run_s = time.time() - t0
    print("CHILD load+first_run %.2fs rerun %.4fs sum %.3f"
          % (load_s, run_s, float(out.sum())))


def main():
    if "--child" in sys.argv:
        child()
        return
    import jax

    log("devices: %s" % jax.devices())
    jit_f, args = build()
    t0 = time.time()
    lowered = jit_f.lower(*args)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    first_run_s = time.time() - t0
    log("compile %.2fs, first run %.3fs" % (compile_s, first_run_s))

    try:
        from jax.experimental import serialize_executable

        t0 = time.time()
        serialized, in_tree, out_tree = serialize_executable.serialize(
            compiled
        )
        ser_s = time.time() - t0
        log("serialize OK: %.1f KB in %.2fs"
            % (len(serialized) / 1e3, ser_s))
        with open(BLOB, "wb") as fh:
            pickle.dump(
                {"serialized": serialized, "in_tree": in_tree,
                 "out_tree": out_tree}, fh,
            )
    except Exception as e:
        log("serialize FAILED: %r" % (e,))
        return

    # same-process reload
    try:
        t0 = time.time()
        loaded = serialize_executable.deserialize_and_load(
            serialized, in_tree, out_tree
        )
        jax.block_until_ready(loaded(*args))
        log("same-process deserialize+run OK in %.2fs" % (time.time() - t0))
    except Exception as e:
        log("same-process deserialize FAILED: %r" % (e,))
        return

    # cross-process reload: the case that matters
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
    log("child wall %.2fs" % (time.time() - t0))
    log("child stdout: %s" % r.stdout.strip())
    if r.returncode != 0:
        log("child FAILED:\n%s" % r.stderr[-2000:])


if __name__ == "__main__":
    main()
