"""Probe: is XLA:CPU float scatter-add with DUPLICATE indices run-to-run
deterministic inside one process, and across processes under CPU load?

Motivation: VERDICT r4 item 1 — a one-in-N exactness failure in
test_packed_eval_ctx_localization_exact[int_rels-val-True]. int_rels is
the only preset whose sweep carry accumulates FLOATS through
`.at[h].add` with duplicate hash indices (evaluation/packed.py rels_table);
float addition is not associative, so any ordering nondeterminism in the
scatter lowering would make two evals of the SAME data disagree in the
last bits and flip the host argsort on near-ties.

Run (CPU, 8 virtual devices, like the test suite):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/probe_scatter_determinism.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n_hashes, n_rels, B = 700, 20, 8
    n_batches = 50
    # many duplicates per batch, values with wildly mixed magnitudes so any
    # reordering changes the rounded sum
    hs = rng.integers(0, 40, size=(n_batches, B)).astype(np.int32)
    probs = (
        rng.standard_normal((n_batches, B, n_rels)).astype(np.float32)
        * np.exp(rng.uniform(-20, 20, (n_batches, B, 1))).astype(np.float32)
    )

    @jax.jit
    def sweep(hs, probs):
        def body(i, tab):
            return tab.at[hs[i]].add(probs[i])

        return jax.lax.fori_loop(
            0, hs.shape[0], body,
            jnp.zeros((n_hashes + 1, n_rels), jnp.float32),
        )

    hs_d, probs_d = jnp.asarray(hs), jnp.asarray(probs)
    ref = np.asarray(sweep(hs_d, probs_d))
    mismatches = 0
    reps = 200
    for i in range(reps):
        out = np.asarray(sweep(hs_d, probs_d))
        if not np.array_equal(out, ref):
            mismatches += 1
            bad = np.nonzero(out != ref)
            print("rep %d: %d cells differ, first delta %.3e" % (
                i, bad[0].size, float(abs(out[bad][0] - ref[bad][0]))
            ))
    print("same-process: %d/%d reps mismatched vs first run" % (
        mismatches, reps
    ))
    # cross-process determinism: print a digest for the parent to compare
    import hashlib

    print("digest:", hashlib.blake2b(ref.tobytes(), digest_size=16).hexdigest())


if __name__ == "__main__":
    main()
