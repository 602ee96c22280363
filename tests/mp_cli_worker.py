"""One process of a 2-process CLI training run.

Spawned by tests/test_multiprocess.py: exercises the user-facing multi-host
bring-up (`--coordinator/--num-processes/--process-id` -> ``run_entry`` ->
``initialize_distributed``), per-process batch feeding inside the train
loop, the multi-process packed eval cadence, and process-0-only
checkpoint writes — on a localhost gloo cluster of virtual CPU devices.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    synth_root = sys.argv[4]
    store = sys.argv[5]
    # optional 6th arg: mesh spec, or "auto" to omit --mesh entirely (the
    # CLI then auto-builds a data-only mesh; tests/test_multiprocess.py);
    # any further args are passed through to the entry verbatim
    mesh = sys.argv[6] if len(sys.argv) > 6 else "4x2"
    extra = sys.argv[7:]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lirec_tpu.cli.common import run_entry

    out = run_entry("int_rel_ch", [
        "--data-root", synth_root, "--store-root", store,
        "--train", "--epochs", "2", "--batch-size", "8", "--quiet",
        "--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
        "--joint-dim", "16", "--compute-dtype", "float32",
        "--coordinator", "localhost:%s" % port,
        "--num-processes", "2", "--process-id", str(pid),
    ] + ([] if mesh == "auto" else ["--mesh", mesh]) + extra)
    from lirec_tpu.utils import aot_cache

    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "device_count": jax.device_count(),
                "losses": out["train"]["losses"],
                "epoch_sweep_used": out["train"].get("epoch_sweep_used"),
                "localized_tables": out["train"].get("localized_tables"),
                "aot": aot_cache.stats(),
            },
            f,
        )


if __name__ == "__main__":
    main()
