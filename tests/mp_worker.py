"""Multi-process worker: one JAX process of a 2-process CPU cluster.

Spawned by tests/test_multiprocess.py (and __graft_entry__'s multiprocess
dryrun). Runs one sharded train step over a global {'data': 4, 'model': 2}
mesh fed with per-process batch shards, then a packed eval sweep over this
process's data shard with cross-process counter reduction; dumps results
as JSON for the parent to compare against the single-process run.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    n_procs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    local_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=%d" % local_devices
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lirec_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address="localhost:%s" % port,
        num_processes=n_procs,
        process_id=pid,
    )
    n_devices = n_procs * local_devices
    assert jax.device_count() == n_devices, jax.device_count()
    assert jax.local_device_count() == local_devices

    import jax.numpy as jnp
    import numpy as np

    from lirec_tpu import config as config_lib
    from lirec_tpu.evaluation.packed import (
        allreduce_carry,
        device_sweep_builder,
        finish_from_carry,
    )
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.models.tabular import embed_all
    from lirec_tpu.parallel.mesh import (
        global_batch_from_local,
        make_mesh,
        process_local_slice,
    )
    from lirec_tpu.parallel.step import make_sharded_train_step
    from lirec_tpu.train.optim import make_optimizer
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=16, visual_dim=32, joint_dim=16)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bundle = create_model(cfg, 11, n_rels=6)

    tables = make_tables(bundle.spec, n_clips=32, n_tracks=48)
    B_GLOBAL = 8
    batch = make_batch(bundle.spec, B_GLOBAL, n_clips=32, n_tracks=48)

    # ---- sharded train step fed with per-process rows ----
    mesh = make_mesh(shape=(n_devices // 2, 2))
    sl = process_local_slice(mesh, B_GLOBAL)
    local = {k: v[sl] for k, v in batch.items()}
    gbatch = global_batch_from_local(local, mesh)
    tx = make_optimizer(cfg.optim.lr, cfg.optim.weight_decay)
    state = make_sharded_train_step(bundle, tx, mesh, bundle.params, tables)
    loss = float(state.step(gbatch, jax.random.PRNGKey(0)))

    # ---- packed eval over this process's data shard + allreduce ----
    t = cfg.tasks
    init_carry, step = device_sweep_builder(bundle, t, 11, 6, 0)
    jtables = jax.tree.map(jnp.asarray, tables)
    embedded = jax.jit(lambda p, tb: embed_all(p, bundle.spec, tb))(
        bundle.params, jtables
    )
    per_proc = B_GLOBAL // n_procs
    eval_local = {
        k: jnp.asarray(v[pid * per_proc : (pid + 1) * per_proc])
        for k, v in batch.items()
    }
    Bs = 2  # two eval batches per process
    carry = init_carry()
    for i in range(per_proc // Bs):
        sub = {k: v[i * Bs : (i + 1) * Bs] for k, v in eval_local.items()}
        carry = jax.jit(step)(bundle.params, jtables, embedded, carry, sub)
    carry = allreduce_carry(carry)
    metrics = finish_from_carry(carry, t, 6, 0, "test", verbose=False)

    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "device_count": jax.device_count(),
                "loss": loss,
                "metrics": {k: float(v) for k, v in metrics.items()},
            },
            f,
        )


if __name__ == "__main__":
    main()
