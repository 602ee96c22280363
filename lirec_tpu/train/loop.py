"""Training loop (ref `mlp/train.py:21-107`), jit-compiled end to end.

Differences from the reference, by design:
- the whole step (forward + loss + grad + Adam update) is one jitted
  function; the `tr_sum_max` curriculum flip at epoch 20 (ref :49-51) is a
  static argument, costing one recompile when it flips;
- dropout and categorical sampling use explicit PRNG keys;
- checkpoints are msgpack pytrees via BestNSaver (ModelSaver-parity policy).
"""

from __future__ import annotations

import functools
import os.path as ops
import time
from typing import Dict, Optional

import jax
import numpy as np
import optax

from lirec_tpu.checkpoint import save_train_state_any
from lirec_tpu.checkpoint.saver import BestNSaver
from lirec_tpu.data.pipeline import BatchIterator, prefetch_to_device
from lirec_tpu.evaluation.runner import evaluate
from lirec_tpu.train.optim import make_optimizer
from lirec_tpu.utils.meters import Averaging, MetricsLogger

__all__ = ["train", "make_train_step", "make_epoch_sweep"]

MODEL_KEYS = (
    "features", "feat_idx", "rels_mask", "uniq_clip", "uniq_track"
)


def make_train_step(bundle, tx, mesh=None):
    """Build the jitted (params, opt_state, batch, tables, rng) -> update
    step. `tables` ride through jit as regular (shardable) arguments.
    `mesh` only informs kernel dispatch (the pallas scatter VJP has no
    GSPMD rule; meshed steps keep XLA's scatter)."""

    # NOTE: params are deliberately NOT donated — callers hold on to
    # initial params (parity tests, BestNSaver snapshots, re-evaluation),
    # and donation would invalidate those references on the next step.
    # opt_state IS donated: nothing outside the loop holds Adam moments
    # (checkpointing reads the CURRENT state before the next step runs),
    # and donation lets XLA update the 2x18.4M-float moments in place.
    @functools.partial(
        jax.jit, static_argnames=("tr_sum_max_flag",), donate_argnums=(1,)
    )
    def step(params, opt_state, batch, tables, rng, tr_sum_max_flag=True):
        rng_drop, rng_loss = jax.random.split(rng)
        model_batch = {k: batch[k] for k in MODEL_KEYS if k in batch}

        def loss_fn(p):
            outputs = bundle.apply(
                p, model_batch, tables=tables,
                deterministic=False, rng=rng_drop, data_mesh=mesh,
            )
            return bundle.loss(
                outputs, batch, rng=rng_loss,
                tr_sum_max_flag=tr_sum_max_flag,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_epoch_sweep(bundle, tx, mesh=None):
    """Build the jitted whole-epoch sweep: ONE dispatch runs every step of
    the epoch in a `lax.fori_loop` over pre-staged stacked batches
    ([S, B, ...] arrays), with params/opt_state in the carry and the
    per-step PRNG folded exactly like the per-batch loop
    (``fold_in(base_rng, rng_offset + i)``), so the two paths produce the
    same parameter trajectory. Removes S-1 host round-trips per epoch —
    on a tunneled chip the per-batch path is dispatch-latency-bound."""
    import jax.numpy as jnp

    @functools.partial(
        jax.jit,
        static_argnames=("tr_sum_max_flag",),
        donate_argnums=(1,),  # opt_state, as in make_train_step
    )
    def sweep(params, opt_state, stacked, tables, base_rng, rng_offset,
              tr_sum_max_flag=True):
        n_steps = stacked["labels"].shape[0]

        def body(i, carry):
            params, opt_state, losses = carry
            batch = jax.tree.map(lambda v: v[i], stacked)
            rng = jax.random.fold_in(base_rng, rng_offset + i)
            rng_drop, rng_loss = jax.random.split(rng)
            model_batch = {k: batch[k] for k in MODEL_KEYS if k in batch}

            def loss_fn(p):
                outputs = bundle.apply(
                    p, model_batch, tables=tables,
                    deterministic=False, rng=rng_drop, data_mesh=mesh,
                )
                return bundle.loss(
                    outputs, batch, rng=rng_loss,
                    tr_sum_max_flag=tr_sum_max_flag,
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses.at[i].set(loss)

        return jax.lax.fori_loop(
            0, n_steps, body,
            (params, opt_state, jnp.zeros((n_steps,), jnp.float32)),
        )

    return sweep


def _aot_wrap_step(jitted_step, mesh=None):
    """AOT-cache the per-batch train step (--per-batch-train and the
    dense oracle path), memoized per batch shape — same contract as
    `_aot_wrap_sweep`. Meshed/multi-process steps are cached too (r5);
    the mesh fingerprint rides the cache key."""
    from lirec_tpu.utils import aot_cache

    memo = {}

    def call(params, opt_state, batch, tables, rng, tr_sum_max_flag=True):
        key = (
            tuple(sorted((k, np.shape(v)) for k, v in batch.items())),
            bool(tr_sum_max_flag),
        )
        fn = memo.get(key)
        if fn is None:
            fn = aot_cache.cached_compile(
                jitted_step, params, opt_state, batch, tables, rng,
                label="train_step", mesh=mesh, donate_argnums=(1,),
                tr_sum_max_flag=bool(tr_sum_max_flag),
            )
            memo[key] = fn
            # pre-first-execution barrier: compile/AOT-serialize skew
            # between processes must not eat the ~30 s gloo context
            # deadline (parallel/mesh.coordination_barrier; no-op 1-proc)
            from lirec_tpu.parallel.mesh import coordination_barrier

            coordination_barrier("train_step_compile")
        return fn(params, opt_state, batch, tables, rng)

    return call


def _aot_wrap_sweep(jitted_sweep, mesh=None):
    """Route the epoch sweep through the AOT executable cache
    (utils/aot_cache.py — dodges the remote compile-at-load on cold
    starts). Memoized per (n_steps, curriculum flag) so each distinct
    sweep shape lowers once per process, exactly like jit's own cache.
    Meshed/multi-process sweeps are cached too (r5, VERDICT r4 item 4) —
    the mesh fingerprint (device layout) and process index/count ride
    the cache key."""
    from lirec_tpu.utils import aot_cache

    memo = {}

    def call(params, opt_state, stacked, tables, base_rng, rng_offset,
             tr_sum_max_flag=True):
        # full shapes, not just n_steps: the Localizer's uniq_clip/
        # uniq_track capacities grow across epochs, and a stale
        # executable would reject the wider arrays instead of recompiling
        key = (
            tuple(sorted((k, np.shape(v)) for k, v in stacked.items())),
            bool(tr_sum_max_flag),
        )
        fn = memo.get(key)
        if fn is None:
            fn = aot_cache.cached_compile(
                jitted_sweep, params, opt_state, stacked, tables,
                base_rng, rng_offset, label="train_sweep", mesh=mesh,
                donate_argnums=(1,),
                tr_sum_max_flag=bool(tr_sum_max_flag),
            )
            memo[key] = fn
            # pre-first-execution barrier (see _aot_wrap_step)
            from lirec_tpu.parallel.mesh import coordination_barrier

            coordination_barrier("train_sweep_compile")
        return fn(params, opt_state, stacked, tables, base_rng, rng_offset)

    return call


def _pad_batch(batch, full_batch: int):
    """Pad a ragged batch to the full batch size by repeating row 0 with
    ``loss_weight`` 0 — one compiled shape per epoch, and the padded rows
    drop out of every loss mean (models/losses._wmean), so values and
    grads match the unpadded batch. Shared by the per-batch mesh path and
    the epoch-sweep stacker."""
    n = np.asarray(batch["labels"]).shape[0]
    pad = full_batch - n
    out = {}
    for k, v in batch.items():
        if k in ("uniq_clip", "uniq_track"):
            out[k] = v  # batch-level key (no batch axis), never padded
            continue
        v = np.asarray(v)
        fill = np.broadcast_to(v[:1], (pad,) + v.shape[1:])
        out[k] = np.concatenate([v, fill.astype(v.dtype)], axis=0)
    out["loss_weight"] = np.concatenate(
        [np.ones(n, np.float32), np.zeros(pad, np.float32)]
    )
    return out


def _stack_epoch_batches(batches, full_batch: int):
    """Stack an epoch's host batches into [S, B, ...] arrays; ragged
    leftovers go through `_pad_batch`, and when any batch is padded all
    batches carry a loss_weight so the stacked keys are uniform."""
    any_ragged = any(b["labels"].shape[0] != full_batch for b in batches)
    padded = []
    for b in batches:
        if np.asarray(b["labels"]).shape[0] != full_batch:
            out = _pad_batch(b, full_batch)
        elif any_ragged:
            out = dict(b, loss_weight=np.ones(full_batch, np.float32))
        else:
            out = b
        padded.append(out)
    return {k: np.stack([b[k] for b in padded]) for k in padded[0]}


def _collect_batches(iterator):
    """One epoch of host batches, size-1 batches skipped (ref
    mlp/train.py:55-56)."""
    return [
        b for b in iterator
        if (b["labels"].shape[0] if b["labels"].ndim else 1) > 1
    ]


def _local_value(arr):
    """Host value of a device array; for multi-process (not fully
    addressable) arrays, reads this process's replica."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    return np.asarray(arr.addressable_data(0))


def train(
    cfg,
    bundle,
    train_dataset,
    val_dataset=None,
    test_dataset=None,
    tables: Optional[Dict] = None,
    params: Optional[Dict] = None,
    opt_state=None,
    verbose: bool = True,
    dense: bool = False,
    metrics_log_path: Optional[str] = None,
    start_epoch: int = 0,
    checkpoint_every: int = 0,
    drop_last: bool = False,
    checkpoint_backend: str = "msgpack",
    mesh=None,
    host_eval: bool = False,
    epoch_sweep: Optional[bool] = None,
    sweep_max_steps: int = 512,
    assembly_workers: int = 0,
    localize_tables: Optional[bool] = None,
    eval_localize: Optional[bool] = None,
) -> Dict:
    """Run the epoch loop; returns {'params', 'opt_state', 'saver',
    'final_path'} (control flow: ref mlp/train.py:41-107).

    Training-cadence evaluation (every ``test_fr`` epochs, ref
    mlp/train.py:75-91) goes through the packed one-dispatch device sweep
    (evaluation/packed.py) — mesh-aware, same metric dict as the host loop
    — unless ``host_eval`` (or ``dense``) forces the per-batch host path.

    ``epoch_sweep``: run each epoch as ONE device dispatch (fori_loop over
    the epoch's stacked batches — the train-side analogue of packed eval;
    same parameter trajectory as the per-batch loop, which stays available
    for reference-style per-iteration telemetry). Default (None): on for
    packed runs — including multi-process ones, where every process holds
    the same seeded global batches and `shard_tree` materializes only its
    addressable shards — off for dense batches. Epochs longer than
    ``sweep_max_steps`` run in chunks (bounded stacked-array memory, at
    most two compiled sweep lengths, same trajectory)."""
    o, t = cfg.optim, cfg.tasks
    params = params if params is not None else bundle.params
    tx = make_optimizer(o.lr, o.weight_decay)
    if jax.process_count() > 1 and mesh is None and not dense:
        # multi-process without an explicit mesh: auto-build a data-only
        # mesh over all global devices so the one-dispatch epoch sweep
        # stays available (r3 silently degraded to the per-batch loop
        # here — ~5x epoch wall-clock through a tunneled chip, BENCH.md)
        from lirec_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(shape=(jax.device_count(), 1))
        if verbose and jax.process_index() == 0:
            print(
                "multi-process run without --mesh: using data-only mesh "
                "{'data': %d, 'model': 1}" % jax.device_count()
            )
    if tables is None and not dense:
        tables = train_dataset.tables.as_dict()
    if tables is not None and mesh is None:
        tables = jax.tree.map(jax.numpy.asarray, tables)
    if mesh is not None:
        # dp x tp training: params per the TP plan, tables replicated,
        # batches over 'data' (parallel/mesh.py). Checkpointing and eval
        # read the global arrays transparently (multi-process: via a
        # host_copy allgather).
        from lirec_tpu.parallel import mesh as mesh_lib

        params = mesh_lib.shard_tree(
            params, mesh_lib.param_shardings(
                params, mesh, gates=bundle.spec.gates
            )
        )
        if tables is not None:
            tables = mesh_lib.shard_tree(
                tables, mesh_lib.table_shardings(tables, mesh)
            )
    if opt_state is None:
        # under a mesh the moments inherit the param shardings
        opt_state = (
            jax.jit(tx.init)(params) if mesh is not None else tx.init(params)
        )
    multiprocess = jax.process_count() > 1

    def snapshot(tree):
        """Checkpoint/saver view of (possibly non-addressable) arrays."""
        if not multiprocess:
            return tree
        from lirec_tpu.parallel.mesh import host_copy

        return host_copy(tree)

    # batch-local table projection (data/localize.py): remap each batch's
    # feat_idx to its unique rows so the table-level first layers run at
    # batch-unique size. Auto (None): on for packed runs whenever the
    # profitability gate fires at real cardinality; off for dense
    # batches. Multi-process: every process sees the same seeded global
    # batches, so the (deterministic) analysis produces identical uniq
    # arrays everywhere and they replicate (commit paths exempt them
    # from batch-axis slicing).
    localizer = None
    if localize_tables is not False and not dense and tables is not None:
        from lirec_tpu.data.localize import Localizer

        localizer = Localizer(
            bundle.spec,
            n_clips=np.shape(tables["text"])[0],
            n_tracks=np.shape(tables["track"])[0],
            force=localize_tables,
        )

    def localized(batches):
        return localizer.maybe_localize(batches) if localizer else batches

    step = _aot_wrap_step(make_train_step(bundle, tx, mesh=mesh), mesh=mesh)
    if epoch_sweep is None:
        epoch_sweep = not dense
    use_sweep = (
        epoch_sweep and not dense and (not multiprocess or mesh is not None)
    )
    sweep = make_epoch_sweep(bundle, tx, mesh=mesh) if use_sweep else None
    if sweep is not None:
        sweep = _aot_wrap_sweep(sweep, mesh=mesh)

    def commit_stacked(stacked):
        if mesh is None:
            return jax.tree.map(jax.numpy.asarray, stacked)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lirec_tpu.parallel import mesh as mesh_lib

        shardings = {
            k: NamedSharding(
                mesh,
                # uniq_* are [S, cap] batch-level id arrays -> replicate
                P(None) if k in ("uniq_clip", "uniq_track")
                else P(None, "data", *([None] * (np.ndim(v) - 2))),
            )
            for k, v in stacked.items()
        }
        return mesh_lib.shard_tree(stacked, shardings)

    def commit_batch(batch):
        if mesh is None:
            return batch
        from lirec_tpu.parallel import mesh as mesh_lib

        if batch["labels"].shape[0] != o.batch_size:
            batch = _pad_batch(batch, o.batch_size)
        if multiprocess:
            # every process iterates the same (seeded) global batches;
            # each contributes only ITS contiguous data-axis rows and the
            # global array assembles without cross-host transfer
            sl = mesh_lib.process_local_slice(mesh, o.batch_size)
            local = {
                # batch-level keys (localized unique-row ids) stay full
                # on every process and replicate
                k: np.asarray(v) if k in ("uniq_clip", "uniq_track")
                else np.asarray(v)[sl]
                for k, v in batch.items()
            }
            return mesh_lib.global_batch_from_local(local, mesh)
        return mesh_lib.shard_tree(
            batch, mesh_lib.batch_shardings(batch, mesh)
        )

    saver = BestNSaver(path=cfg.paths.store_root, n=o.keep_best_n)
    iterator = BatchIterator(
        train_dataset, o.batch_size, shuffle=True, seed=o.seed, dense=dense,
        drop_last=drop_last, workers=assembly_workers,
    )
    # rbg keys: ~6x faster dropout-mask generation on TPU, statistically
    # validated (tests/test_prng.py). Param init stays threefry either way
    # (create_model), so checkpoints/parity are unaffected — only the
    # dropout/loss-sampling stream differs.
    base_rng = (
        jax.random.key(o.seed, impl="rbg")
        if cfg.runtime.fast_prng
        else jax.random.PRNGKey(o.seed)
    )

    tr_sum_max_flag = t.tr_sum_max_flag
    metrics_log = MetricsLogger(metrics_log_path)

    # dense batches carry no packed tables; the host loop is the only path
    use_packed_eval = not host_eval and not dense
    eval_data_cache: Dict[int, Dict] = {}

    def cadence_eval(ds, mode, params, tables=None):
        # datasets without the packed interface (e.g. TextOnlyDataset)
        # keep the host loop
        if not use_packed_eval or not hasattr(ds, "materialize"):
            return evaluate(
                ds, bundle, params, cfg, mode=mode, tables=tables,
                dense=dense, verbose=verbose,
            )
        from lirec_tpu.evaluation.packed import evaluate_packed

        # materialize each split once for the whole run (the dataset only
        # caches eval-mode splits itself; the train split's eval-time
        # context draws are diagnostics, frozen here like the eval stride)
        data = eval_data_cache.get(id(ds))
        if data is None:
            data = eval_data_cache[id(ds)] = ds.materialize()
        return evaluate_packed(
            ds, bundle, params, cfg, mode=mode, tables=tables,
            verbose=verbose, data=data, mesh=mesh,
            localize_ctx=eval_localize,
        )

    def log(msg):
        if verbose:
            print(msg)

    losses = []
    pending_batches = None  # epoch-ahead assembly, overlapped with the sweep
    for epoch in range(start_epoch, o.epochs):
        if t.tr_sum_max and epoch >= 20:
            tr_sum_max_flag = True  # curriculum flip (ref :49-51)
        epoch_losses = []
        # batch/data-time telemetry (ref mlp/train.py:29-31,53-73)
        batch_time, data_time, loss_meter = Averaging(), Averaging(), Averaging()
        start = time.time()
        end = time.time()
        if use_sweep:
            batches = (
                pending_batches if pending_batches is not None
                else localized(_collect_batches(iterator))
            )
            data_time.update(time.time() - end)
            # chunk very long epochs so the stacked [S, B, ...] arrays stay
            # bounded on device (at most 2 compiled sweep lengths: the chunk
            # size and one remainder); the PRNG offset keeps the global
            # step index, so chunking never changes the trajectory
            chunk = max(int(sweep_max_steps), 1)
            dispatched = []
            for c0 in range(0, len(batches), chunk):
                part = batches[c0:c0 + chunk]
                stacked = commit_stacked(
                    _stack_epoch_batches(part, o.batch_size)
                )
                params, opt_state, step_losses = sweep(
                    params, opt_state, stacked, tables, base_rng,
                    epoch * 100003 + c0, tr_sum_max_flag=tr_sum_max_flag,
                )
                dispatched.append((step_losses, part))
            # the sweep dispatches are async: assemble the NEXT epoch's
            # batches (per-sample host work, the real-data bottleneck) while
            # the device runs this one, then fetch the losses
            pending_batches = (
                localized(_collect_batches(iterator))
                if epoch + 1 < o.epochs else None
            )
            for step_losses, part in dispatched:
                vals = np.asarray(_local_value(step_losses))
                epoch_losses.extend(float(x) for x in vals)
                for loss, b in zip(vals, part):
                    loss_meter.update(float(loss), b["labels"].shape[0])
            if batches:
                batch_time.update((time.time() - end) / len(batches))
            end = time.time()
        for i, batch in enumerate(
            () if use_sweep
            else prefetch_to_device(
                localized([b])[0] for b in iterator
            )
        ):
            data_time.update(time.time() - end)
            n = batch["labels"].shape[0] if batch["labels"].ndim else 1
            if n == 1:
                continue  # ref :55-56
            rng = jax.random.fold_in(base_rng, epoch * 100003 + i)
            params, opt_state, loss = step(
                params, opt_state, commit_batch(batch), tables, rng,
                tr_sum_max_flag=tr_sum_max_flag,
            )
            loss = float(loss)
            epoch_losses.append(loss)
            loss_meter.update(loss, n)
            batch_time.update(time.time() - end)
            end = time.time()
            if i % 10 == 0 and i and verbose:
                log(
                    "Epoch: [%d][%d/%d]\tTime %.3f (%.3f)\tData %.3f (%.3f)"
                    "\tLoss %.4f (%.4f)"
                    % (epoch, i, len(iterator), batch_time.val,
                       batch_time.avg, data_time.val, data_time.avg,
                       loss_meter.val, loss_meter.avg)
                )
        losses.append(float(np.mean(epoch_losses)) if epoch_losses else 0.0)
        log(
            "epoch %d loss: %f (%.2fs)"
            % (epoch, losses[-1], time.time() - start)
        )
        metrics_log.log(
            {
                "epoch": epoch,
                "loss": losses[-1],
                "batch_time_avg": batch_time.avg,
                "data_time_avg": data_time.avg,
            }
        )

        if epoch % o.test_fr == 0 and val_dataset is not None:
            # NOTE: each dataset owns its feature tables with dataset-local
            # row indices — evaluate must derive tables from ITS dataset
            # (passing the train tables here would gather val/test index
            # triples from the wrong rows, silently corrupting metrics)
            cadence_eval(
                train_dataset, mode="train", tables=tables, params=params
            )
            check_val = cadence_eval(
                val_dataset, mode="val", params=params
            )
            check_val = {
                k: v for k, v in check_val.items() if k != "loss"
            }
            if saver.check(check_val):
                saver.update(
                    check_val,
                    {"params": snapshot(params), "epoch": epoch},
                    epoch,
                )
                if test_dataset is not None:
                    cadence_eval(
                        test_dataset, mode="test", params=params
                    )
        if (
            o.save_model and o.save_model_often and epoch % 30 == 0
            and jax.process_index() == 0
        ):
            saver.save()
        if (
            checkpoint_every
            and cfg.paths.store_root
            and (epoch + 1) % checkpoint_every == 0
        ):
            # crash-resilience checkpoint (the reference has no failure
            # recovery, SURVEY.md §5.3); pick up with auto-resume.
            # snapshot() is a collective — every process runs it; only
            # process 0 writes the file.
            p_host, o_host = snapshot(params), snapshot(opt_state)
            if jax.process_index() == 0:
                save_train_state_any(
                    ops.join(cfg.paths.store_root, "latest.ckpt"),
                    p_host, o_host, epoch, backend=checkpoint_backend,
                )

    iterator.close()  # terminate assembly workers (daemonic either way)
    final_path = ""
    if o.save_model and cfg.paths.store_root:
        final_path = ops.join(cfg.paths.store_root, "%d.ckpt" % (o.epochs - 1))
        # weights + optimizer state, so training can resume
        # (ref mlp/train.py:99-106)
        p_host, o_host = snapshot(params), snapshot(opt_state)
        if jax.process_index() == 0:
            save_train_state_any(
                final_path, p_host, o_host, o.epochs - 1,
                backend=checkpoint_backend,
            )
            saver.save()
    return {
        "params": params,
        "opt_state": opt_state,
        "saver": saver,
        "losses": losses,
        "final_path": final_path,
        "epoch_sweep_used": bool(use_sweep),
        "localized_tables": bool(localizer and localizer.applied),
    }
