"""Shared entry-point plumbing (ref `resume/*.py` catch_inner/pipeline).

Each entry point resolves a preset config, builds the split datasets, loads
or trains a model, and evaluates — with the reference's exact split choices:
`modalities`/`int_rels` build their (nominal) train dataset from the **val**
split, `int_ch`/`int_rel_ch` from the **test** split (ref resume/modalties.py:21,
int_rels.py:25, int_ch.py:22, int_rel_ch.py:23 — they never train).
"""

from __future__ import annotations

import argparse
import os

from lirec_tpu import config as config_lib
from lirec_tpu.checkpoint import load_params, load_torch_checkpoint
from lirec_tpu.data.dataset import InteractionDataset
from lirec_tpu.evaluation.runner import evaluate
from lirec_tpu.models.factory import create_model
from lirec_tpu.train.loop import train as train_loop

TRAIN_SPLIT = {
    "modalities": "val",
    "int_rels": "val",
    "int_ch": "test",
    "int_rel_ch": "test",
}


def build_parser(preset_name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lirec-tpu %s" % preset_name)
    p.add_argument("--data-root", required=True)
    p.add_argument("--store-root", default="")
    p.add_argument("--sanity-check", action="store_true",
                   help="one movie per split (ref README.md:52-53)")
    if preset_name in ("int_ch", "int_rel_ch"):
        p.add_argument("--tr-correct", action="store_true",
                       help="GT-track supervision (vs weak)")
    p.add_argument("--resume-path", default=None,
                   help=".pth.tar or .ckpt; default: the released checkpoint "
                        "path for this preset under <data-root>/models_release")
    p.add_argument("--train", action="store_true",
                   help="train instead of evaluating a checkpoint")
    p.add_argument("--resume-train", action="store_true",
                   help="load weights+optimizer from --resume-path and "
                        "continue training (ref resume flag semantics)")
    p.add_argument("--metrics-log", default="",
                   help="append JSONL training telemetry to this path")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save a resumable latest.ckpt every N epochs")
    p.add_argument("--checkpoint-backend", default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="train-state format: single msgpack file or an "
                        "Orbax directory (atomic, sharded-array aware); "
                        "resume auto-detects either")
    p.add_argument("--auto-resume", action="store_true",
                   help="continue from <store-root>/latest.ckpt if present")
    p.add_argument("--cache-workers", type=int, default=0,
                   help="thread pool size for feature precompute IO")
    p.add_argument("--ingest-cache", default="",
                   help="eval-only: path to a serialized ingest artifact "
                        "(.npz). Loaded when present (skips graph mining "
                        "and feature pooling entirely); written after a "
                        "fresh ingest otherwise. Create offline with "
                        "`python -m lirec_tpu.cli.ingest`.")
    p.add_argument("--fast-prng", action="store_true",
                   help="(default since r2; kept for compatibility) rbg "
                        "PRNG for dropout masks")
    p.add_argument("--strict-prng", action="store_true",
                   help="threefry PRNG for dropout masks instead of the "
                        "default rbg (~17%% slower train step; the r1 "
                        "random stream)")
    p.add_argument("--drop-last", action="store_true",
                   help="drop the leftover train batch (non-parity: the "
                        "reference trains on it; avoids one jit shape)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="override the preset learning rate (ref 3e-5)")
    p.add_argument("--text-dim", type=int, default=768)
    p.add_argument("--visual-dim", type=int, default=2048)
    p.add_argument("--text-layers", type=int, default=12)
    p.add_argument("--joint-dim", type=int, default=512)
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--host-eval", action="store_true",
                   help="per-batch host eval loop instead of the packed "
                        "one-dispatch device sweep (same metrics, slower; "
                        "applies to checkpoint eval and the training-time "
                        "eval cadence)")
    p.add_argument("--profile", default="",
                   help="capture a jax profiler trace of the train/eval "
                        "work into this directory (TensorBoard-viewable)")
    p.add_argument("--assembly-workers", type=int, default=0,
                   help="sample-assembly worker processes (the reference "
                        "ran 4 DataLoader workers); 0 = in-process. "
                        "Identical batches at any worker count")
    p.add_argument("--localize-tables", choices=("auto", "on", "off"),
                   default="auto",
                   help="batch-local table projection for training "
                        "(data/localize.py): remap each batch to its "
                        "unique table rows so the first-layer GEMMs run "
                        "at batch size, not table size. auto = on when "
                        "profitable at the split's cardinality")
    p.add_argument("--eval-localize", choices=("auto", "on", "off"),
                   default="auto",
                   help="eval ctx localization (evaluation/packed.py): "
                        "gather each batch's unique embedded ctx rows "
                        "into a VMEM-resident local table. auto = on "
                        "exactly when the full tables exceed the fused "
                        "kernel's VMEM budget; metrics are identical "
                        "either way")
    p.add_argument("--per-batch-train", action="store_true",
                   help="dispatch one device step per batch with the "
                        "reference's per-iteration telemetry prints, "
                        "instead of the default one-dispatch-per-epoch "
                        "training sweep (same parameter trajectory)")
    p.add_argument("--mesh", default="",
                   help="DATAxMODEL device mesh, e.g. 4x2: shards training "
                        "(dp over batch, tp over joint_dim) and the packed "
                        "eval sweep; multi-process runs use the global "
                        "device set (data axis spans hosts)")
    p.add_argument("--coordinator", default="",
                   help="multi-host bring-up: coordinator address "
                        "(host:port); give the SAME command on every host "
                        "with its own --process-id")
    p.add_argument("--num-processes", type=int, default=0,
                   help="multi-host bring-up: total process count")
    p.add_argument("--process-id", type=int, default=-1,
                   help="multi-host bring-up: this host's process index")
    p.add_argument("--quiet", action="store_true")
    return p


def _traced(profile_dir: str, fn, *args, **kwargs):
    """Run fn under a jax profiler trace when --profile is set."""
    from lirec_tpu.utils.profiling import trace

    with trace(profile_dir or None):
        return fn(*args, **kwargs)


def config_from_args(preset_name: str, args) -> config_lib.ExperimentConfig:
    kw = {}
    if hasattr(args, "tr_correct"):
        kw["tr_correct"] = args.tr_correct
    cfg = config_lib.preset(
        preset_name,
        data_root=args.data_root,
        store_root=args.store_root or os.path.join(args.data_root, "store"),
        sanity_check=args.sanity_check,
        **kw,
    )
    cfg = cfg.with_dims(
        text_dim=args.text_dim,
        visual_dim=args.visual_dim,
        text_layers=args.text_layers,
        joint_dim=args.joint_dim,
    )
    if args.epochs is not None:
        cfg = cfg.with_optim(epochs=args.epochs)
    if args.batch_size is not None:
        cfg = cfg.with_optim(batch_size=args.batch_size)
    if args.lr is not None:
        cfg = cfg.with_optim(lr=args.lr)
    if args.compute_dtype:
        cfg = cfg.with_runtime(compute_dtype=args.compute_dtype)
    if args.strict_prng:
        cfg = cfg.with_runtime(fast_prng=False)
    elif args.fast_prng:
        cfg = cfg.with_runtime(fast_prng=True)
    if args.resume_path is not None:
        cfg = cfg.replace(resume_path=args.resume_path)
    if args.train or args.resume_train:
        cfg = cfg.replace(resume=False, resume_train=args.resume_train)
    return cfg


def build_datasets(cfg, preset_name: str, workers: int = 0):
    """Ingest the three split datasets with the reference's split quirks
    (the nominal 'train' dataset comes from TRAIN_SPLIT[preset])."""
    needs_rels = cfg.tasks.rels or cfg.tasks.rels_multitask
    train_ds = InteractionDataset(cfg, mode=TRAIN_SPLIT[preset_name])
    train_ds.cache(parallel_workers=workers)
    val_ds = InteractionDataset(cfg, mode="val")
    val_ds.n_classes = train_ds.n_classes
    val_ds.cache(parallel_workers=workers)
    test_ds = InteractionDataset(cfg, mode="test")
    test_ds.n_classes = train_ds.n_classes
    test_ds.cache(parallel_workers=workers)
    if needs_rels:
        train_ds.init_relships()
        val_ds.init_relships()
        test_ds.init_relships()
    return train_ds, val_ds, test_ds


def load_checkpoint_params(path: str, template=None):
    if os.path.isdir(path):  # Orbax checkpoints are directories
        from lirec_tpu.checkpoint import orbax_backend

        params, _, _ = orbax_backend.restore(path, template)
        return params
    if path.endswith((".pth.tar", ".pth", ".tar")):
        params, _ = load_torch_checkpoint(path)
        return params
    return load_params(path, template=template)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: repeated entry-point runs skip the
    (CPU ~10s, TPU ~30s) jit compiles."""
    import jax

    cache_dir = os.environ.get(
        "LIREC_TPU_CACHE", os.path.expanduser("~/.cache/lirec_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the persistent cache


def run_entry(preset_name: str, argv=None) -> dict:
    import multiprocessing as _mp

    if _mp.parent_process() is not None:
        # an UNGUARDED launching script re-imported by a spawned worker
        # (e.g. --assembly-workers): without this guard the child would
        # re-run training and could connect to (and corrupt) the parent's
        # distributed cluster. Failing here kills the worker at bootstrap,
        # which the AssemblyPool probe converts into a clean warning +
        # in-process fallback. The packaged CLIs are main-guarded already.
        raise RuntimeError(
            "run_entry re-executed inside a multiprocessing child: guard "
            "the launching script with `if __name__ == '__main__':` "
            "(spawned workers re-import __main__)"
        )
    args = build_parser(preset_name).parse_args(argv)
    cfg = config_from_args(preset_name, args)
    verbose = not args.quiet
    if args.num_processes and args.num_processes > 1:
        # must run before anything touches the backend (jax.devices below)
        from lirec_tpu.parallel.mesh import initialize_distributed

        if args.process_id < 0 or not args.coordinator:
            raise SystemExit(
                "--num-processes needs --coordinator HOST:PORT and "
                "--process-id"
            )
        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if not args.mesh:
            # auto data-only mesh over all global devices: multi-process
            # runs keep the one-dispatch epoch sweep + sharded packed eval
            # without requiring an explicit topology (r3 degraded these to
            # the per-batch/per-process paths instead)
            import jax

            args.mesh = "%dx1" % jax.device_count()
            if verbose and args.process_id == 0:
                print("no --mesh given: using data-only mesh %s" % args.mesh)
    _enable_compilation_cache()
    # fast_prng is honored by train/loop.py via an explicit rbg-typed base
    # key — NOT by mutating the global default PRNG impl (which would also
    # change param init and leak into the rest of the process)
    mesh = None
    if args.mesh:
        import jax

        from lirec_tpu.parallel.mesh import make_mesh

        if args.host_eval:
            raise SystemExit(
                "--mesh only shards the packed eval sweep; drop --host-eval"
            )
        try:
            shape = tuple(int(x) for x in args.mesh.lower().split("x"))
        except ValueError:
            shape = ()
        if len(shape) != 2:
            raise SystemExit("--mesh expects DATAxMODEL, e.g. 4x2")
        n = len(jax.devices())
        if shape[0] * shape[1] > n:
            raise SystemExit(
                "--mesh %dx%d needs %d devices; %d visible"
                % (shape[0], shape[1], shape[0] * shape[1], n)
            )
        mesh = make_mesh(
            shape=shape, devices=jax.devices()[: shape[0] * shape[1]]
        )

    if args.ingest_cache and not cfg.resume:
        raise SystemExit(
            "--ingest-cache serves the eval paths; training draws fresh "
            "per-epoch context subsets and needs the live dataset"
        )
    if args.ingest_cache and os.path.exists(args.ingest_cache):
        from lirec_tpu.data.artifact import load_ingest

        splits = load_ingest(args.ingest_cache, cfg)
        train_ds, val_ds, test_ds = (
            splits["train"], splits["val"], splits["test"]
        )
        if verbose:
            print("loaded ingest artifact: %s" % args.ingest_cache)
    else:
        train_ds, val_ds, test_ds = build_datasets(
            cfg, preset_name, workers=args.cache_workers
        )
        if args.ingest_cache:
            from lirec_tpu.data.artifact import save_ingest

            save_ingest(
                args.ingest_cache, cfg,
                {"train": train_ds, "val": val_ds, "test": test_ds},
            )
            if verbose:
                print("wrote ingest artifact: %s" % args.ingest_cache)

    n_classes = train_ds.n_classes
    n_rels = max(len(train_ds.rels_list) - 1, 0)
    bundle = create_model(cfg, n_classes, n_rels=n_rels)
    params = bundle.params

    if cfg.resume and cfg.resume_path:
        params = load_checkpoint_params(cfg.resume_path, template=params)
        if verbose:
            print("loaded checkpoint: %s" % cfg.resume_path)

    results = {}
    if not cfg.resume:
        opt_state = None
        start_epoch = 0
        resume_from = ""
        if cfg.resume_train and cfg.resume_path:
            resume_from = cfg.resume_path
        elif args.auto_resume:
            latest = os.path.join(cfg.paths.store_root, "latest.ckpt")
            if os.path.exists(latest):
                resume_from = latest
        if resume_from:
            from lirec_tpu.checkpoint import load_train_state_any
            from lirec_tpu.train.optim import make_optimizer

            tx = make_optimizer(cfg.optim.lr, cfg.optim.weight_decay)
            params, opt_state, epoch = load_train_state_any(
                resume_from, params, tx.init(params)
            )
            start_epoch = epoch + 1
            if verbose:
                print(
                    "resumed training state from %s (epoch %d)"
                    % (resume_from, epoch)
                )
        out = _traced(
            args.profile, train_loop,
            cfg, bundle, train_ds, val_dataset=val_ds, test_dataset=test_ds,
            verbose=verbose, params=params, opt_state=opt_state,
            start_epoch=start_epoch,
            metrics_log_path=args.metrics_log or None,
            checkpoint_every=args.checkpoint_every,
            drop_last=args.drop_last,
            checkpoint_backend=args.checkpoint_backend,
            mesh=mesh,
            host_eval=args.host_eval,
            epoch_sweep=False if args.per_batch_train else None,
            assembly_workers=args.assembly_workers,
            localize_tables={"auto": None, "on": True, "off": False}[
                args.localize_tables
            ],
            eval_localize={"auto": None, "on": True, "off": False}[
                args.eval_localize
            ],
        )
        params = out["params"]
        results["train"] = {
            "losses": out["losses"],
            "epoch_sweep_used": out.get("epoch_sweep_used"),
            "localized_tables": out.get("localized_tables"),
        }
    else:
        eval_kw = {}
        if args.host_eval:
            eval_fn = evaluate
        else:
            from lirec_tpu.evaluation.packed import evaluate_packed as eval_fn

            eval_kw["mesh"] = mesh
            eval_kw["localize_ctx"] = {
                "auto": None, "on": True, "off": False
            }[args.eval_localize]
        if verbose:
            print("testing on validation set")
        results["val"] = _traced(
            args.profile, eval_fn,
            val_ds, bundle, params, cfg, mode="val", verbose=verbose,
            **eval_kw
        )
        if verbose:
            print("testing on test set")
        results["test"] = _traced(
            args.profile, eval_fn,
            test_ds, bundle, params, cfg, mode="test", verbose=verbose,
            **eval_kw
        )
    return results
