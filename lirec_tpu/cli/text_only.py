"""Text-only ablation entry point (train or evaluate).

The reference ships this pipeline without an entry script
(`text_utils/classification_dataloader.py` is only importable); here it is a
first-class CLI.
"""

from __future__ import annotations

import argparse

from lirec_tpu.checkpoint import load_params
from lirec_tpu.cli.common import _enable_compilation_cache
from lirec_tpu.data.text_dataset import TextOnlyDataset, preset_text_only
from lirec_tpu.evaluation.runner import evaluate
from lirec_tpu.models.factory import create_model
from lirec_tpu.train.loop import train as train_loop


def main(argv=None):
    p = argparse.ArgumentParser(prog="lirec-tpu text_only")
    p.add_argument("--data-root", required=True)
    p.add_argument("--store-root", default="")
    p.add_argument("--sanity-check", action="store_true")
    p.add_argument("--inter-class", default="m", choices=["t", "v", "m"])
    p.add_argument("--train", action="store_true")
    p.add_argument("--resume-path", default="")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--text-dim", type=int, default=768)
    p.add_argument("--text-layers", type=int, default=12)
    p.add_argument("--joint-dim", type=int, default=512)
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)
    _enable_compilation_cache()

    cfg = preset_text_only(
        data_root=args.data_root,
        store_root=args.store_root or args.data_root + "/store_text",
        sanity_check=args.sanity_check,
        inter_class=args.inter_class,
    )
    cfg = cfg.with_dims(
        text_dim=args.text_dim, visual_dim=0,
        text_layers=args.text_layers, joint_dim=args.joint_dim,
    ).with_runtime(compute_dtype="float32")
    if args.epochs is not None:
        cfg = cfg.with_optim(epochs=args.epochs)
    if args.batch_size is not None:
        cfg = cfg.with_optim(batch_size=args.batch_size)

    verbose = not args.quiet
    train_ds = TextOnlyDataset(cfg, mode="train")
    train_ds.cache()
    val_ds = TextOnlyDataset(cfg, mode="val")
    val_ds.cache()
    test_ds = TextOnlyDataset(cfg, mode="test")
    test_ds.cache()

    bundle = create_model(cfg, train_ds.n_classes)
    params = bundle.params
    results = {}
    if args.train:
        out = train_loop(
            cfg, bundle, train_ds, val_dataset=val_ds, test_dataset=test_ds,
            verbose=verbose,
        )
        params = out["params"]
        results["train"] = {"losses": out["losses"]}
    else:
        if args.resume_path:
            params = load_params(args.resume_path, template=params)
        results["val"] = evaluate(
            val_ds, bundle, params, cfg, mode="val", verbose=verbose
        )
        results["test"] = evaluate(
            test_ds, bundle, params, cfg, mode="test", verbose=verbose
        )
    return results


if __name__ == "__main__":
    main()


def script() -> int:
    """Console-script wrapper: main() returns data for programmatic use;
    setuptools wrappers sys.exit() the return value, so exit 0 here."""
    main()
    return 0
