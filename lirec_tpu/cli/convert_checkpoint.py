"""Convert released PyTorch checkpoints to the native msgpack format.

    python -m lirec_tpu.cli.convert_checkpoint --src mod_all.pth.tar \\
        --dst mod_all.ckpt [--verify --preset int_rel_ch]

The converted file loads with `checkpoint.load_params` (no torch needed at
eval time); conversion itself requires torch to unpickle the source
(ref `utils/util_functions.py:274-281` checkpoint format).

``--verify`` additionally loads the SAME .pth.tar into the live torch
reference (--reference, default /root/reference), runs both models on a
seeded fixture batch, and compares the outputs — so the day the real
`models_release/*.pth.tar` drop is mountable, the ±0.5%-accuracy check
(SURVEY.md §7.5, BASELINE.md) is one command. Dims and head sizes are
inferred from the checkpoint tensors; only the model family needs
``--preset``.
"""

from __future__ import annotations

import argparse
import sys


def _infer_cfg(preset: str, params):
    """ExperimentConfig + (n_classes, n_rels) from checkpoint shapes."""
    from lirec_tpu import config as config_lib

    text_dim = params["txt_ints"]["kernel"].shape[0]
    visual_dim = params["vis_ints"]["kernel"].shape[0]
    joint_dim = params["txt_ints"]["kernel"].shape[1]
    n_classes = params["out_ints"]["kernel"].shape[1]
    n_rels = (
        params["out_ctx"]["kernel"].shape[1] if "out_ctx" in params else 0
    )
    cfg = config_lib.preset(preset, data_root="/nonexistent")
    cfg = cfg.with_dims(
        text_dim=text_dim, visual_dim=visual_dim, joint_dim=joint_dim
    ).with_runtime(compute_dtype="float32")
    return cfg, n_classes, n_rels


def verify_checkpoint(src: str, preset: str, reference: str,
                      batch: int = 3, seed: int = 0,
                      atol: float = 2e-5, rtol: float = 1e-4) -> dict:
    """Forward-activation comparison: converted params through OUR model vs
    the same .pth.tar through the live torch reference, on one seeded
    fixture batch. Returns per-output max-abs-diff; raises on mismatch."""
    import numpy as np

    from lirec_tpu.checkpoint import load_torch_checkpoint
    from lirec_tpu.compat import reference as bridge
    from lirec_tpu.models.factory import create_model

    import os

    os.environ.setdefault("LIREC_TPU_REFERENCE", reference)
    bridge.REFERENCE = reference
    if not bridge.reference_available():
        raise SystemExit(
            "--verify needs the reference repo at %r (set --reference or "
            "LIREC_TPU_REFERENCE)" % reference
        )
    import torch

    params, _meta = load_torch_checkpoint(src)
    cfg, n_classes, n_rels = _infer_cfg(preset, params)
    t, d = cfg.tasks, cfg.dims
    bundle = create_model(cfg, n_classes, n_rels=n_rels)
    import jax

    if jax.tree.structure(params) != jax.tree.structure(bundle.params):
        raise SystemExit(
            "checkpoint layer structure does not match preset %r "
            "(checkpoint: %s / model: %s)"
            % (preset, sorted(params), sorted(bundle.params))
        )

    rng = np.random.default_rng(seed)
    B, T, R = batch, t.n_hypotheses, t.rels_n_clips
    if t.mod_check or (not t.tr_maximize and not t.rels_multi_clip):
        feats = rng.standard_normal((B, 1, d.mlp_dim)).astype(np.float32)
        inp = {"features": feats}
        tinp = {"features": torch.tensor(feats)}
    elif t.tr_maximize and t.rels_multitask:
        feats = rng.standard_normal((B, T, R + 1, d.mlp_dim)).astype(
            np.float32
        )
        mask = (rng.random((B, T, R)) < 0.5).astype(np.float32)
        inp = {"features": feats, "rels_mask": mask}
        tinp = {
            "features": torch.tensor(feats, dtype=torch.float64),
            "rels_mask": torch.tensor(mask),
        }
    elif t.tr_maximize:
        feats = rng.standard_normal((B, T, d.mlp_dim)).astype(np.float32)
        inp = {"features": feats}
        tinp = {"features": torch.tensor(feats, dtype=torch.float64)}
    else:  # int_rels: [B, R+1, mlp_dim] multi-clip context
        feats = rng.standard_normal((B, R + 1, d.mlp_dim)).astype(np.float32)
        mask = (rng.random((B, R, 1)) < 0.5).astype(np.float32)
        mask[:, 0] = 1  # the dataset guarantees >=1 context clip
        inp = {"features": feats, "rels_mask": mask}
        tinp = {
            "features": torch.tensor(feats, dtype=torch.float64),
            "rels_mask": torch.tensor(mask),
        }

    out = bundle.apply(params, inp)
    # the torch side loads the ORIGINAL state_dict (the reference's own
    # load path, ref utils/util_functions.py:274-281) — NOT our converted
    # params transplanted back, which would cancel any conversion bug
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    if t.mod_check:
        ref_model = ref.model.Modalities(n_classes=n_classes)
    elif t.tr_maximize:
        kw = {"n_rels": n_rels} if n_rels else {}
        ref_model = ref.model.MidFusionMultiClipMaxTracks(
            n_classes=n_classes, **kw
        )
    else:
        ref_model = ref.model.MidFusionMultiClip(
            n_classes=n_classes, n_rels=n_rels
        )
    raw = torch.load(src, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if hasattr(raw, "get") else raw
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    ref_model.load_state_dict(sd)
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(tinp)

    diffs = {}
    for key, mine in out.items():
        theirs = ref_out.get(key) if hasattr(ref_out, "get") else None
        if theirs is None or mine is None:
            continue  # e.g. the reference returns rels=None without ctx
        theirs = theirs.numpy()
        mine = np.asarray(mine)
        diffs[key] = float(np.max(np.abs(mine - theirs)))
        np.testing.assert_allclose(
            mine, theirs, atol=atol, rtol=rtol,
            err_msg="output %r diverges between the converted params and "
                    "the torch reference" % key,
        )
    if not diffs:
        raise SystemExit("verify compared no outputs — preset mismatch?")
    return diffs


def main(argv=None):
    p = argparse.ArgumentParser(prog="lirec-tpu convert_checkpoint")
    p.add_argument("--src", required=True, help=".pth.tar source")
    p.add_argument("--dst", required=True, help=".ckpt msgpack destination")
    p.add_argument("--verify", action="store_true",
                   help="compare forward activations vs the live torch "
                        "reference after converting")
    p.add_argument("--preset", default="int_rel_ch",
                   choices=["modalities", "int_rels", "int_ch",
                            "int_rel_ch"],
                   help="model family for --verify (dims and head sizes "
                        "are inferred from the checkpoint)")
    p.add_argument("--reference", default="/root/reference",
                   help="reference repo path for --verify")
    args = p.parse_args(argv)

    from lirec_tpu.checkpoint import load_torch_checkpoint, save_params

    params, meta = load_torch_checkpoint(args.src)
    save_params(args.dst, params, extra={"epoch": meta.get("epoch")})
    n_arrays = sum(len(v) for v in params.values())
    print(
        "converted %s -> %s (%d layers, %d arrays, epoch=%s)"
        % (args.src, args.dst, len(params), n_arrays, meta.get("epoch")),
        file=sys.stderr,
    )
    result = {"layers": len(params), "epoch": meta.get("epoch")}
    if args.verify:
        diffs = verify_checkpoint(args.src, args.preset, args.reference)
        print(
            "verify ok vs torch reference (%s): max |diff| %s"
            % (args.preset,
               ", ".join("%s=%.2e" % kv for kv in sorted(diffs.items()))),
            file=sys.stderr,
        )
        result["verify"] = diffs
    return result


if __name__ == "__main__":
    main()


def script() -> int:
    """Console-script wrapper: main() returns data for programmatic use;
    setuptools wrappers sys.exit() the return value, so exit 0 here."""
    main()
    return 0
