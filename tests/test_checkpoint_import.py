"""Released-checkpoint import fidelity: a real torch-saved .pth.tar (the
reference's format, ref mlp/train.py:99-106) must convert to params that
reproduce the torch model's outputs exactly."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.checkpoint import load_torch_checkpoint
from lirec_tpu.models.factory import create_model

from tests import reference_bridge as bridge

pytestmark = pytest.mark.skipif(
    not bridge.reference_available(), reason="/root/reference not mounted"
)

TEXT, VIS, JOINT = 16, 32, 16
MLP = TEXT + VIS + 2 * VIS


def test_pth_tar_roundtrip(tmp_path):
    import torch

    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    cfg = cfg.with_runtime(compute_dtype="float32")
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()

    n_classes, n_rels = 7, 6
    torch.manual_seed(0)
    ref_model = ref.model.MidFusionMultiClipMaxTracks(
        n_classes=n_classes, n_rels=n_rels
    ).eval()
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save(
        {"epoch": 42, "state_dict": ref_model.state_dict(), "optimizer": {}},
        path,
    )

    params, meta = load_torch_checkpoint(path)
    assert meta["epoch"] == 42 and meta["has_optimizer"]

    bundle = create_model(cfg, n_classes, n_rels=n_rels)
    # converted params must be structurally identical to fresh init
    import jax

    assert jax.tree.structure(params) == jax.tree.structure(bundle.params)

    rng = np.random.default_rng(0)
    B, T, R = 3, 20, cfg.tasks.rels_n_clips
    feats = rng.standard_normal((B, T, R + 1, MLP)).astype(np.float32)
    rels_mask = (rng.random((B, T, R)) < 0.5).astype(np.float32)
    out = bundle.apply(params, {"features": feats, "rels_mask": rels_mask})
    with torch.no_grad():
        ref_out = ref_model(
            {
                "features": torch.tensor(feats, dtype=torch.float64),
                "rels_mask": torch.tensor(rels_mask),
            }
        )
    np.testing.assert_allclose(
        np.asarray(out["inters"]),
        ref_out["inters"].numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["rels"]),
        ref_out["rels"].numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_convert_checkpoint_cli(tmp_path):
    import torch

    from lirec_tpu.checkpoint import load_params
    from lirec_tpu.cli.convert_checkpoint import main

    cfg = config_lib.preset("modalities", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    bundle = create_model(cfg.with_runtime(compute_dtype="float32"), 7)
    sd = {}
    for name, leaf in bundle.params.items():
        sd[name + ".weight"] = torch.tensor(np.asarray(leaf["kernel"]).T)
        sd[name + ".bias"] = torch.tensor(np.asarray(leaf["bias"]))
    src = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 3, "state_dict": sd}, src)
    dst = str(tmp_path / "m.ckpt")
    main(["--src", src, "--dst", dst])
    restored = load_params(dst, template=bundle.params)
    for name, leaf in bundle.params.items():
        np.testing.assert_allclose(
            np.asarray(restored[name]["kernel"]), np.asarray(leaf["kernel"])
        )
        np.testing.assert_allclose(
            np.asarray(restored[name]["bias"]), np.asarray(leaf["bias"])
        )
    from flax import serialization

    with open(dst, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    assert tree["extra"]["epoch"] == 3
