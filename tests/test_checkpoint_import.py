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


def test_torch_free_reader_both_formats(tmp_path):
    """pickle_reader must reproduce torch.load on both serialization
    formats: zip (torch>=1.6 default) and legacy (what the 2019 released
    checkpoints use; ref utils/util_functions.py:274-281)."""
    import torch

    from lirec_tpu.checkpoint.pickle_reader import read_pth_tar

    torch.manual_seed(1)
    sd = {
        "txt_ints.weight": torch.randn(8, 16, dtype=torch.float32),
        "txt_ints.bias": torch.randn(8, dtype=torch.float64),
        "out_ints.weight": torch.randn(4, 8).half(),
    }
    ckpt = {"epoch": 7, "state_dict": sd, "optimizer": {"step": 3}}
    for fmt, kwargs in (
        ("zip", {}),
        ("legacy", {"_use_new_zipfile_serialization": False}),
    ):
        path = str(tmp_path / ("ckpt_%s.pth.tar" % fmt))
        torch.save(ckpt, path, **kwargs)
        out = read_pth_tar(path)
        assert out["epoch"] == 7 and out["optimizer"]["step"] == 3
        for k, v in sd.items():
            got = out["state_dict"][k]
            assert got.dtype == v.numpy().dtype, (fmt, k)
            np.testing.assert_array_equal(got, v.numpy(), err_msg=(fmt, k))


def test_torch_free_reader_rejects_arbitrary_globals(tmp_path):
    """The restricted unpickler must refuse classes off the safelist
    instead of executing their reduce callables."""
    import pickle

    import torch

    from lirec_tpu.checkpoint.pickle_reader import read_pth_tar

    path = str(tmp_path / "evil.pth.tar")
    torch.save({"obj": np.float64(1.0)}, path)  # numpy global: not allowed
    with pytest.raises(pickle.UnpicklingError, match="does not allow"):
        read_pth_tar(path)


def test_load_checkpoint_without_torch(tmp_path, monkeypatch):
    """load_torch_checkpoint must work with torch absent (SURVEY §7.5:
    conversion on TPU hosts without a torch install)."""
    import sys

    import torch

    sd = {
        "module.txt_ints.weight": torch.arange(12, dtype=torch.float32).reshape(3, 4),
        "module.txt_ints.bias": torch.zeros(3),
        "module.bn.num_batches_tracked": torch.tensor(5),  # buffer: skipped
        "module.not_a_tensor": 3,  # non-tensor: skipped
    }
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save(
        {"epoch": 9, "state_dict": sd},
        path,
        _use_new_zipfile_serialization=False,
    )

    monkeypatch.setitem(sys.modules, "torch", None)  # import torch -> ImportError
    params, meta = load_torch_checkpoint(path)
    assert meta["epoch"] == 9 and not meta["has_optimizer"]
    assert set(params) == {"txt_ints"}
    np.testing.assert_array_equal(
        params["txt_ints"]["kernel"],
        np.arange(12, dtype=np.float32).reshape(3, 4).T,
    )


def test_state_dict_malformed_key_error():
    from lirec_tpu.checkpoint.torch_import import params_from_torch_state_dict

    with pytest.raises(ValueError, match="unexpected checkpoint entry"):
        params_from_torch_state_dict({"dotless": np.zeros((2, 2))})
    with pytest.raises(ValueError, match="unexpected checkpoint entry"):
        params_from_torch_state_dict({"layer.unknown_kind": np.zeros((2, 2))})


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
