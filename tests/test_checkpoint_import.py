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


def test_orbax_roundtrip_sharded(tmp_path):
    """Orbax backend: params + opt_state + epoch round-trip with arrays
    sharded over the 8-device mesh (its reason to exist: multi-host
    checkpointing; ref utils/model_saver.py persistence surface)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from lirec_tpu.checkpoint import orbax_backend
    from lirec_tpu.parallel.mesh import make_mesh, param_shardings, shard_tree
    from lirec_tpu.train.optim import make_optimizer

    cfg = config_lib.preset("int_rel_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    bundle = create_model(cfg.with_runtime(compute_dtype="float32"), 7,
                          n_rels=6)
    mesh = make_mesh(shape=(4, 2))
    shardings = param_shardings(bundle.params, mesh, gates=True)
    params = shard_tree(bundle.params, shardings)
    tx = make_optimizer(1e-3, 1e-5)
    opt_state = jax.jit(tx.init)(params)

    path = str(tmp_path / "orbax_ckpt")
    orbax_backend.save(path, params, opt_state=opt_state, epoch=17)

    restored_p, restored_o, epoch = orbax_backend.restore(
        path, bundle.params, tx.init(bundle.params)
    )
    assert epoch == 17
    import numpy as np

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored_o)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_backend_cli_roundtrip(synth_root, tmp_path):
    """--checkpoint-backend orbax through the CLI: train writes Orbax
    directories, auto-resume and eval-resume read them back."""
    from lirec_tpu.cli.common import run_entry

    store = str(tmp_path / "store")
    dims = ["--text-dim", "16", "--visual-dim", "32", "--text-layers", "4",
            "--joint-dim", "16", "--compute-dtype", "float32"]
    args = ["--data-root", synth_root, "--store-root", store,
            "--batch-size", "8", "--quiet"] + dims
    out = run_entry(
        "int_ch",
        args + ["--train", "--epochs", "2", "--checkpoint-backend", "orbax",
                "--checkpoint-every", "1"],
    )
    assert len(out["train"]["losses"]) == 2
    import os

    assert os.path.isdir(os.path.join(store, "latest.ckpt"))
    assert os.path.isdir(os.path.join(store, "1.ckpt"))

    # continue training from the orbax latest.ckpt (auto-detected)
    out2 = run_entry(
        "int_ch",
        args + ["--train", "--epochs", "3", "--auto-resume",
                "--checkpoint-backend", "orbax"],
    )
    assert len(out2["train"]["losses"]) == 1  # epochs 2..2

    # eval-resume from the orbax final checkpoint (a directory)
    out3 = run_entry(
        "int_ch", args + ["--resume-path", os.path.join(store, "2.ckpt")]
    )
    for split in ("val", "test"):
        assert np.isfinite(out3[split]["loss"])


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


@pytest.mark.parametrize(
    "preset,ref_cls,n_rels",
    [
        ("modalities", "Modalities", 0),
        ("int_rels", "MidFusionMultiClip", 6),
        ("int_ch", "MidFusionMultiClipMaxTracks", 0),
        ("int_rel_ch", "MidFusionMultiClipMaxTracks", 6),
    ],
)
def test_convert_verify_cli(tmp_path, preset, ref_cls, n_rels):
    """`convert-checkpoint --verify` (SURVEY.md §7.5): synthesized torch
    checkpoints for every preset must convert AND pass the automatic
    activation comparison against the live torch reference."""
    import torch

    from lirec_tpu.cli import convert_checkpoint as cc

    cfg = config_lib.preset(preset, data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    torch.manual_seed(hash(preset) % 2**31)
    kwargs = {"n_classes": 7}
    if n_rels:
        kwargs["n_rels"] = n_rels
    ref_model = getattr(ref.model, ref_cls)(**kwargs).eval()
    src = str(tmp_path / "ckpt.pth.tar")
    torch.save(
        {"epoch": 1, "state_dict": ref_model.state_dict(), "optimizer": {}},
        src,
    )
    out = cc.main([
        "--src", src, "--dst", str(tmp_path / "out.ckpt"),
        "--verify", "--preset", preset, "--reference", bridge.REFERENCE,
    ])
    assert out["verify"] and max(out["verify"].values()) < 2e-5


def test_convert_verify_catches_corruption(tmp_path):
    """A tampered weight must FAIL --verify (the check is not vacuous)."""
    import torch

    from lirec_tpu.cli import convert_checkpoint as cc

    cfg = config_lib.preset("int_ch", data_root="/tmp/x")
    cfg = cfg.with_dims(text_dim=TEXT, visual_dim=VIS, joint_dim=JOINT)
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()
    torch.manual_seed(3)
    ref_model = ref.model.MidFusionMultiClipMaxTracks(n_classes=7).eval()
    sd = ref_model.state_dict()
    src = str(tmp_path / "ok.pth.tar")
    torch.save({"epoch": 1, "state_dict": sd, "optimizer": {}}, src)

    # verification compares src-through-us vs src-through-reference; to
    # simulate a conversion bug, monkeypatch the importer to corrupt one
    # kernel after conversion
    from lirec_tpu import checkpoint as ckpt_lib

    orig = ckpt_lib.load_torch_checkpoint
    calls = {"n": 0}

    def corrupting(path):
        params, meta = orig(path)
        calls["n"] += 1
        if calls["n"] == 2:  # the verify-side load
            params["out_ints"]["kernel"] = (
                params["out_ints"]["kernel"] + 0.01
            )
        return params, meta

    cc_mod = cc
    orig_in_cli = cc_mod.verify_checkpoint.__globals__  # same module ns
    import lirec_tpu.checkpoint

    lirec_tpu.checkpoint.load_torch_checkpoint, saved = (
        corrupting, lirec_tpu.checkpoint.load_torch_checkpoint
    )
    try:
        with pytest.raises(AssertionError):
            cc.main([
                "--src", src, "--dst", str(tmp_path / "out.ckpt"),
                "--verify", "--preset", "int_ch",
                "--reference", bridge.REFERENCE,
            ])
    finally:
        lirec_tpu.checkpoint.load_torch_checkpoint = saved
