"""The packed on-device eval sweep must produce exactly the metric dict of
the host eval loop (which itself is golden-tested against the reference in
test_e2e_parity.py) — per preset, including odd batch remainders and the
reference's size-1 batch skip (ref test.py:38-39)."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.data import synthetic
from lirec_tpu.data.dataset import InteractionDataset
from lirec_tpu.evaluation.packed import evaluate_packed
from lirec_tpu.evaluation.runner import evaluate
from lirec_tpu.models.factory import create_model


def _preset_cfg(synth_root, name, batch_size, **kw):
    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset(name, data_root=synth_root, **kw)
    cfg = cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    )
    return cfg.replace(optim=cfg.optim.__class__(
        **{**cfg.optim.__dict__, "batch_size": batch_size}
    ))


@pytest.mark.parametrize("preset,mode,batch_size", [
    ("modalities", "val", 8),
    ("int_rels", "val", 8),
    ("int_ch", "test", 8),
    ("int_rel_ch", "test", 8),
    # odd remainders: exercise the tail dispatch and the size-1 skip
    ("int_rel_ch", "test", 16),
    ("int_rels", "val", 5),
])
def test_packed_matches_host_eval(synth_root, preset, mode, batch_size):
    cfg = _preset_cfg(synth_root, preset, batch_size)
    ds = InteractionDataset(cfg, mode=mode)
    ds.cache()
    n_rels = 0
    if cfg.tasks.rels or cfg.tasks.rels_multitask:
        ds.init_relships()
        # CLI convention (cli/common.py): model head excludes 'None'
        n_rels = max(len(ds.rels_list) - 1, 0)
    bundle = create_model(cfg, ds.n_classes, n_rels=n_rels)

    host = evaluate(ds, bundle, bundle.params, cfg, mode=mode, verbose=False)
    packed = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode=mode, verbose=False
    )
    assert set(host) == set(packed), (preset, host.keys(), packed.keys())
    for key in host:
        np.testing.assert_allclose(
            packed[key], host[key], rtol=1e-6, atol=1e-6,
            err_msg="%s/%s B=%d metric %r" % (preset, mode, batch_size, key),
        )


@pytest.mark.parametrize("tier", [True, "triple"])
@pytest.mark.parametrize("preset,mode", [
    ("int_rel_ch", "test"),  # maxtracks ctx path
    ("int_rels", "val"),     # plain ctx path
])
def test_packed_eval_ctx_localization_exact(synth_root, preset, mode, tier):
    """Forced eval ctx localization — per-table tier (localize_eval_ctx +
    ctx_uniq_* plumbing) and triple tier (localize_eval_ctx_triples +
    ctx_tidx/ctx_triples) — must reproduce the plain sweep's metric dict
    to ULP tolerance: gathering each batch's unique embedded rows and
    pooling local indices is the same math in the same HLO order (the
    triple fallback pools per segment to keep XLA's reduction shapes
    identical).

    Why ULP and not bitwise (the r4 flake, root-caused r5 — PARITY.md
    "eval-localization exactness"): XLA:CPU's LLVM backend vectorizes the
    R=18 pooling reduce DIFFERENTLY in the two (HLO-identical) fusion
    bodies — the localized one carries an extra inner gather — so the f32
    sums reassociate and differ in the last bit for ~all inputs
    (tools/probe_localize_codegen.py: 100/100 random trials). Whether a
    last-bit pool delta survives tanh/matmul into a metric depends on the
    data hitting a rounding boundary; PYTHONHASHSEED shuffles the
    dataset's string orderings enough that seed 30 (deterministically)
    moved `loss` by 1 ulp while most seeds don't. Integer counters are
    unaffected ordinarily; rtol=2e-6 keeps the test meaningful (a real
    localization bug — wrong rows, wrong mask — moves metrics by >1e-3)."""
    from lirec_tpu.ops import dispatch

    cfg = _preset_cfg(synth_root, preset, 8)
    ds = InteractionDataset(cfg, mode=mode)
    ds.cache()
    n_rels = 0
    if cfg.tasks.rels or cfg.tasks.rels_multitask:
        ds.init_relships()
        n_rels = max(len(ds.rels_list) - 1, 0)
    bundle = create_model(cfg, ds.n_classes, n_rels=n_rels)

    plain = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode=mode, verbose=False,
        localize_ctx=False,
    )
    localized = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode=mode, verbose=False,
        localize_ctx=tier,
    )
    rec = dispatch.last_dispatch("eval_ctx_localize")
    assert rec and rec["path"] == "on" and rec["reason"] == "forced"
    assert rec["shapes"]["tier"] == (
        "triple" if tier == "triple" else "tables"
    )
    assert set(plain) == set(localized)
    # on failure: emit the dispatch log + loc-cache state so the next
    # occurrence is diagnosable from the CI output alone (VERDICT r4 §1)
    diag = "dispatch=%r loc_cache_key=%r" % (
        rec, getattr(ds, "_eval_ctx_loc_cache", (None, None))[1],
    )
    for key in plain:
        np.testing.assert_allclose(
            np.asarray(localized[key]), np.asarray(plain[key]),
            rtol=2e-6, atol=1e-7,
            err_msg="%s/%s metric %r [%s]" % (preset, mode, key, diag),
        )
    # the cached analysis is reused on a second localized eval
    again = evaluate_packed(
        ds, bundle, bundle.params, cfg, mode=mode, verbose=False,
        localize_ctx=tier,
    )
    assert {k: float(v) for k, v in again.items()} == {
        k: float(v) for k, v in localized.items()
    }


def test_eval_localize_cost_model_gate():
    """Below the VMEM budget the auto policy is a measured cost model
    (r5 — BENCH.md 'r5 roofline': triple->matmul measured 345 vs 469
    us/batch of device time at real-split shapes): localize when the
    batch's unique-triple count U is small (structured real batches,
    U~2k at B=64), stay off when IID-like batches dedup to nothing and
    the one-hot matmul estimate blows past the kernel's 9.8 ns/entry."""
    from types import SimpleNamespace

    from lirec_tpu.evaluation.packed import _gate_local
    from lirec_tpu.ops import dispatch

    # packed-bf16 embedded ctx tables: int32, physical width 512 each
    ctx = SimpleNamespace(
        clip=np.zeros((12288, 512), np.int32),
        tr1=np.zeros((24576, 512), np.int32),
        tr2=np.zeros((24576, 512), np.int32),
    )
    full_bytes = 50 * 2**20  # below the 96 MiB budget
    B, n_full, T, R = 64, 20, 20, 18

    def loc_for(U):
        return {
            "ctx_tidx": np.zeros((B * n_full, T, R), np.int32),
            "triples": np.zeros((n_full, U, 3), np.int32),
            "feat_idx": np.zeros((B * n_full, T, R + 1), np.int32),
        }

    on = _gate_local(loc_for(2000), ctx, None, full_bytes, dispatch, B)
    rec = dispatch.last_dispatch("eval_ctx_localize")
    assert on is not None and rec["path"] == "on"
    assert rec["reason"].startswith("cost model"), rec
    assert rec["shapes"]["est_triple_us"] < rec["shapes"]["est_kernel_us"]

    off = _gate_local(loc_for(8000), ctx, None, full_bytes, dispatch, B)
    rec = dispatch.last_dispatch("eval_ctx_localize")
    assert off is None and rec["path"] == "off"
    assert rec["reason"].startswith("cost model"), rec

    # forced tiers bypass the model either way
    forced = _gate_local(loc_for(8000), ctx, "triple", full_bytes,
                         dispatch, B)
    assert forced is not None
    assert dispatch.last_dispatch("eval_ctx_localize")["reason"] == "forced"

    # f32 (non-packed) tables below the budget: the matmul tier never
    # engages at execution (gather_pool auto requires packed-bf16), so
    # the gate must not price it in — pricing min(mm, kr) here enabled
    # localizations that then ran the strictly-slower local gather kernel
    ctx_f32 = SimpleNamespace(
        clip=np.zeros((12288, 1024), np.float32),
        tr1=np.zeros((24576, 1024), np.float32),
        tr2=np.zeros((24576, 1024), np.float32),
    )
    off_f32 = _gate_local(loc_for(2000), ctx_f32, None, full_bytes,
                          dispatch, B)
    rec = dispatch.last_dispatch("eval_ctx_localize")
    assert off_f32 is None and rec["path"] == "off", rec


def test_packed_size1_tail_skip(synth_root):
    """When N % B == 1, both paths must drop the trailing sample."""
    cfg = _preset_cfg(synth_root, "int_ch", 4)
    ds = InteractionDataset(cfg, mode="test")
    ds.cache()
    N = len(ds)
    B = None
    for cand in range(2, N):
        if N % cand == 1:
            B = cand
            break
    if B is None:
        pytest.skip("no batch size yields a size-1 remainder for N=%d" % N)
    bundle = create_model(cfg, ds.n_classes)
    host = evaluate(
        ds, bundle, bundle.params, cfg, mode="test", verbose=False,
        batch_iterator=None,
    )
    cfg_b = cfg.replace(optim=cfg.optim.__class__(
        **{**cfg.optim.__dict__, "batch_size": B}
    ))
    host_b = evaluate(ds, bundle, bundle.params, cfg_b, mode="test",
                      verbose=False)
    packed_b = evaluate_packed(ds, bundle, bundle.params, cfg_b, mode="test",
                               verbose=False)
    for key in host_b:
        np.testing.assert_allclose(packed_b[key], host_b[key], rtol=1e-6,
                                   atol=1e-6, err_msg=key)
    # sanity: the skip actually changed the counts vs full-batch eval
    assert host_b["total"] != host["total"] or N % cfg.optim.batch_size == 1
