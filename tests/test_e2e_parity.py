"""Deepest golden oracle: the reference's FULL eval loop (mlp.test.testing
with a torch DataLoader over its dataset) vs our evaluate() — same synthetic
data, same transplanted weights — must produce identical metric dicts.

Composes the dataset/model/metric parity suites and additionally checks the
runner wiring (batch order, rels-subset derivation, reshapes, loss
averaging)."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.data import synthetic
from lirec_tpu.data.dataset import InteractionDataset, first_choice
from lirec_tpu.evaluation.runner import evaluate
from lirec_tpu.models.factory import create_model

from tests import reference_bridge as bridge

pytestmark = pytest.mark.skipif(
    not bridge.reference_available(), reason="/root/reference not mounted"
)


def _preset_cfg(synth_root, name, **kw):
    base = synthetic.make_config(synth_root)
    cfg = config_lib.preset(name, data_root=synth_root, **kw)
    return cfg.replace(dims=base.dims, paths=base.paths).with_runtime(
        compute_dtype="float32"
    )


def _transplant(ref, cfg, n_classes, n_rels, params):
    return bridge.transplant_params(ref, cfg, n_classes, n_rels, params)


@pytest.mark.parametrize("preset,mode", [
    ("modalities", "val"),
    ("int_rels", "val"),
    ("int_ch", "test"),
    ("int_rel_ch", "test"),
])
def test_full_eval_loop_parity(synth_root, preset, mode):
    cfg = _preset_cfg(synth_root, preset)
    bridge.import_reference()
    bridge.write_mg_pickle(cfg)
    bridge.configure_opt(cfg)
    ref = bridge.import_reference()

    with bridge.first_element_choice(), bridge.legacy_byte_masks():
        ref_ds = ref.dataset.MixedFeaturesDataset(mode=mode)
        ref_ds.cache()
        n_rels = 0
        if cfg.tasks.rels or cfg.tasks.rels_multitask:
            ref_ds.init_relships()
            n_rels = len(ref_ds.rels_list) - 1

        mine = InteractionDataset(cfg, mode=mode, label_chooser=first_choice)
        mine.cache()
        if cfg.tasks.rels or cfg.tasks.rels_multitask:
            mine.init_relships()

        bundle = create_model(cfg, mine.n_classes, n_rels=n_rels)
        ref_model = _transplant(
            ref, cfg, ref_ds.n_classes, n_rels, bundle.params
        )
        _, ref_loss_mod, _ = ref.model.create_model(
            ref_ds.n_classes, n_rels=n_rels
        )
        ref_out = ref.test.testing(
            ref_ds, ref_model, ref_loss_mod, mode=mode
        )

        my_out = evaluate(
            mine, bundle, bundle.params, cfg, mode=mode, verbose=False
        )

    # testing() returns the ModelSaver metric dict: total/ints[/rels]
    # [/tracks/joint] (ref mlp/test.py:138-145)
    for key in ref_out:
        assert key in my_out, key
        np.testing.assert_allclose(
            my_out[key], ref_out[key], atol=1e-5, rtol=1e-5,
            err_msg="%s/%s metric %r" % (preset, mode, key),
        )
