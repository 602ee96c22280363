#!/usr/bin/env python
"""Quickstart: generate a synthetic MovieGraphs-format drop, inspect the
graphs, run a short training, and evaluate — all through the public API
(the reference's `moviegraphs/py3loader/startup.py` demo counterpart).

    python examples/quickstart.py [workdir]
"""

import os.path as ops
import sys
import tempfile

sys.path.insert(0, ops.dirname(ops.dirname(ops.abspath(__file__))))

from lirec_tpu import config as config_lib
from lirec_tpu.data import annotations, graphs, synthetic, vocab
from lirec_tpu.data.dataset import InteractionDataset
from lirec_tpu.evaluation.runner import evaluate
from lirec_tpu.models.factory import create_model
from lirec_tpu.train.loop import train


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    print("== generating synthetic data at", root)
    base = synthetic.generate(root)

    print("== inspecting clip graphs")
    movies = graphs.load_graphs(base.paths.annotations)
    movie = movies["tt0108160"]
    clip = next(iter(movie.clip_graphs.values()))
    print("characters:", clip.get_characters())
    print("interaction triplets:",
          clip.find_all_triplets("interaction", return_names=True))
    print("occurrence census:", movie.count_occurrences().get("interaction"))

    print("== mining annotations")
    mined = annotations.mine_interactions(
        base.paths, movie_idxs=vocab.load_split(base.paths.split, "train"),
        with_rels=True,
    )
    print(mined.stats())

    print("== training the joint int+rel+grounding model (3 epochs)")
    cfg = (
        config_lib.preset("int_rel_ch", data_root=root)
        .replace(dims=base.dims, paths=base.paths, resume=False)
        .with_optim(epochs=3, batch_size=8)
        .with_runtime(compute_dtype="float32")
    )
    train_ds = InteractionDataset(cfg, mode="test")
    train_ds.cache()
    train_ds.init_relships()
    val_ds = InteractionDataset(cfg, mode="val")
    val_ds.cache()
    val_ds.init_relships()
    bundle = create_model(cfg, train_ds.n_classes, n_rels=train_ds.n_rels - 1)
    out = train(cfg, bundle, train_ds, val_dataset=val_ds, verbose=False)
    print("losses:", [round(x, 3) for x in out["losses"]])

    print("== evaluating")
    metrics = evaluate(val_ds, bundle, out["params"], cfg, mode="val")
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
