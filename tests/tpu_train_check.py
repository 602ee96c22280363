"""On-chip train-step sanity (run via `pytest -m tpu`).

The CPU suite exercises training in f32 only; the production train step
runs bf16 matmuls with bf16 first-layer activations (models/hybrid.py)
and uint16 rbg dropout masks. This drives 60 real optimizer steps on the
chip at the flagship dims and asserts the loss actually optimizes.

Exit codes: 0 ok, 3 no TPU backend (caller skips), 1 failure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("no TPU backend (got %r)" % jax.default_backend())
        return 3

    import jax.numpy as jnp
    import numpy as np

    from lirec_tpu import config as config_lib
    from lirec_tpu.models.factory import create_model
    from lirec_tpu.train.loop import make_train_step
    from lirec_tpu.train.optim import make_optimizer
    from lirec_tpu.utils.fake_batch import make_batch, make_tables

    cfg = config_lib.preset("int_rel_ch", data_root="/nonexistent")
    cfg = cfg.with_runtime(compute_dtype="bfloat16")
    bundle = create_model(cfg, 101, n_rels=15)
    tables = jax.tree.map(
        jnp.asarray, make_tables(bundle.spec, 512, 1024)
    )
    batch = make_batch(bundle.spec, 64, 512, 1024, seed=1)
    tx = make_optimizer(cfg.optim.lr * 30, cfg.optim.weight_decay)
    step = make_train_step(bundle, tx)
    params, opt_state = bundle.params, tx.init(bundle.params)
    base = jax.random.key(0, impl="rbg")

    losses = []
    for i in range(60):
        params, opt_state, loss = step(
            params, opt_state, batch, tables, jax.random.fold_in(base, i)
        )
        losses.append(float(loss))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all(), "non-finite loss on chip"
    assert last < 0.7 * first, (
        "loss did not optimize on chip: %.4f -> %.4f" % (first, last)
    )
    print("tpu train ok: loss %.4f -> %.4f over %d steps (bf16 + uint16 "
          "dropout masks)" % (first, last, len(losses)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
