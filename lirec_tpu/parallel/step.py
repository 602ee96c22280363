"""Sharded train/eval steps over a device mesh.

Inputs are committed to their shardings with device_put (params per the TP
plan, batch over 'data', tables replicated); the step itself is a plain jit
— XLA propagates the shardings and inserts the collectives (gradient psum
over 'data', activation psum at row-parallel boundaries over 'model').
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import optax

from lirec_tpu.parallel import mesh as mesh_lib

__all__ = ["make_sharded_train_step", "ShardedTrainState"]

MODEL_KEYS = ("features", "feat_idx", "rels_mask")


class ShardedTrainState:
    """Holds mesh-committed params/opt_state/tables + the jitted step."""

    def __init__(self, bundle, tx, mesh, params, tables: Optional[Dict]):
        self.mesh = mesh
        self.tx = tx
        p_shard = mesh_lib.param_shardings(
            params, mesh, gates=bundle.spec.gates
        )
        self.params = mesh_lib.shard_tree(params, p_shard)
        self.tables = (
            mesh_lib.shard_tree(
                tables, mesh_lib.table_shardings(tables, mesh)
            )
            if tables is not None
            else None
        )
        # init under jit so Adam moments inherit the param shardings
        self.opt_state = jax.jit(tx.init)(self.params)
        self._step = _build_step(bundle, tx, mesh)

    def step(self, batch: Dict, rng, tr_sum_max_flag: bool = True):
        if not all(
            isinstance(leaf, jax.Array) for leaf in jax.tree.leaves(batch)
        ):
            # host batch: commit to the data axis. Multi-host feeding
            # instead passes pre-assembled global arrays
            # (mesh.global_batch_from_local), which skip this.
            batch = mesh_lib.shard_tree(
                batch, mesh_lib.batch_shardings(batch, self.mesh)
            )
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch, self.tables, rng,
            tr_sum_max_flag=tr_sum_max_flag,
        )
        return loss


def _build_step(bundle, tx, mesh=None):
    # opt_state donated: ShardedTrainState rebinds it every step and nothing
    # else holds the moments (see train/loop.make_train_step note)
    @functools.partial(
        jax.jit, static_argnames=("tr_sum_max_flag",), donate_argnums=(1,)
    )
    def step(params, opt_state, batch, tables, rng, tr_sum_max_flag=True):
        rng_drop, rng_loss = jax.random.split(rng)
        model_batch = {k: batch[k] for k in MODEL_KEYS if k in batch}

        def loss_fn(p):
            outputs = bundle.apply(
                p, model_batch, tables=tables,
                deterministic=False, rng=rng_drop, data_mesh=mesh,
            )
            return bundle.loss(
                outputs, batch, rng=rng_loss,
                tr_sum_max_flag=tr_sum_max_flag,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_train_step(bundle, tx, mesh, params, tables=None):
    return ShardedTrainState(bundle, tx, mesh, params, tables)
