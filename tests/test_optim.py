"""Optimizer equivalence: the fused single-expression Adam must trace the
optax torch-Adam chain exactly (same math, one HBM pass per leaf)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lirec_tpu.train.optim import make_fused_adam, make_optimizer


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    return {
        "a": {"kernel": jax.random.normal(ks[0], (16, 8)),
              "bias": jax.random.normal(ks[1], (8,))},
        "b": {"kernel": jax.random.normal(ks[2], (8, 4)),
              "bias": jax.random.normal(ks[3], (4,))},
    }


@pytest.mark.parametrize("wd", [0.0, 1e-5])
def test_fused_adam_matches_optax_chain(wd):
    lr = 3e-5
    params_a = _tree()
    params_b = jax.tree.map(jnp.array, params_a)
    tx_a = make_optimizer(lr, wd)
    tx_b = make_fused_adam(lr, wd)
    state_a, state_b = tx_a.init(params_a), tx_b.init(params_b)

    @functools.partial(jax.jit, static_argnums=(0,))
    def step(tx_update, params, state, seed):
        grads = jax.tree.map(
            lambda p: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), p.size),
                p.shape,
            ),
            params,
        )
        updates, state = tx_update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for i in range(10):
        params_a, state_a = step(tx_a.update, params_a, state_a, i)
        params_b, state_b = step(tx_b.update, params_b, state_b, i)
    for pa, pb in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-9
        )
    # moments agree too (fused state: count/mu/nu; optax nests per-transform)
    adam_state = state_a[1 if wd else 0]
    for fa, fb in (("mu", adam_state.mu), ("nu", adam_state.nu)):
        for la, lb in zip(
            jax.tree.leaves(getattr(state_b, fa)), jax.tree.leaves(fb)
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-6, atol=1e-10
            )


def test_fused_adam_rejects_schedule():
    with pytest.raises(ValueError, match="float lr"):
        make_fused_adam(lambda step: 1e-3)
