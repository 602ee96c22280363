"""Optimizer matching the reference's torch Adam semantics.

torch.optim.Adam with ``weight_decay`` adds ``wd * param`` to the gradient
BEFORE the moment updates (unlike AdamW, which decays after). The optax
equivalent is add_decayed_weights -> scale_by_adam -> scale(-lr)
(ref mlp/model.py:599-601: Adam(lr=3e-5, weight_decay=1e-5)).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import optax

__all__ = ["make_optimizer", "make_fused_adam", "step_decay_schedule"]


def step_decay_schedule(lr: float, decay_every: int, factor: float = 0.1):
    """lr * factor^(step // decay_every) — the schedule the reference's
    unused `adjust_lr` implements by hand (ref util_functions.py:266-271)."""
    return lambda step: lr * (factor ** (step // decay_every))


class FusedAdamState(NamedTuple):
    count: object  # int32 scalar
    mu: object
    nu: object


def make_fused_adam(lr: float, weight_decay: float = 0.0,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """The same torch-Adam chain as `make_optimizer`, written as ONE
    per-leaf expression so XLA emits a single HBM pass per parameter
    (read p, g, mu, nu -> write mu, nu, update) instead of materializing
    the optax chain's intermediates (decayed grads, scaled updates).

    Numerically this is the optax chain's math verbatim — wd added to the
    grad BEFORE the moment updates (torch Adam, ref mlp/model.py:599-601),
    bias-corrected mu/nu, -lr scale — reassociated only at the
    multiply-add level. Float `lr` only (schedules: use make_optimizer).
    """
    import jax
    import jax.numpy as jnp

    if callable(lr):
        raise ValueError("make_fused_adam takes a float lr; use "
                         "make_optimizer for schedules")

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
        return FusedAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(grads, state, params=None):
        assert params is not None, "fused Adam needs params (weight decay)"
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def leaf(g, p, mu, nu):
            g = g.astype(mu.dtype)
            if weight_decay:
                g = g + weight_decay * p.astype(mu.dtype)
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * (g * g)
            upd = (-lr) * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            return mu, nu, upd.astype(p.dtype)

        gl, treedef = jax.tree.flatten(grads)
        pl = treedef.flatten_up_to(params)
        mul = treedef.flatten_up_to(state.mu)
        nul = treedef.flatten_up_to(state.nu)
        out = [leaf(g, p, m, n) for g, p, m, n in zip(gl, pl, mul, nul)]
        return (
            treedef.unflatten([o[2] for o in out]),
            FusedAdamState(
                count=count,
                mu=treedef.unflatten([o[0] for o in out]),
                nu=treedef.unflatten([o[1] for o in out]),
            ),
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(lr, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   schedule: Optional[object] = None):
    """torch-Adam-equivalent chain; `lr` may be a float or an optax
    schedule (or pass `schedule` explicitly)."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    lr_or_schedule = schedule if schedule is not None else lr
    steps.append(optax.scale_by_learning_rate(lr_or_schedule))
    return optax.chain(*steps)
