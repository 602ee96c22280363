"""Optimizer matching the reference's torch Adam semantics.

torch.optim.Adam with ``weight_decay`` adds ``wd * param`` to the gradient
BEFORE the moment updates (unlike AdamW, which decays after). The optax
equivalent is add_decayed_weights -> scale_by_adam -> scale(-lr)
(ref mlp/model.py:599-601: Adam(lr=3e-5, weight_decay=1e-5)).
"""

from __future__ import annotations

from typing import Optional

import optax

__all__ = ["make_optimizer", "step_decay_schedule"]


def step_decay_schedule(lr: float, decay_every: int, factor: float = 0.1):
    """lr * factor^(step // decay_every) — the schedule the reference's
    unused `adjust_lr` implements by hand (ref util_functions.py:266-271)."""
    return lambda step: lr * (factor ** (step // decay_every))


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
