"""Optimizer matching the reference's torch Adam semantics.

torch.optim.Adam with ``weight_decay`` adds ``wd * param`` to the gradient
BEFORE the moment updates (unlike AdamW, which decays after). The optax
equivalent is add_decayed_weights -> scale_by_adam -> scale(-lr)
(ref mlp/model.py:599-601: Adam(lr=3e-5, weight_decay=1e-5)).
"""

from __future__ import annotations

import optax

__all__ = ["make_optimizer"]


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)
