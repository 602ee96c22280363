"""Functional layers over parameter pytrees.

Linear layers store ``kernel [in, out]`` (the transpose of torch's
``weight``) and use torch-compatible default init — uniform
(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kernel and bias — so converted
reference checkpoints and freshly-initialized models share statistics.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["init_linear", "linear", "DropoutRng", "dropout", "compute_dtype"]

Params = Dict[str, jnp.ndarray]


def compute_dtype(spec):
    """Matmul input dtype for a ModelSpec ('bfloat16' -> jnp.bfloat16,
    anything else -> None = keep input dtype)."""
    return jnp.bfloat16 if spec.compute_dtype == "bfloat16" else None


def init_linear(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(
            kkey, (in_dim, out_dim), dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            bkey, (out_dim,), dtype, minval=-bound, maxval=bound
        ),
    }


def linear(params: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    kernel, bias = params["kernel"], params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    return y + bias.astype(y.dtype)


class DropoutRng:
    """Splits one base key into per-call dropout keys (call-order stable)."""

    def __init__(self, key: Optional[jax.Array]):
        self.key = key
        self._n = 0

    def next(self) -> Optional[jax.Array]:
        if self.key is None:
            return None
        self._n += 1
        return jax.random.fold_in(self.key, self._n)


def dropout(
    x: jnp.ndarray, rate: float, rng: DropoutRng, deterministic: bool
) -> jnp.ndarray:
    """Inverted dropout matching torch semantics (scale 1/(1-p) at train).

    With a typed key (the rbg fast-PRNG default, train/loop.py) the mask
    comes from 16-bit random words — a quarter of the RNG bit traffic of
    the f32-uniform bernoulli, measured ~18% off the train step's dropout
    cost. Keep probability granularity is 1/65536 (|Δp| < 4e-6 — well
    inside the train path's distributional-equivalence bar, PARITY.md).
    Legacy uint32 keys (--strict-prng) keep the exact r1 bernoulli stream.
    """
    if deterministic or rate == 0.0:
        return x
    key = rng.next()
    keep = 1.0 - rate
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint16)
        thresh = min(round(keep * 65536.0), 65535)  # avoid uint16 wrap
        mask = bits < jnp.uint16(thresh)
    else:
        mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
