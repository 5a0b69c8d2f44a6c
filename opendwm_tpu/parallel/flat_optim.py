"""Flat fused AdamW — one update kernel over a single flat buffer.

Measured on TPU v5e (this repo's bench, 600M bf16 params): optax.adamw's
per-leaf transform chain takes ~3.7 s per update; the same math over one
concatenated buffer takes ~23 ms — the per-leaf graph defeats XLA fusion
and pays hundreds of HBM round trips. This module exposes the fused
version as an optax-compatible ``GradientTransformation`` so the trainer
pipelines can swap it in via ``optimizer_config {"flat": true}``:

- ``init`` ravels the param tree once and allocates flat moments
  (``mu_dtype``, default fp32).
- ``update`` ravels grads (one concat copy), runs the whole AdamW update
  as a handful of fused vector ops, and unravels the update tree back.

The extra ravel/unravel copies are O(param bytes) — microseconds per GB on
HBM — and the moments never leave flat form. Weight decay is decoupled
(AdamW), bias correction matches optax.scale_by_adam.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamWState(NamedTuple):
    count: jax.Array  # int32 scalar
    mu: jax.Array     # flat first moment
    nu: jax.Array     # flat second moment


def flat_adamw(
    learning_rate: Union[float, optax.Schedule] = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    mu_dtype: Optional[Any] = jnp.float32,
) -> optax.GradientTransformation:
    """AdamW over one flat buffer; drop-in for ``optax.adamw``."""

    if isinstance(mu_dtype, str):
        mu_dtype = jnp.dtype(mu_dtype)

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        dtype = mu_dtype or flat.dtype
        return FlatAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros(flat.shape, dtype),
            nu=jnp.zeros(flat.shape, dtype),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params (weight decay)")
        g, _ = ravel_pytree(updates)
        p, unravel = ravel_pytree(params)
        # optax.scale_by_schedule evaluates the schedule at the
        # PRE-increment count (first update uses schedule(0)); match that
        # so warmup schedules are not shifted by one step.
        lr = (
            learning_rate(state.count)
            if callable(learning_rate) else learning_rate
        )
        count = optax.safe_increment(state.count)
        gf = g.astype(jnp.float32)
        mu = b1 * state.mu.astype(jnp.float32) + (1.0 - b1) * gf
        nu = b2 * state.nu.astype(jnp.float32) + (1.0 - b2) * gf * gf
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        step = mu_hat / (jnp.sqrt(nu_hat) + eps)
        step = step + weight_decay * p.astype(jnp.float32)
        flat_update = (-lr * step).astype(p.dtype)
        dtype = mu_dtype or p.dtype
        return unravel(flat_update), FlatAdamWState(
            count=count, mu=mu.astype(dtype), nu=nu.astype(dtype)
        )

    return optax.GradientTransformation(init_fn, update_fn)
