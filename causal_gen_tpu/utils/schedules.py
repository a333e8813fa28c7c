"""Warmup schedules (reference src/utils.py:32-40) as jnp-friendly functions.

Both are pure functions of the step so they can be evaluated inside jit (the
reference mutates ``args.beta`` on the host each iteration, trainer.py:56-59).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def linear_warmup(step: Array | int, warmup_steps: int) -> Array:
    """lr/beta multiplier: step/warmup until warmup, then 1 (utils.py:32-35).

    Matches the reference's LambdaLR closure: f(it) = 1 if it > warmup else
    it/warmup, evaluated at the 1-based optimizer-step count.
    """
    step = jnp.asarray(step, jnp.float32)
    if warmup_steps <= 0:
        return jnp.ones_like(step)
    return jnp.where(step > warmup_steps, 1.0, step / warmup_steps)


def beta_anneal(beta: float, step: Array | int, anneal_steps: int) -> Array:
    """Quadratic KL-weight anneal (utils.py:38-40)."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.minimum(beta, (jnp.maximum(1e-11, step) / anneal_steps) ** 2)
