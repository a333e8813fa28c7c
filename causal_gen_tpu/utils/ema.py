"""Exponential moving average of a parameter pytree.

Port target: reference src/utils.py:87-228 (EMA module with inverse-decay
warmup schedule). TPU-native redesign: the EMA is not a module wrapper but a
pure pytree-in/pytree-out update that lives inside the jitted train step, so
the shadow parameters ride along in the TrainState and the whole update fuses
into the step program (no host sync, no .item() calls).

Semantics preserved exactly:
- decay(step) = clamp(1 - (1 + epoch/inv_gamma)^-power, min_value, beta)
  with epoch = max(step - update_after_step - 1, 0); decay == 0 while
  epoch <= 0, which makes the update a straight copy (reference
  utils.py:167-177, 196-228).
- The reference reads the *post-increment* step counter inside
  update_moving_average (utils.py:178-194): update() stores step, increments,
  then get_current_decay uses the incremented value. ``ema_update`` therefore
  takes the 1-based update count.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import Array


def ema_decay(
    update_count: Array | int,
    beta: float = 0.999,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 1.0,
    min_value: float = 0.0,
) -> Array:
    """Current EMA decay given the (1-based) number of EMA updates performed."""
    epoch = jnp.clip(
        jnp.asarray(update_count, jnp.float32) - update_after_step - 1.0, min=0.0
    )
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    decay = jnp.clip(value, min=min_value, max=beta)
    return jnp.where(epoch <= 0.0, 0.0, decay)


def ema_update(
    ema_params: Any,
    params: Any,
    update_count: Array | int,
    beta: float = 0.999,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 1.0,
    min_value: float = 0.0,
) -> Any:
    """One EMA step: ema <- decay * ema + (1 - decay) * params (branchless)."""
    decay = ema_decay(
        update_count, beta, update_after_step, inv_gamma, power, min_value
    )
    return jax.tree.map(
        lambda e, p: (decay * e + (1.0 - decay) * p).astype(e.dtype),
        ema_params,
        params,
    )
