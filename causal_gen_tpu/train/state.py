"""Train state and optimizer construction.

Port targets: reference src/train_setup.py:42-53 (AdamW + linear-warmup
LambdaLR) and src/trainer.py checkpoint payload (156-167). TPU-native
redesign: all mutable training quantities (step counter, params, EMA shadow,
optimizer state) live in one flax.struct pytree that is donated to the jitted
step; nothing mutates host globals (the reference mutates ``args`` in the
loop, trainer.py:55).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from causal_gen_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # optimizer updates performed (0-based before first)
    ema_updates: jax.Array  # EMA update() calls performed (reference EMA.step)
    params: Any
    ema_params: Any
    opt_state: Any
    skipped: jax.Array  # cumulative skipped updates (trainer.py:78-85)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW + linear warmup, matching reference train_setup.py:42-53:
    AdamW(lr, betas, weight_decay) wrapped by LambdaLR(linear_warmup) so the
    effective lr at update k (0-based) is lr * min(1, k/warmup)."""

    def schedule(count):
        if cfg.lr_warmup_steps <= 0:
            return cfg.lr
        return cfg.lr * jnp.minimum(1.0, count / cfg.lr_warmup_steps)

    return optax.adamw(
        learning_rate=schedule,
        b1=cfg.betas[0],
        b2=cfg.betas[1],
        weight_decay=cfg.wd,
    )


def init_train_state(cfg: Config, params: Any) -> TrainState:
    opt = make_optimizer(cfg)

    # one jitted program instead of hundreds of eager zeros_like/copy
    # dispatches (each costs ~0.3s through a tunneled TPU backend)
    @jax.jit
    def build(p):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            ema_updates=jnp.zeros((), jnp.int32),
            params=p,
            # aliasing p is safe: everything downstream is functional
            ema_params=p,
            opt_state=opt.init(p),
            skipped=jnp.zeros((), jnp.int32),
        )

    return build(params)


def global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))
    )


def clip_by_global_norm(tree: Any, max_norm: float, norm: Optional[jax.Array] = None):
    """torch.nn.utils.clip_grad_norm_ semantics: scale by max_norm/(norm+1e-6)
    when norm > max_norm (reference trainer.py:67-69)."""
    if norm is None:
        norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, tree), norm
