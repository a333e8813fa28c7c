"""Checkpoint save/restore (Orbax).

Port target: reference checkpoint dicts {epoch, step, best_loss, model/ema/
optimizer state dicts, hparams} written on best validation loss
(trainer.py:156-168, train_pgm.py:533-546, train_cf.py:516-529). The hparams
stored inside the checkpoint are authoritative on reload (main.py:31-36) —
``load_checkpoint`` returns the Config rebuilt from the stored JSON so the
DSCM merge step can reconstruct each mechanism purely from its checkpoint
(train_cf.py:303-364).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from causal_gen_tpu.config import Config
from causal_gen_tpu.train.state import TrainState


def save_checkpoint(
    path: str,
    cfg: Config,
    state: TrainState,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    path = os.path.abspath(path)
    payload = {
        "params": jax.device_get(state.params),
        "ema_params": jax.device_get(state.ema_params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
        "ema_updates": int(jax.device_get(state.ema_updates)),
        "skipped": int(jax.device_get(state.skipped)),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    meta = {"config": cfg.to_dict(), "extra": extra or {}}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(
    path: str, template_state: Optional[TrainState] = None
) -> Tuple[Config, TrainState, Dict[str, Any]]:
    """Returns (config-from-checkpoint, state, extra).

    Param trees are plain dicts and restore structurally as-is; the OPTIMIZER
    state is a tree of optax NamedTuples whose structure orbax cannot recover
    without a template — pass ``template_state`` (a freshly-initialized
    TrainState for the same config) when the optimizer state must survive
    (training resume). Without it, opt_state comes back as raw nested dicts
    (fine for inference / DSCM merge which only reads params/ema_params)."""
    path = os.path.abspath(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    cfg = Config.from_dict(meta["config"])
    ckptr = ocp.PyTreeCheckpointer()
    if template_state is not None:
        item = {
            "params": jax.device_get(template_state.params),
            "ema_params": jax.device_get(template_state.ema_params),
            "opt_state": jax.device_get(template_state.opt_state),
            "step": 0,
            "ema_updates": 0,
            "skipped": 0,
        }
        payload = ckptr.restore(path, item=item)
    else:
        payload = ckptr.restore(path)
    import jax.numpy as jnp

    state = TrainState(
        step=jnp.asarray(payload["step"], jnp.int32),
        ema_updates=jnp.asarray(payload["ema_updates"], jnp.int32),
        params=payload["params"],
        ema_params=payload["ema_params"],
        opt_state=payload["opt_state"],
        skipped=jnp.asarray(payload.get("skipped", 0), jnp.int32),
    )
    return cfg, state, meta.get("extra", {})
