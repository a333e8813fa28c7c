#!/usr/bin/env python
"""Counterfactual throughput: abduct-act-predict images/sec on one chip.

Second headline metric of BASELINE.json ("counterfactuals/sec"). Measures the
full DSCM pipeline — PGM counterfactual (flow inversion + mutilated forward),
HVAE latent abduction, two decoder passes, pixel-noise abduction — as one
jitted program on the morphomnist config.
"""

from __future__ import annotations

import json
import os
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.pgm.dscm import DSCM
    from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
    from causal_gen_tpu.train.vae_trainer import init_model_params

    bs = 256
    cfg = get_config("morphomnist", bs=bs)
    vae = HVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    vae_params = init_model_params(cfg, vae, rng)

    pgm = MorphoMNISTPGM(setup_predictors=False)
    predictor = MorphoMNISTPGM(setup_predictors=True, input_res=cfg.input_res)
    obs_attrs = {
        "thickness": jnp.zeros((bs, 1)),
        "intensity": jnp.zeros((bs, 1)),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[np.zeros(bs, np.int64)]),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pgm_params = pgm.init({"params": rng, "sample": rng}, obs_attrs)["params"]
        x0 = jnp.zeros((bs, cfg.input_res, cfg.input_res, 1))
        pred_params = predictor.init(
            {"params": rng, "sample": rng}, x0,
            method=predictor.anticausal_logprob, **obs_attrs,
        )["params"]
    dev = jax.devices()[0]
    pgm_params = jax.device_put(pgm_params, dev)
    pred_params = jax.device_put(pred_params, dev)

    dscm = DSCM(cfg=cfg, pgm=pgm, predictor=predictor, vae=vae)
    trainable = dscm.init_trainable(vae_params)
    frozen = {"pgm": pgm_params, "predictor": pred_params}

    host = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(host.uniform(-1, 1, (bs, 32, 32, 1)), jnp.float32),
        "thickness": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "intensity": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[host.integers(0, 10, bs)]),
    }
    do = {"thickness": jnp.full((bs, 1), 0.5)}

    fwd = jax.jit(
        lambda t, f, b, d, r: dscm.forward(t, f, b, d, r)["cfs"]["x"]
    )
    out = fwd(trainable, frozen, batch, do, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    for i in range(3):
        out = fwd(trainable, frozen, batch, do, jax.random.fold_in(rng, i))
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(trainable, frozen, batch, do, jax.random.fold_in(rng, 10 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "counterfactuals_per_sec_per_chip",
        "value": round(bs * iters / dt, 1),
        "unit": "counterfactuals/sec",
    }))


if __name__ == "__main__":
    main()
