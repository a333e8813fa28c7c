#!/usr/bin/env python
"""Counterfactual throughput: abduct-act-predict images/sec on one chip.

Second headline metric of BASELINE.json ("counterfactuals/sec"). Measures the
full DSCM pipeline — PGM counterfactual (flow inversion + mutilated forward),
HVAE latent abduction, two decoder passes, pixel-noise abduction — as one
jitted program (reference src/pgm/dscm.py:30-95 is the engine measured).

Three configs:
  (default)        morphomnist 32x32, random-init params, bs=256
  --hps ukbb192    flagship 192x192 brain config (reference run_slurm.sh:22-37);
                   pass --vae_path/--pgm_path/--predictor_path to measure with
                   trained checkpoints (otherwise random init — identical
                   compute either way, checkpoints just make it the real model)
  --hps mimic192   flagship 192x192 chest config (reference run_slurm.sh:39-52):
                   ChestPGM DAG with the do(finding) intervention, so the
                   Gumbel-Max discrete abduction (exact truncated-Gumbel
                   posterior) is on the measured path
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from causal_gen_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()  # per-host fingerprinted dir (poisoned-cache fix)

import jax.numpy as jnp
import numpy as np


def _morphomnist_setup(bs: int):
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
    from causal_gen_tpu.train.vae_trainer import init_model_params

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

    host = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(host.uniform(-1, 1, (bs, 32, 32, 1)), jnp.float32),
        "thickness": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "intensity": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[host.integers(0, 10, bs)]),
    }
    do = {"thickness": jnp.full((bs, 1), 0.5)}
    return cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params, batch, do


def _ukbb192_setup(bs: int, vae_path: str, pgm_path: str, pred_path: str):
    """Flagship 192x192 DSCM (VERDICT r2 item 2: a current, driver-visible
    counterfactuals/sec at the reference's actual product resolution)."""
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.pgm.flow_pgm import FlowPGM
    from causal_gen_tpu.train.vae_trainer import init_model_params

    rng = jax.random.PRNGKey(0)
    if vae_path:
        from causal_gen_tpu.train.checkpoint import load_checkpoint

        cfg, vae_state, _ = load_checkpoint(vae_path)
        cfg = cfg.replace(bs=bs)
        vae = HVAE(cfg=cfg)
        vae_params = vae_state.ema_params
    else:
        cfg = get_config("ukbb192", bs=bs)
        vae = HVAE(cfg=cfg)
        vae_params = init_model_params(cfg, vae, rng)

    host = np.random.default_rng(0)
    # full PGM variable set in the [-1,1] PGM parent space (dscm.py maps to
    # the VAE's log-standard space internally via ukbb_preprocess)
    attrs = {
        "sex": jnp.asarray(host.integers(0, 2, (bs, 1)), jnp.float32),
        "mri_seq": jnp.asarray(host.integers(0, 2, (bs, 1)), jnp.float32),
        "age": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "brain_volume": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "ventricle_volume": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
    }
    if pgm_path:
        from causal_gen_tpu.cli.train_cf import build_pgm_from_ckpt

        _, pgm, pgm_state = build_pgm_from_ckpt(pgm_path, False)
        pgm_params = pgm_state.ema_params
        _, predictor, pred_state = build_pgm_from_ckpt(pred_path, True)
        pred_params = pred_state.ema_params
    else:
        pgm = FlowPGM(setup_predictors=False)
        predictor = FlowPGM(setup_predictors=True, input_res=cfg.input_res)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pgm_params = pgm.init({"params": rng, "sample": rng}, attrs)["params"]
            x0 = jnp.zeros((bs, cfg.input_res, cfg.input_res, 1))
            pred_params = predictor.init(
                {"params": rng, "sample": rng}, x0,
                method=predictor.anticausal_logprob, **attrs,
            )["params"]

    batch = {
        "x": jnp.asarray(
            host.uniform(-1, 1, (bs, cfg.input_res, cfg.input_res, 1)),
            jnp.float32,
        ),
        **attrs,
    }
    do = {"brain_volume": jnp.full((bs, 1), 0.5)}
    return cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params, batch, do


def _mimic192_setup(bs: int, vae_path: str, pgm_path: str, pred_path: str):
    """Second flagship family (VERDICT r3 item 1): the mimic192 DSCM with the
    ChestPGM DAG — do(finding) exercises Gumbel-Max discrete abduction
    (reference pgm/flow_pgm.py:533-710) at product resolution."""
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.pgm.flow_pgm import ChestPGM
    from causal_gen_tpu.train.vae_trainer import init_model_params

    rng = jax.random.PRNGKey(0)
    if vae_path:
        from causal_gen_tpu.train.checkpoint import load_checkpoint

        cfg, vae_state, _ = load_checkpoint(vae_path)
        cfg = cfg.replace(bs=bs)
        vae = HVAE(cfg=cfg)
        vae_params = vae_state.ema_params
    else:
        cfg = get_config("mimic192", bs=bs, z_max_res=96)  # run_slurm.sh:51
        vae = HVAE(cfg=cfg)
        vae_params = init_model_params(cfg, vae, rng)

    host = np.random.default_rng(0)
    attrs = {
        "age": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "race": jnp.asarray(
            np.eye(3, dtype=np.float32)[host.integers(0, 3, bs)]),
        "sex": jnp.asarray(host.integers(0, 2, (bs, 1)), jnp.float32),
        "finding": jnp.asarray(host.integers(0, 2, (bs, 1)), jnp.float32),
    }
    if pgm_path:
        from causal_gen_tpu.cli.train_cf import build_pgm_from_ckpt

        _, pgm, pgm_state = build_pgm_from_ckpt(pgm_path, False)
        pgm_params = pgm_state.ema_params
        _, predictor, pred_state = build_pgm_from_ckpt(pred_path, True)
        pred_params = pred_state.ema_params
    else:
        pgm = ChestPGM(setup_predictors=False)
        predictor = ChestPGM(setup_predictors=True, input_res=cfg.input_res)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pgm_params = pgm.init({"params": rng, "sample": rng}, attrs)["params"]
            x0 = jnp.zeros((bs, cfg.input_res, cfg.input_res, 1))
            pred_params = predictor.init(
                {"params": rng, "sample": rng}, x0,
                method=predictor.anticausal_logprob, **attrs,
            )["params"]

    batch = {
        "x": jnp.asarray(
            host.uniform(-1, 1, (bs, cfg.input_res, cfg.input_res, 1)),
            jnp.float32,
        ),
        **attrs,
    }
    do = {"finding": 1.0 - attrs["finding"]}  # flip the discrete mechanism
    return cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params, batch, do


def main() -> None:
    from causal_gen_tpu.pgm.dscm import DSCM

    p = argparse.ArgumentParser()
    p.add_argument("--hps", default="morphomnist",
                   choices=["morphomnist", "ukbb192", "mimic192"])
    p.add_argument("--bs", type=int, default=0, help="0 = config default")
    p.add_argument("--vae_path", default="")
    p.add_argument("--pgm_path", default="")
    p.add_argument("--predictor_path", default="")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--particles", type=int, default=1,
                   help="cf_particles: multi-particle mean + Var[X] "
                        "uncertainty map (reference dscm.py:58-72)")
    args = p.parse_args()

    rng = jax.random.PRNGKey(0)
    if args.hps == "ukbb192":
        bs = args.bs or 32
        (cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params,
         batch, do) = _ukbb192_setup(
            bs, args.vae_path, args.pgm_path, args.predictor_path)
    elif args.hps == "mimic192":
        bs = args.bs or 32
        (cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params,
         batch, do) = _mimic192_setup(
            bs, args.vae_path, args.pgm_path, args.predictor_path)
    else:
        bs = args.bs or 256
        (cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params,
         batch, do) = _morphomnist_setup(bs)

    dev = jax.devices()[0]
    pgm_params = jax.device_put(pgm_params, dev)
    pred_params = jax.device_put(pred_params, dev)
    vae_params = jax.device_put(vae_params, dev)

    dscm = DSCM(cfg=cfg, pgm=pgm, predictor=predictor, vae=vae)
    trainable = dscm.init_trainable(vae_params)
    frozen = {"pgm": pgm_params, "predictor": pred_params}

    def cf_forward(t, f, b, d, r):
        return dscm.forward(t, f, b, d, r,
                            cf_particles=args.particles)["cfs"]["x"]

    fwd = jax.jit(cf_forward)

    # PROFILER-DERIVED DEVICE TIMING (tools/device_time.py). Every
    # wall-clock variant of this bench was caught lying through the
    # tunneled shared-pool runtime: independent calls "measured" 25.8k cf/s
    # at 192^2, block_until_ready-synced chains 26.5k, and the readback-
    # synced (N+1 minus 1) difference 85k at bs=128 — all physically
    # impossible (a full DSCM forward is ~3 HVAE decoder passes; the train
    # step alone runs ~300 ms at this shape). The chip's own tracer records
    # per-module device durations that none of the tunnel's pipelining,
    # optimistic acks, or queue waits can distort.
    def call(x, k):
        return fwd(trainable, frozen, {**batch, "x": x}, do,
                   jax.random.fold_in(rng, k))

    from tools.device_time import device_ms_per_iter

    holder = {"x": batch["x"]}

    def dispatch(k):
        holder["x"] = call(holder["x"], k)
        return holder["x"]

    ms = device_ms_per_iter(dispatch, iters=args.iters, windows=3,
                            module_prefix="cf_forward", tag="bench_cf")
    print(json.dumps({
        "metric": f"counterfactuals_per_sec_per_chip_{args.hps}",
        "value": round(bs / (ms / 1e3), 1),
        "unit": "counterfactuals/sec",
        "device_ms_per_batch": round(ms, 2),
        "bs": bs,
        "particles": args.particles,
        "from_checkpoints": bool(args.vae_path),
    }))


if __name__ == "__main__":
    main()
