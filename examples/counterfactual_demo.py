#!/usr/bin/env python
"""Interactive-style counterfactual generation demo.

The scripted equivalent of the reference's evaluation notebook / HF demo
(utils.py:231-258 cites counterfactual_inference() in the mira-causality
space): load the three trained mechanisms, pick test images, apply a named
intervention, and render an observation / counterfactual / direct-effect /
uncertainty panel.

Usage:
  python examples/counterfactual_demo.py \
      --pgm_path checkpoints/long_pgm/checkpoint \
      --predictor_path checkpoints/long_aux/checkpoint \
      --vae_path checkpoints/final_morpho2/checkpoint \
      --data_dir /root/reference/datasets/morphomnist \
      --do thickness=0.8 --out cf_panel.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_do(spec: str):
    k, v = spec.split("=")
    return k, float(v)


def main() -> None:
    from causal_gen_tpu.cli.train_cf import build_pgm_from_ckpt
    from causal_gen_tpu.data.datasets import setup_datasets
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.models.simple_vae import SimpleVAE
    from causal_gen_tpu.pgm.dscm import DSCM
    from causal_gen_tpu.train.checkpoint import load_checkpoint
    from causal_gen_tpu.utils.plots import plot_cf

    p = argparse.ArgumentParser()
    p.add_argument("--pgm_path", required=True)
    p.add_argument("--predictor_path", required=True)
    p.add_argument("--vae_path", required=True)
    p.add_argument("--data_dir", default="")
    p.add_argument("--do", nargs="+", required=True,
                   help="interventions, e.g. thickness=0.8 digit=3")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--particles", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="cf_panel.png")
    args = p.parse_args()

    from causal_gen_tpu.pgm.train_cf import preprocess_pgm_batch

    pgm_cfg, pgm, pgm_state = build_pgm_from_ckpt(args.pgm_path, False)
    _, predictor, pred_state = build_pgm_from_ckpt(args.predictor_path, True)
    vae_cfg, vae_state, _ = load_checkpoint(args.vae_path)
    if args.data_dir:
        vae_cfg = vae_cfg.replace(data_dir=args.data_dir)
    vae = SimpleVAE(cfg=vae_cfg) if vae_cfg.vae == "simple" else HVAE(cfg=vae_cfg)

    # data comes from the PGM's variable set, not the VAE's (the DAG may
    # need attrs the VAE never sees, e.g. UKBB age), and attrs go through
    # the SAME preprocessing the CF trainer uses — mirrors
    # cli/train_cf.py's loader setup (reference train_cf.py:425-427)
    data_cfg = vae_cfg
    if pgm_cfg.parents_x:
        data_cfg = data_cfg.replace(parents_x=tuple(pgm_cfg.parents_x))
    if "ukbb" in vae_cfg.name:
        data_cfg = data_cfg.replace(context_norm="raw")
    datasets = setup_datasets(data_cfg)
    raw = datasets["test"].batch(np.arange(args.n), concat_pa=False)
    obs = dict(preprocess_pgm_batch(pgm_cfg, raw))
    obs["x"] = (jnp.asarray(raw["x"], jnp.float32) - 127.5) / 127.5

    do = {}
    for spec in args.do:
        k, v = parse_do(spec)
        if k == "digit":
            do[k] = jnp.asarray(np.eye(10, dtype=np.float32)[[int(v)] * args.n])
        else:
            do[k] = jnp.full((args.n, 1), v, jnp.float32)

    dscm = DSCM(cfg=vae_cfg, pgm=pgm, predictor=predictor, vae=vae)
    trainable = dscm.init_trainable(vae_state.ema_params)
    frozen = {"pgm": pgm_state.ema_params, "predictor": pred_state.ema_params}
    out = dscm.forward(
        trainable, frozen, obs, do, jax.random.PRNGKey(args.seed),
        cf_particles=args.particles,
    )
    plot_cf(
        np.asarray(obs["x"]), np.asarray(out["cfs"]["x"]),
        var_cf_x=(np.asarray(out["var_cf_x"]) if out["var_cf_x"] is not None else None),
        num_images=args.n, save_path=args.out,
    )
    preds = {
        k: np.round(np.asarray(v), 3).tolist()[:3]
        for k, v in out["cfs"].items() if k != "x"
    }
    print(f"wrote {args.out}; counterfactual parents (first 3): {preds}")


if __name__ == "__main__":
    main()
