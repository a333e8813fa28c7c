"""HVAE/VAE training CLI.

Port target: reference src/main.py (argparse + setup + trainer dispatch).
Usage: python -m causal_gen_tpu.cli.main --hps morphomnist --epochs 10 ...
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the image mechanism (HVAE/VAE).")
    p.add_argument("--hps", default="morphomnist", help="config registry name")
    p.add_argument("--exp_name", default="")
    p.add_argument("--data_dir", default="")
    p.add_argument("--save_dir", default="")
    p.add_argument("--resume", default="", help="checkpoint path to resume")
    p.add_argument("--seed", type=int)
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap batches/epoch (smoke runs)")
    p.add_argument("--epochs", type=int)
    p.add_argument("--bs", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--lr_warmup_steps", type=int)
    p.add_argument("--wd", type=float)
    p.add_argument("--beta", type=float)
    p.add_argument("--beta_warmup_steps", type=int)
    p.add_argument("--accu_steps", type=int)
    p.add_argument("--eval_freq", type=int)
    p.add_argument("--viz_freq", type=int)
    p.add_argument("--vae", choices=["hierarchical", "simple"])
    p.add_argument("--x_like", type=str)
    p.add_argument("--z_max_res", type=int)
    p.add_argument("--cond_prior", action="store_true", default=None)
    p.add_argument("--q_correction", action="store_true", default=None)
    p.add_argument("--kl_free_bits", type=float)
    # architecture overrides (reference hps.py:180-205 exposes the arch DSL)
    p.add_argument("--enc_arch", type=str)
    p.add_argument("--dec_arch", type=str)
    p.add_argument("--widths", nargs="+", type=int)
    p.add_argument("--input_res", type=int)
    p.add_argument("--pad", type=int)
    p.add_argument("--z_dim", type=int)
    p.add_argument("--bias_max_res", type=int)
    p.add_argument("--dtype", choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", action="store_true", default=None)
    p.add_argument("--stage_scan", action="store_true", default=None,
                   help="lax.scan decoder runs (faster big-config compiles)")
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize blocks (stage-level with --stage_scan)")
    p.add_argument("--remat_min_res", type=int,
                   help="only remat blocks at res >= this (high-res stages "
                        "carry the activation memory; skipping low-res "
                        "recompute is faster at the same HBM footprint)")
    p.add_argument("--width_multiple", type=int,
                   help="round conv widths up to a lane-friendly multiple")
    p.add_argument("--steps_per_call", type=int,
                   help="optimizer steps per jitted dispatch (amortizes "
                        "host<->device latency on tunneled backends)")
    p.add_argument("--posterior_init_scale", type=float,
                   help="init scale of posterior-head convs; 0 makes q==p "
                        "at init (KL exactly 0), escaping the init-KL "
                        "grad-skip deadlock on deep high-res stacks "
                        "(see Config.posterior_init_scale)")
    p.add_argument("--grad_clip", type=float)
    p.add_argument("--grad_skip", type=float,
                   help="skip the update when grad norm exceeds this "
                        "(reference hps.py:142)")
    return p


def main(argv: Optional[list] = None) -> None:
    from causal_gen_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.data.datasets import setup_datasets
    from causal_gen_tpu.data.loader import setup_loaders
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.models.simple_vae import SimpleVAE
    from causal_gen_tpu.train.checkpoint import load_checkpoint
    from causal_gen_tpu.train.experiment import (
        MetricWriter,
        setup_directories,
        setup_logging,
    )
    from causal_gen_tpu.train.vae_trainer import train
    from causal_gen_tpu.utils.viz import write_images

    args, _ = build_parser().parse_known_args(argv)
    overrides = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in vars(args).items()
        if v is not None
        and k not in ("hps", "resume", "save_dir", "exp_name", "max_batches")
        and v != ""
    }

    init_state = None
    if args.resume and os.path.exists(args.resume + ".meta.json"):
        # hparams stored in the checkpoint are authoritative (main.py:31-36);
        # rebuild a template state so the optimizer NamedTuples restore with
        # their structure intact
        import jax as _jax

        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params

        cfg, _, _ = load_checkpoint(args.resume)
        cfg = cfg.replace(**{k: v for k, v in overrides.items() if k in ("lr", "epochs", "data_dir", "eval_freq", "viz_freq")})
        _model = SimpleVAE(cfg=cfg) if cfg.vae == "simple" else HVAE(cfg=cfg)
        _params = init_model_params(cfg, _model, _jax.random.PRNGKey(cfg.seed))
        template = init_train_state(cfg, _params)
        cfg, init_state, extra = load_checkpoint(args.resume, template_state=template)
        cfg = cfg.replace(**{k: v for k, v in overrides.items() if k in ("lr", "epochs", "data_dir", "eval_freq", "viz_freq")})
    else:
        cfg = get_config(args.hps, **overrides)

    save_dir = args.save_dir or os.path.join(
        "checkpoints", cfg.name, args.exp_name or "default"
    )
    setup_directories(save_dir)
    logger = setup_logging(save_dir)
    writer = MetricWriter(save_dir)
    writer.add_hparams(cfg.to_dict())
    # train/valid multiline groups (reference train_setup.py:103-115)
    writer.add_layout({
        "nelbo": ["train_elbo", "valid_elbo"],
        "nll": ["train_nll", "valid_nll"],
        "kl": ["train_kl", "valid_kl"],
    })
    logger.info("devices: %s", jax.devices())

    datasets = setup_datasets(cfg)
    loaders = setup_loaders(datasets, cfg.bs, seed=cfg.seed, max_batches=args.max_batches)

    model = SimpleVAE(cfg=cfg) if cfg.vae == "simple" else HVAE(cfg=cfg)

    viz_batch = datasets["valid"].batch(
        np.arange(min(cfg.context_dim * 5, cfg.bs))
    )

    # viz_freq is in ITERATIONS (reference hps.py/trainer.py:89 semantics);
    # convert via the actual steps-per-epoch, not a hard-coded 1000
    steps_per_epoch = max(1, len(loaders["train"]))
    viz_epoch_freq = max(1, round(cfg.viz_freq / steps_per_epoch)) if cfg.viz_freq else 0

    # early-eval doubling cadence (reference trainer.py:89-91,124): extra viz
    # at iterations {start+1, start+2^n for n in 3..13} so samples appear
    # early in a fresh/resumed run. Our loop dispatches whole epochs, so an
    # epoch qualifies when any early iteration falls inside it.
    start_iter = int(init_state.step) if init_state is not None else 0
    early_iters = {start_iter + 1} | {start_iter + 2**n for n in range(3, 14)}

    def _is_early(epoch: int) -> bool:
        lo, hi = (epoch - 1) * steps_per_epoch, epoch * steps_per_epoch
        return any(lo < it <= hi for it in early_iters)

    def callback(epoch, state, history):
        writer.add_scalars(history, epoch)
        if viz_epoch_freq and (epoch % viz_epoch_freq == 0 or _is_early(epoch)):
            try:
                write_images(
                    cfg, model, state.ema_params, viz_batch,
                    os.path.join(save_dir, f"viz-{epoch}.png"),
                )
            except Exception as e:  # viz must never kill training
                logger.warning("viz failed: %s", e)

    state, history = train(
        cfg, model, loaders, save_dir=save_dir, callback=callback,
        init_state=init_state,
    )
    logger.info("done: %s", history)


if __name__ == "__main__":
    main()
