"""PGM / predictor training CLI.

Port target: reference src/pgm/train_pgm.py:313-567 (main).
Usage: python -m causal_gen_tpu.cli.train_pgm --dataset morphomnist
       --setup sup_pgm ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train PGM / anticausal predictors.")
    p.add_argument("--dataset", default="morphomnist")
    p.add_argument("--setup", default="sup_pgm",
                   choices=["sup_pgm", "sup_aux", "semi_sup"])
    p.add_argument("--exp_name", default="")
    p.add_argument("--data_dir", default="")
    p.add_argument("--save_dir", default="")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap batches/epoch (smoke runs)")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.1)
    p.add_argument("--input_res", type=int, default=32)
    p.add_argument("--input_channels", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--widths", nargs="+", type=int, default=[32, 32])
    p.add_argument("--parents_x", nargs="+", default=[])
    p.add_argument("--alpha", type=float, default=1e-3)
    p.add_argument("--std_fixed", type=float, default=0.0)
    p.add_argument("--sup_frac", type=float, default=1.0)
    p.add_argument("--corrupt_p", type=float, default=0.0,
                   help="cmnist train-label corruption fraction "
                        "(reference datasets.py:325)")
    p.add_argument("--context_norm", default=None,
                   help="dataset attr normalization; UKBB PGM training wants "
                        "'raw' (preprocess renormalizes to [-1,1] itself, "
                        "reference train_pgm.py:41-46)")
    return p


def build_pgm(cfg):
    import dataclasses as dc

    from causal_gen_tpu.pgm.flow_pgm import PGM_REGISTRY

    for prefix, cls in PGM_REGISTRY.items():
        if cfg.dataset.startswith(prefix):
            kwargs = dict(
                widths=tuple(cfg.widths),
                std_fixed=cfg.std_fixed,
                setup_predictors=(cfg.setup != "sup_pgm"),
                input_res=cfg.input_res,
                input_channels=cfg.input_channels,
            )
            fields = {f.name for f in dc.fields(cls)}
            return cls(**{k: v for k, v in kwargs.items() if k in fields})
    raise KeyError(cfg.dataset)


def main(argv: Optional[list] = None) -> None:
    from causal_gen_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.data.datasets import setup_datasets
    from causal_gen_tpu.data.loader import setup_loaders
    from causal_gen_tpu.pgm.train_pgm import PGMConfig, pgm_eval_metrics, train_pgm
    from causal_gen_tpu.train.experiment import (
        MetricWriter,
        setup_directories,
        setup_logging,
    )

    args, _ = build_parser().parse_known_args(argv)
    cfg = PGMConfig(
        dataset=args.dataset,
        setup=args.setup,
        seed=args.seed,
        epochs=args.epochs,
        bs=args.bs,
        lr=args.lr,
        wd=args.wd,
        input_res=args.input_res,
        input_channels=args.input_channels,
        eval_freq=args.eval_freq,
        widths=tuple(args.widths),
        parents_x=tuple(args.parents_x),
        alpha=args.alpha,
        std_fixed=args.std_fixed,
        sup_frac=args.sup_frac,
    )
    save_dir = args.save_dir or os.path.join(
        "checkpoints", f"{cfg.setup}_{cfg.dataset}", args.exp_name or "default"
    )
    setup_directories(save_dir)
    logger = setup_logging(save_dir)
    writer = MetricWriter(save_dir)
    writer.add_hparams(dataclasses.asdict(cfg))
    writer.add_layout({"loss": ["train_loss", "valid_loss"]})

    data_overrides = {"data_dir": args.data_dir}
    if args.parents_x:
        # the PGM's DAG may need attrs beyond the VAE's parents_x (e.g. UKBB
        # age); load the full variable set from the CSVs
        data_overrides["parents_x"] = tuple(args.parents_x)
    if args.context_norm:
        data_overrides["context_norm"] = args.context_norm
    if args.corrupt_p:
        data_overrides["corrupt_p"] = args.corrupt_p
    if cfg.dataset not in ("morphomnist", "cmnist"):
        data_overrides["input_res"] = args.input_res
    data_cfg = get_config(
        cfg.dataset if cfg.dataset in ("morphomnist", "cmnist") else
        ("ukbb64" if "ukbb" in cfg.dataset else "mimic192"),
        **data_overrides,
    )
    datasets = setup_datasets(data_cfg)
    loaders = setup_loaders(datasets, cfg.bs, seed=cfg.seed, concat_pa=False, max_batches=args.max_batches)

    model = build_pgm(cfg)
    if cfg.setup == "semi_sup":
        state, history = run_semi_sup(cfg, model, datasets, args, save_dir)
    else:
        state, history = train_pgm(cfg, model, loaders, save_dir=save_dir)
    writer.add_scalars(history, cfg.epochs)
    if cfg.setup != "sup_pgm":
        metrics = pgm_eval_metrics(cfg, model, state.ema_params, loaders["valid"])
        logger.info("eval metrics: %s", metrics)
        writer.add_scalars(metrics, cfg.epochs, prefix="eval/")
    if cfg.setup == "sup_pgm" and cfg.dataset == "morphomnist":
        # joint plot of sampled vs data morphometrics
        # (reference train_pgm.py:502-504; utils_pgm.py:58-90)
        from causal_gen_tpu.utils.plots import plot_joint

        samples = model.apply(
            {"params": state.ema_params}, 512, method=model.sample,
            rngs={"sample": jax.random.PRNGKey(cfg.seed)},
        )
        plot_joint(
            np.asarray(samples["thickness"]), np.asarray(samples["intensity"]),
            "pgm samples", save_path=os.path.join(save_dir, "joint_samples.png"),
        )
        dt = datasets["train"]
        plot_joint(
            dt.attrs["thickness"], dt.attrs["intensity"], "data",
            save_path=os.path.join(save_dir, "joint_data.png"),
        )


def run_semi_sup(cfg, model, datasets, args, save_dir):
    """Semi-supervised driver: labelled/unlabelled split + interleave epochs
    (reference train_pgm.py:287-306, 430-470)."""
    import jax as _jax
    import jax.numpy as jnp

    from causal_gen_tpu.data.loader import Loader
    from causal_gen_tpu.pgm.train_pgm import (
        PGMTrainState,
        make_pgm_optimizer,
        make_semi_sup_train_step,
        preprocess_pgm_batch,
        save_pgm_checkpoint,
        split_labelled_unlabelled,
        ss_train_epoch,
    )

    ds_l, ds_u = split_labelled_unlabelled(
        datasets["train"], cfg.sup_frac, seed=cfg.seed
    )
    loader_l = Loader(ds_l, cfg.bs, seed=cfg.seed, concat_pa=False,
                      max_batches=args.max_batches)
    loader_u = Loader(ds_u, cfg.bs, seed=cfg.seed + 1, concat_pa=False,
                      max_batches=args.max_batches)
    first = preprocess_pgm_batch(cfg, next(iter(loader_l)))
    obs = {k: v for k, v in first.items() if k in model.dag_variables}
    rng = _jax.random.PRNGKey(cfg.seed)
    params = model.init(
        {"params": rng, "sample": rng, "dropout": rng}, first["x"], obs,
        method=model.init_all,
    )["params"]
    state = PGMTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        ema_params=_jax.tree.map(jnp.copy, params),
        opt_state=make_pgm_optimizer(cfg).init(params),
    )
    import logging

    logger = logging.getLogger("causal_gen_tpu")
    step = make_semi_sup_train_step(cfg, model, n_labelled=len(ds_l))
    history = {}
    for epoch in range(1, cfg.epochs + 1):
        state, stats = ss_train_epoch(
            cfg, model, state, loader_l, loader_u, step, rng, epoch
        )
        history = {f"train_{k}": v for k, v in stats.items()}
        logger.info("ss epoch %d | %s", epoch, stats)
        if save_dir and epoch % cfg.eval_freq == 0:
            import os

            save_pgm_checkpoint(
                os.path.join(save_dir, "checkpoint"), cfg, state,
                extra={"epoch": epoch},
            )
    return state, history


if __name__ == "__main__":
    main()
