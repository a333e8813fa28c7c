"""Counterfactual fine-tuning CLI: merge 3 checkpoints -> train the DSCM.

Port target: reference src/pgm/train_cf.py:223-538 (main): load pgm /
predictor / vae checkpoints (each module rebuilt purely from the hparams
stored inside its checkpoint, train_cf.py:303-364), merge into the DSCM,
train with dual optimizers, periodic per-parent valid sweeps.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Counterfactual DSCM fine-tuning.")
    p.add_argument("--pgm_path", required=True)
    p.add_argument("--predictor_path", required=True)
    p.add_argument("--vae_path", required=True)
    p.add_argument("--exp_name", default="")
    p.add_argument("--data_dir", default="")
    p.add_argument("--save_dir", default="")
    p.add_argument("--resume", default="", help="CF checkpoint to resume")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap batches/epoch (smoke runs)")
    # None so a resume can distinguish "flag passed" from the default;
    # fresh runs fall back to 5000 (reference train_cf.py epoch budget)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=None,
                   help="weight decay; defaults to the VAE checkpoint's wd. "
                        "The reference CF launch overrides it to 0.1 "
                        "(pgm/run.sh:25-37)")
    p.add_argument("--lr_lagrange", type=float, default=1e-2)
    p.add_argument("--ema_rate", type=float, default=0.999)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--lmbda_init", type=float, default=0.0)
    p.add_argument("--damping", type=float, default=100.0)
    p.add_argument("--do_pa", default=None)
    p.add_argument("--eval_freq", type=int, default=None)  # fresh default 1
    p.add_argument("--cf_particles", type=int, default=1)
    p.add_argument("--accu_steps", type=int, default=None,
                   help="microbatches per update scanned inside one jitted "
                        "step (effective batch = bs, live activations = "
                        "bs/accu_steps)")
    p.add_argument("--steps_per_call", type=int, default=None,
                   help="full update steps per dispatch (lax.scan), the CF "
                        "analog of the HVAE trainer's knob")
    p.add_argument("--cf_remat", action="store_true", default=None,
                   help="rematerialize each HVAE pass in the CF backward "
                        "(fits bs=128 batch-on-lanes layouts at 192^2)")
    p.add_argument("--elbo_constraint", type=float, default=None,
                   help="eps; defaults to the stored best valid ELBO of the "
                        "VAE checkpoint (reference hard-codes the UKBB train "
                        "ELBO 1.8412..., train_cf.py:409)")
    p.add_argument("--thickness_weight", type=float, default=0.0,
                   help="differentiable measured-thickness penalty weight "
                        "(ops/soft_morph.py; Morpho-MNIST only)")
    p.add_argument("--intensity_weight", type=float, default=0.0,
                   help="differentiable measured-intensity penalty weight")
    p.add_argument("--calib_n", type=int, default=512,
                   help="train images used to fit the soft-thickness "
                        "calibration")
    return p


def build_pgm_from_ckpt(path: str, setup_predictors: bool):
    from causal_gen_tpu.pgm.flow_pgm import PGM_REGISTRY
    from causal_gen_tpu.pgm.train_pgm import load_pgm_checkpoint

    import dataclasses as dc

    cfg, state, extra = load_pgm_checkpoint(path)
    for prefix, cls in PGM_REGISTRY.items():
        if cfg.dataset.startswith(prefix):
            kw = dict(
                widths=tuple(cfg.widths),
                std_fixed=cfg.std_fixed,
                setup_predictors=setup_predictors,
                input_res=cfg.input_res,
                input_channels=cfg.input_channels,
            )
            fields = {f.name for f in dc.fields(cls)}
            return cfg, cls(**{k: v for k, v in kw.items() if k in fields}), state
    raise KeyError(cfg.dataset)


def main(argv: Optional[list] = None) -> None:
    from causal_gen_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    from causal_gen_tpu.data.datasets import setup_datasets
    from causal_gen_tpu.data.loader import setup_loaders
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.models.simple_vae import SimpleVAE
    from causal_gen_tpu.pgm.dscm import DSCM
    from causal_gen_tpu.pgm.train_cf import (
        CFConfig,
        cf_eval_epoch,
        cf_train_epoch,
        init_cf_state,
        cf_state_payload,
        load_cf_checkpoint,
        load_cf_meta,
        make_cf_eval_step,
        make_cf_multi_step,
        make_cf_train_step,
    )
    from causal_gen_tpu.train.checkpoint import (
        AsyncCheckpointWriter,
        load_checkpoint,
    )
    from causal_gen_tpu.train.experiment import (
        MetricWriter,
        setup_directories,
        setup_logging,
    )

    args, _ = build_parser().parse_known_args(argv)

    # rebuild each mechanism from its own checkpoint hparams
    pgm_cfg, pgm, pgm_state = build_pgm_from_ckpt(args.pgm_path, False)
    pred_cfg, predictor, pred_state = build_pgm_from_ckpt(args.predictor_path, True)
    vae_cfg, vae_state, vae_extra = load_checkpoint(args.vae_path)
    if args.data_dir:
        vae_cfg = vae_cfg.replace(data_dir=args.data_dir)
    vae = SimpleVAE(cfg=vae_cfg) if vae_cfg.vae == "simple" else HVAE(cfg=vae_cfg)

    eps = (
        args.elbo_constraint
        if args.elbo_constraint is not None
        else float(vae_extra.get("best_loss", 0.0))
    )
    cfg = CFConfig(
        seed=args.seed, epochs=args.epochs or 5000, bs=args.bs, lr=args.lr,
        lr_lagrange=args.lr_lagrange, ema_rate=args.ema_rate, alpha=args.alpha,
        lmbda_init=args.lmbda_init, damping=args.damping, do_pa=args.do_pa,
        eval_freq=args.eval_freq or 1, cf_particles=args.cf_particles,
        beta=vae_cfg.beta, grad_clip=vae_cfg.grad_clip,
        grad_skip=vae_cfg.grad_skip,
        wd=args.wd if args.wd is not None else vae_cfg.wd,
        betas=vae_cfg.betas,
        elbo_constraint=eps,
        thickness_weight=args.thickness_weight,
        intensity_weight=args.intensity_weight,
        accu_steps=args.accu_steps or 1,
        steps_per_call=args.steps_per_call or 1,
        cf_remat=bool(args.cf_remat),
    )
    save_dir = args.save_dir or os.path.join(
        "checkpoints", f"cf_{pgm_cfg.dataset}", args.exp_name or "default"
    )
    setup_directories(save_dir)
    logger = setup_logging(save_dir)
    writer = MetricWriter(save_dir)
    # async + rotated: the CF state carries the full HVAE params, so
    # serialization off the train thread matters here
    ckpt_writer = AsyncCheckpointWriter(save_dir)

    frozen = {"pgm": pgm_state.ema_params, "predictor": pred_state.ema_params}
    resume_path = ""
    start_epoch = 1
    if args.resume and os.path.exists(args.resume + ".meta.json"):
        # resume with both optimizer states (reference train_cf.py:460-471);
        # the checkpoint's config is authoritative (incl. morph weights +
        # stored thickness calibration). The arrays are restored further
        # down, once a template state exists (optax NamedTuple structure).
        resume_path = args.resume
        cfg, extra = load_cf_meta(resume_path)
        start_epoch = int(extra.get("epoch", 0)) + 1
        # run-control fields stay CLI-overridable on resume (the checkpoint's
        # own epoch budget would otherwise make extending a run a no-op);
        # model-defining fields remain checkpoint-authoritative
        run_overrides = {
            k: v for k, v in (
                ("epochs", args.epochs), ("eval_freq", args.eval_freq),
                # execution-shape knobs are run-control too: remat and
                # steps_per_call are numerically identical, accu_steps only
                # re-partitions the same effective batch
                ("accu_steps", args.accu_steps),
                ("steps_per_call", args.steps_per_call),
                ("cf_remat", args.cf_remat),
            ) if v is not None
        }
        if run_overrides:
            cfg = dataclasses.replace(cfg, **run_overrides)
        logger = setup_logging(save_dir)
        logger.info("resuming from %s at epoch %d", resume_path, start_epoch)

    # data comes from the PGM's variable set, not the VAE's (the DAG may
    # need attrs the VAE never sees, e.g. UKBB age; reference
    # train_cf.py:425-427 builds the CF dataloaders from pgm_args). UKBB
    # attrs load raw — preprocess_pgm_batch renormalizes to [-1,1] per batch
    # (reference train_pgm.py:41-46), and the DSCM's ukbb_preprocess shim
    # maps onward to the VAE's log-standard space.
    data_cfg = vae_cfg
    if pgm_cfg.parents_x:
        data_cfg = data_cfg.replace(parents_x=tuple(pgm_cfg.parents_x))
    if "ukbb" in vae_cfg.name:
        data_cfg = data_cfg.replace(context_norm="raw")
    datasets = setup_datasets(data_cfg)
    loaders = setup_loaders(datasets, cfg.bs, seed=cfg.seed, concat_pa=False, max_batches=args.max_batches)

    if cfg.thickness_weight > 0 and cfg.thickness_calib == (1.0, 0.0):
        # fit the soft-thickness affine calibration on real train images
        # (host, once; stored in the CF checkpoint config for resume)
        from causal_gen_tpu.ops.soft_morph import calibrate_soft_thickness

        imgs = datasets["train"].images[: args.calib_n]
        x01 = np.asarray(imgs, np.float32)[..., 0] / 255.0
        calib, fit_mae = calibrate_soft_thickness(x01)
        cfg = dataclasses.replace(cfg, thickness_calib=calib)
        logger.info("soft-thickness calib a=%.4f b=%.4f (fit MAE %.3f px)",
                    calib[0], calib[1], fit_mae)

    dscm = DSCM(
        cfg=vae_cfg, pgm=pgm, predictor=predictor, vae=vae,
        elbo_constraint=cfg.elbo_constraint, lmbda_init=cfg.lmbda_init,
        damping=cfg.damping, thickness_weight=cfg.thickness_weight,
        intensity_weight=cfg.intensity_weight,
        thickness_calib=tuple(cfg.thickness_calib),
        remat=cfg.cf_remat,
    )
    state = init_cf_state(cfg, dscm, vae_state.ema_params)
    if resume_path:
        _, state, _ = load_cf_checkpoint(resume_path, template_state=state)
    train_step = make_cf_train_step(cfg, dscm, frozen)
    multi_step = (
        make_cf_multi_step(cfg, dscm, frozen)
        if cfg.steps_per_call > 1 else None
    )
    eval_step = make_cf_eval_step(cfg, dscm, frozen)
    rng = jax.random.PRNGKey(cfg.seed)
    host_rng = np.random.default_rng(cfg.seed)
    dag_vars = tuple(pgm.dag_variables.keys())
    for epoch in range(start_epoch, cfg.epochs + 1):
        state, stats = cf_train_epoch(
            cfg, pgm_cfg, dscm, state, frozen, loaders["train"], train_step,
            rng, epoch, host_rng, multi_step=multi_step,
        )
        logger.info("epoch %d | %s", epoch, stats)
        writer.add_scalars(stats, epoch, prefix="train/")
        if epoch % cfg.eval_freq == 0:
            # persist BEFORE the (long) per-parent sweeps: a crash mid-sweep
            # must not lose the trained state the sweeps are evaluating
            ckpt_path = ckpt_writer.save(
                cf_state_payload(state),
                {"config": dataclasses.asdict(cfg), "extra": {"epoch": epoch}},
                step=int(jax.device_get(state.step)),
            )
            # per-parent valid sweeps do(pa_k) for each k + random
            # (reference train_cf.py:194-201, 487-497)
            for pa_k in dag_vars + (None,):
                ev, metrics = cf_eval_epoch(
                    cfg, pgm_cfg, dscm, state, frozen, loaders, eval_step,
                    jax.random.fold_in(rng, epoch), do_pa=pa_k,
                )
                logger.info("valid do(%s) | %s | %s", pa_k, ev, metrics)
                writer.add_scalars(metrics, epoch, prefix=f"valid_do_{pa_k}/")
                if pa_k is None:
                    # feed the random-intervention valid loss back so
                    # best-checkpoint retention matches the reference's
                    # save-on-best-valid (train_cf.py:510-517) despite the
                    # crash-safe pre-sweep save ordering
                    ckpt_writer.update_metric(ev["loss"], path=ckpt_path)
            # counterfactual panel from one valid batch: obs / cf / direct
            # effect / uncertainty (reference utils_pgm.py:93-286, written
            # every eval at train_cf.py:487-497)
            try:
                from causal_gen_tpu.pgm.train_cf import (
                    preprocess_pgm_batch, random_intervention,
                )
                from causal_gen_tpu.utils.plots import plot_cf

                raw = next(iter(loaders["valid"]))
                vbatch = preprocess_pgm_batch(pgm_cfg, raw)
                vdo = random_intervention(
                    np.random.default_rng(epoch), dag_vars, vbatch, cfg.do_pa
                )
                _, _, vcfs = eval_step(
                    state.ema_trainable, vbatch, vdo,
                    jax.random.fold_in(rng, 10**6 + epoch),
                )
                var = None
                if cfg.cf_particles > 1:
                    out = dscm.forward(
                        state.ema_trainable, frozen, vbatch, vdo,
                        jax.random.fold_in(rng, 10**6 + epoch),
                        cf_particles=cfg.cf_particles, beta=cfg.beta,
                    )
                    var = out.get("var_cf_x")
                plot_cf(
                    np.asarray(vbatch["x"]), np.asarray(vcfs["x"]),
                    None if var is None else np.asarray(var),
                    save_path=os.path.join(save_dir, f"cf_panel_{epoch}.png"),
                )
            except Exception as e:  # viz must never kill training
                logger.warning("cf panel failed: %s", e)
    if cfg.epochs % cfg.eval_freq != 0:
        # short runs with sparse eval cadence still persist a final state
        ckpt_writer.save(
            cf_state_payload(state),
            {"config": dataclasses.asdict(cfg), "extra": {"epoch": cfg.epochs}},
            step=int(jax.device_get(state.step)),
        )
    ckpt_writer.close()


if __name__ == "__main__":
    main()
