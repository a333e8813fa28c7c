"""Counterfactual-effectiveness evaluation CLI.

Port target: notebooks/eval_example.ipynb as a script — load the three
checkpoints, sweep interventions over the test set, report per-variable
predicted metrics and (Morpho-MNIST) measured morphometric MAEs with
multi-seed mean+-std.

Usage:
  python -m causal_gen_tpu.cli.evaluate --pgm_path ... --predictor_path ...
      --vae_path ... --data_dir ... [--do_pa thickness] [--seeds 0 1 2]
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np


def main(argv: Optional[list] = None) -> None:
    from causal_gen_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    from causal_gen_tpu.cli.train_cf import build_pgm_from_ckpt
    from causal_gen_tpu.data.datasets import setup_datasets
    from causal_gen_tpu.data.loader import Loader
    from causal_gen_tpu.eval.cf_eval import eval_cf_loop
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.models.simple_vae import SimpleVAE
    from causal_gen_tpu.train.checkpoint import load_checkpoint

    p = argparse.ArgumentParser(description="Counterfactual effectiveness eval.")
    p.add_argument("--pgm_path", required=True)
    p.add_argument("--predictor_path", required=True)
    p.add_argument("--vae_path", required=True)
    p.add_argument("--cf_path", default="",
                   help="optional CF fine-tuning checkpoint; evaluates its "
                        "EMA fine-tuned VAE weights instead of the raw VAE's")
    p.add_argument("--data_dir", default="")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--do_pa", default=None)
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--no_measure", action="store_true",
                   help="skip morphometric re-measurement")
    p.add_argument("--te_cf", action="store_true",
                   help="cond_prior total-effect path: abduct the latent "
                        "mediator via the alpha-mixture (vae.py:480-514)")
    p.add_argument("--abduct_alpha", type=float, default=0.65)
    args, _ = p.parse_known_args(argv)

    pgm_cfg, pgm, pgm_state = build_pgm_from_ckpt(args.pgm_path, False)
    pred_cfg, predictor, pred_state = build_pgm_from_ckpt(args.predictor_path, True)
    vae_cfg, vae_state, _ = load_checkpoint(args.vae_path)
    if args.data_dir:
        vae_cfg = vae_cfg.replace(data_dir=args.data_dir)
    vae = SimpleVAE(cfg=vae_cfg) if vae_cfg.vae == "simple" else HVAE(cfg=vae_cfg)

    vae_params = vae_state.ema_params
    if args.cf_path:
        # post-CF protocol: the fine-tuned VAE lives in the CF checkpoint's
        # EMA trainable tree {"vae": params, "lmbda": ...}
        from causal_gen_tpu.pgm.train_cf import load_cf_checkpoint

        _, cf_state, cf_extra = load_cf_checkpoint(args.cf_path)
        vae_params = cf_state.ema_trainable["vae"]
        print(f"evaluating CF fine-tuned VAE from {args.cf_path} "
              f"(epoch {cf_extra.get('epoch')})")

    # load the PGM's full variable set; UKBB attrs in [-1,1] (the PGM parent
    # space eval_cf_loop feeds straight into pgm.counterfactual — the
    # reference notebook's dataloaders come from pgm/predictor args too)
    data_cfg = vae_cfg
    if getattr(pgm_cfg, "parents_x", ()):
        data_cfg = data_cfg.replace(parents_x=tuple(pgm_cfg.parents_x))
    if "ukbb" in vae_cfg.name:
        data_cfg = data_cfg.replace(context_norm="[-1,1]")
    datasets = setup_datasets(data_cfg)
    loader = Loader(
        datasets["test"], args.bs, shuffle=False, drop_last=False,
        concat_pa=False, max_batches=args.max_batches,
    )
    train_attrs = {
        k: np.asarray(v) for k, v in datasets["train"].attrs.items()
    }
    results = eval_cf_loop(
        vae_cfg, vae, vae_params, pgm, pgm_state.ema_params,
        predictor, pred_state.ema_params, loader, train_attrs,
        seeds=tuple(args.seeds), do_pa=args.do_pa,
        measure=not args.no_measure, te_cf=args.te_cf, alpha=args.abduct_alpha,
    )
    # annotate expected-invariant rows: DAG variables the VAE is NOT
    # conditioned on (cfg.parents_x) cannot transfer through the image —
    # their rows measure PGM-only counterfactual consistency, and any
    # predicted-from-image metric is expected to be unchanged by CF
    # fine-tuning (e.g. ukbb192's `age`, and `sex` when not a parent).
    non_image_parents = sorted(
        set(pgm.dag_variables) - set(vae_cfg.parents_x)
    )
    print(json.dumps({
        "metrics": {
            k: {"mean": v[0], "std": v[1]} for k, v in results.items()
        },
        "units": ("physical (volumes in ml, age in years; "
                  "train_cf.py:63-108 conventions)"),
        "non_image_parents_expected_invariant": non_image_parents,
    }, indent=2))


if __name__ == "__main__":
    main()
