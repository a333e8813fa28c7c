#!/usr/bin/env python
"""Synthetic end-to-end drive of the full 3-stage workflow (HVAE -> PGM +
predictors -> DSCM counterfactual fine-tuning -> effectiveness eval) for the
UKBB and MIMIC dataset families.

The real datasets are not distributable, so this builds directory trees
mirroring the reference layouts (reference src/datasets.py:22-135, 392-531)
with CAUSALLY STRUCTURED synthetic content — attributes sampled from a ground
-truth SCM and images rendered as functions of those attributes — then drives
the actual CLIs in-process, exactly as a user would.

Usage (CPU, minutes):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/e2e_synth.py \
      --dataset ukbb --root /tmp/e2e_ukbb
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# Synthetic tree builders
# ---------------------------------------------------------------------------


def _save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(arr).save(path)


def _disk(res: int, cx: float, cy: float, r: float) -> np.ndarray:
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    return ((xx - cx) ** 2 + (yy - cy) ** 2 <= r**2).astype(np.float32)


def make_ukbb_tree(root: str, n_per_split: int = 96, seed: int = 0,
                   n_train: int = 0) -> None:
    """Brain-MRI-like tree: image = bright disk with radius ~ brain_volume
    and a dark inner disk ~ ventricle_volume; T2 (mri_seq=1) is brighter.
    SCM: sex,age exogenous; bvol = f(sex, age); vvol = f(bvol, age)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "brain_csv"), exist_ok=True)
    os.makedirs(os.path.join(root, "thumbs_192x192"), exist_ok=True)
    eid = 1000
    for split in ["train", "valid", "test"]:
        rows = []
        n_split = n_train if (split == "train" and n_train) else n_per_split
        for _ in range(n_split):
            sex = float(rng.integers(0, 2))
            mri_seq = float(rng.integers(0, 2))
            age = float(rng.uniform(44, 73))
            bvol = float(
                np.clip(
                    1.25e6 + 1.2e5 * sex - 4.5e3 * (age - 58)
                    + rng.normal(0, 4e4), 9e5, 1.6e6,
                )
            )
            vvol = float(
                np.clip(
                    3e4 + 0.04 * (bvol - 1.25e6) + 1.2e3 * (age - 58)
                    + rng.normal(0, 6e3), 8e3, 1.55e5,
                )
            )
            res = 192
            r_b = 40 + 50 * (bvol - 9e5) / 7e5
            r_v = 4 + 28 * (vvol - 8e3) / 1.47e5
            img = _disk(res, 96, 96, r_b) * (140 + 60 * mri_seq)
            img -= _disk(res, 96, 96, r_v) * (110 + 40 * mri_seq)
            img += rng.normal(0, 6, (res, res))
            name = (
                f"{eid}_{'T1' if mri_seq == 0.0 else 'T2_FLAIR'}"
                "_unbiased_brain_rigid_to_mni.png"
            )
            _save_png(
                os.path.join(root, "thumbs_192x192", name),
                np.clip(img, 0, 255).astype(np.uint8),
            )
            rows.append(dict(eid=eid, mri_seq=mri_seq, age=age,
                             brain_volume=bvol, ventricle_volume=vvol, sex=sex))
            eid += 1
        pd.DataFrame(rows).to_csv(
            os.path.join(root, "brain_csv", f"{split}.csv"), index=False
        )


def make_mimic_tree(root: str, n_per_split: int = 96, seed: int = 1,
                    n_train: int = 0, res: int = 64) -> None:
    """CXR-like tree: background brightness ~ age, a bright square marker if
    finding=1, left-third shading by race, border stripe by sex."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "meta"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    i = 0
    for split in ["train", "valid", "test"]:
        rows = []
        n_split = n_train if (split == "train" and n_train) else n_per_split
        for _ in range(n_split):
            sex = int(rng.integers(0, 2))
            race = int(rng.integers(0, 3))
            age = float(rng.uniform(20, 90))
            # finding depends on age (reference ChestPGM: finding | age)
            p_f = 1.0 / (1.0 + np.exp(-(age - 55) / 10))
            finding = int(rng.uniform() < p_f)
            img = np.full((res, res), 60 + age, np.float32)
            img[:, : res // 3] += 15 * race
            if sex:
                img[: max(4, res // 16), :] += 40.0
            if finding:
                img[3 * res // 8 : 5 * res // 8, 3 * res // 8 : 5 * res // 8] += 70.0
            img += rng.normal(0, 5, (res, res))
            fname = f"img_{split}_{i}.png"
            _save_png(os.path.join(root, "data", fname),
                      np.clip(img, 0, 255).astype(np.uint8))
            rows.append(dict(
                path_preproc=fname,
                disease="Pleural Effusion" if finding else "No Finding",
                age=age, sex_label=sex, race_label=race,
            ))
            i += 1
        pd.DataFrame(rows).to_csv(
            os.path.join(root, "meta", f"{split}.csv"), index=False
        )


# ---------------------------------------------------------------------------
# Stage drivers (in-process CLI mains)
# ---------------------------------------------------------------------------

TINY_ARCH = dict(
    ukbb=[
        "--input_res", "64",
        "--enc_arch", "64b1d2,32b1d2,16b1d2,8b1d2,4b1d4,1b1",
        "--dec_arch", "1b1,4b1,8b1,16b1,32b1,64b1",
        "--widths", "8", "8", "16", "16", "24", "24",
        "--z_dim", "4", "--bias_max_res", "64",
    ],
    mimic=[
        "--input_res", "64",
        "--enc_arch", "64b1d2,32b1d2,16b1d2,8b1d2,4b1d4,1b1",
        "--dec_arch", "1b1,4b1,8b1,16b1,32b1,64b1",
        "--widths", "8", "8", "16", "16", "24", "24",
        "--z_dim", "4", "--bias_max_res", "64",
    ],
)

PGM_VARS = dict(
    ukbb=["mri_seq", "age", "brain_volume", "ventricle_volume", "sex"],
    mimic=["age", "race", "sex", "finding"],
)


def run(dataset: str, root: str, out: str, epochs: int, bs: int,
        stages: str = "1234", flagship: bool = False, cf_epochs: int = 1,
        cf_bs: int = 0, cf_max_batches: int = 3, eval_freq: int = 1,
        vae_extra=(), cf_extra=()) -> None:
    from causal_gen_tpu.cli import evaluate as eval_cli
    from causal_gen_tpu.cli import main as vae_cli
    from causal_gen_tpu.cli import train_cf as cf_cli
    from causal_gen_tpu.cli import train_pgm as pgm_cli

    if flagship:
        # flagship resolution (VERDICT r2 item 1): the reference's actual
        # product configs — ukbb192 (run_slurm.sh:22-37: beta=5 z_max_res=96
        # wd=0.05) and mimic192 (run_slurm.sh:39-52: beta=9) — at full 192²,
        # registry arch, bf16 + stage_scan + remat.
        hps = "ukbb192" if dataset == "ukbb" else "mimic192"
        res = 192
    else:
        hps = "ukbb64" if dataset == "ukbb" else "mimic192"
        res = 64
    vae_dir = os.path.join(out, "vae")
    pgm_dir = os.path.join(out, "pgm")
    aux_dir = os.path.join(out, "aux")
    cf_dir = os.path.join(out, "cf")

    if "1" in stages:
        arch = "registry arch" if flagship else "tiny arch"
        print(f"== stage 1: HVAE ({hps}, {arch}) ==", flush=True)
        _stage1(vae_cli, hps, root, vae_dir, epochs, bs, dataset,
                flagship, eval_freq, vae_extra)
    if "2" in stages:
        _stage2(pgm_cli, dataset, root, pgm_dir, aux_dir, epochs, bs, res)
    if "3" in stages:
        _stage3(cf_cli, dataset, root, pgm_dir, aux_dir, vae_dir, cf_dir,
                cf_bs or min(bs, 16), cf_epochs, cf_max_batches, cf_extra,
                flagship=flagship)
    if "4" in stages:
        _stage4(eval_cli, dataset, root, pgm_dir, aux_dir, vae_dir,
                cf_bs or bs, cf_dir if "3" in stages or
                os.path.exists(cf_dir) else "")
    print(json.dumps({"e2e": dataset, "status": "ok", "out": out,
                      "flagship": flagship}))


def _stage1(vae_cli, hps, root, vae_dir, epochs, bs, dataset,
            flagship, eval_freq, vae_extra):
    if flagship:
        ref_flags = (
            ["--beta", "5", "--z_max_res", "96", "--wd", "0.05"]
            if dataset == "ukbb"
            # mimic192 launch (run_slurm.sh:39-52): beta=9 AND z_max_res=96 —
            # without the z cap the decoder carries stochastic blocks at full
            # 192² (posterior+prior heads on 64x192x192 maps) and the train
            # step needs 20.8G HBM at bs=128 / 15.9G at bs=96: over capacity
            # either way. With the reference cap it fits like ukbb192 does.
            else ["--beta", "9", "--z_max_res", "96", "--wd", "0.05"]
        )
        # selective remat (store <=24² activations) fits ukbb's light body;
        # mimic's FULL 4-conv GELU body stores more per block and OOMs at
        # bs=128 with remat_min_res 48 (and 96, and no-remat: 36.8G vs
        # 15.75G) — measured round 4, so mimic uses full remat (min_res 0)
        mr = "48" if dataset == "ukbb" else "0"
        argv = [
            "--hps", hps, "--data_dir", root, "--save_dir", vae_dir,
            "--epochs", str(epochs), "--eval_freq", str(eval_freq),
            "--bs", str(bs), "--viz_freq", "0",
            "--stage_scan", "--remat", "--remat_min_res", mr,
            # zero-init posterior heads: at 192² with ~70 stochastic blocks
            # the default init lands at huge KL and every update trips
            # grad_skip (measured: 16/16 steps skipped per epoch) — the same
            # init-KL deadlock vol3d hit (Config.posterior_init_scale)
            "--posterior_init_scale", "0.0",
            *ref_flags,
        ]
    else:
        argv = [
            "--hps", hps, "--data_dir", root, "--save_dir", vae_dir,
            "--epochs", str(epochs), "--eval_freq", "1", "--bs", str(bs),
            "--beta", "1.0", "--dtype", "float32", "--viz_freq", "0",
            *TINY_ARCH[dataset],
        ]
    extra = list(vae_extra)
    # auto-resume: a crashed/killed stage-1 restart must continue from the
    # orbax rotation instead of silently clobbering it (the trainer only
    # resumes when --resume is given)
    ckpt = os.path.join(vae_dir, "checkpoint")
    if "--resume" not in extra and os.path.exists(ckpt + ".meta.json"):
        print(f"== stage 1: auto-resuming from {ckpt} ==")
        extra += ["--resume", ckpt]
    vae_cli.main(argv + extra)


def _pgm_common(dataset, root, epochs, bs, res):
    common = [
        "--dataset", dataset, "--data_dir", root, "--bs", str(bs),
        "--input_res", str(res), "--epochs", str(4 * epochs), "--lr", "5e-3",
        "--parents_x", *PGM_VARS[dataset],
    ]
    if dataset == "ukbb":
        common += ["--context_norm", "raw"]
    return common


def _stage2(pgm_cli, dataset, root, pgm_dir, aux_dir, epochs, bs, res):
    common = _pgm_common(dataset, root, epochs, bs, res)
    print("== stage 2a: PGM (sup_pgm) ==", flush=True)
    pgm_cli.main(["--setup", "sup_pgm", "--save_dir", pgm_dir, *common])
    print("== stage 2b: predictors (sup_aux) ==", flush=True)
    pgm_cli.main(["--setup", "sup_aux", "--save_dir", aux_dir, *common])


def _stage3(cf_cli, dataset, root, pgm_dir, aux_dir, vae_dir, cf_dir, bs,
            cf_epochs, cf_max_batches, cf_extra=(), flagship=False):
    print("== stage 3: DSCM counterfactual fine-tuning ==", flush=True)
    argv = [
        "--pgm_path", os.path.join(pgm_dir, "checkpoint"),
        "--predictor_path", os.path.join(aux_dir, "checkpoint"),
        "--vae_path", os.path.join(vae_dir, "checkpoint"),
        "--data_dir", root, "--save_dir", cf_dir,
        "--epochs", str(cf_epochs), "--bs", str(bs),
        "--eval_freq", "1",
    ]
    if flagship:
        # reference CF launch (pgm/run.sh:25-37): lr=1e-4, wd=0.1, alpha=0.1,
        # do_pa=None -> a RANDOM DAG variable is intervened each step
        argv += ["--lr", "1e-4", "--wd", "0.1", "--alpha", "0.1"]
    else:
        # smoke tier: a fixed intervention keeps the 3-batch run deterministic
        do_pa = "brain_volume" if dataset == "ukbb" else "finding"
        argv += ["--do_pa", do_pa]
    if cf_max_batches:
        argv += ["--max_batches", str(cf_max_batches)]
    cf_cli.main(argv + list(cf_extra))


def _stage4(eval_cli, dataset, root, pgm_dir, aux_dir, vae_dir, bs,
            cf_dir=""):
    print("== stage 4: counterfactual effectiveness eval ==", flush=True)
    argv = [
        "--pgm_path", os.path.join(pgm_dir, "checkpoint"),
        "--predictor_path", os.path.join(aux_dir, "checkpoint"),
        "--vae_path", os.path.join(vae_dir, "checkpoint"),
        "--data_dir", root, "--bs", str(bs), "--max_batches", "2",
        "--seeds", "0", "1", "--no_measure",
    ]
    if cf_dir and os.path.exists(os.path.join(cf_dir, "checkpoint")):
        argv += ["--cf_path", os.path.join(cf_dir, "checkpoint")]
    eval_cli.main(argv)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["ukbb", "mimic"], required=True)
    p.add_argument("--root", default="")
    p.add_argument("--out", default="")
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--n_train", type=int, default=0,
                   help="train-split size override (0 = same as --n)")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--flagship", action="store_true",
                   help="full 192-squared registry configs (ukbb192/mimic192)"
                        " instead of the tiny 64-squared smoke arch")
    p.add_argument("--cf_epochs", type=int, default=1)
    p.add_argument("--cf_bs", type=int, default=0)
    p.add_argument("--cf_max_batches", type=int, default=3,
                   help="0 = full epoch")
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--vae_extra", default="",
                   help="extra flags forwarded to the stage-1 HVAE CLI, as "
                        "one space-separated string (argparse cannot accept "
                        "dash-tokens in nargs lists), e.g. "
                        "--vae_extra='--steps_per_call 4'")
    p.add_argument("--cf_extra", default="",
                   help="extra flags forwarded to the stage-3 CF CLI, e.g. "
                        "--cf_extra='--cf_remat --steps_per_call 4'")
    p.add_argument("--stages", default="1234",
                   help="subset of stages to run, e.g. '34' to reuse "
                        "existing stage-1/2 checkpoints")
    args = p.parse_args()
    suffix = "192" if args.flagship else ""
    root = args.root or f"/tmp/synth_{args.dataset}{suffix}"
    out = args.out or f"/tmp/e2e_{args.dataset}{suffix}"
    if not os.path.exists(root):
        print(f"building synthetic {args.dataset} tree at {root}", flush=True)
        if args.dataset == "ukbb":
            make_ukbb_tree(root, n_per_split=args.n, n_train=args.n_train)
        else:
            make_mimic_tree(root, n_per_split=args.n, n_train=args.n_train,
                            res=192 if args.flagship else 64)
    run(args.dataset, root, out, args.epochs, args.bs, stages=args.stages,
        flagship=args.flagship, cf_epochs=args.cf_epochs, cf_bs=args.cf_bs,
        cf_max_batches=args.cf_max_batches, eval_freq=args.eval_freq,
        vae_extra=args.vae_extra.split(), cf_extra=args.cf_extra.split())


if __name__ == "__main__":
    main()
