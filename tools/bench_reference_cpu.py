#!/usr/bin/env python
"""Measure the reference PyTorch HVAE on THIS host's CPU, like-for-like with
our JAX HVAE on the same CPU — the one measured vs_baseline anchor available
without a GPU (VERDICT.md round-2 item 7).

What is measured (both implementations, identical protocol):
  - morphomnist HVAE config (reference run_local.sh:3-15 minus --cond_prior by
    default; pass --cond_prior to measure that variant), bs=32,
    AdamW(lr=1e-3, wd=0.01) + grad clip, full train step
    (forward + backward + clip + optimizer step), real t10k Morpho-MNIST
    images + real (thickness, intensity, digit) parents, no augmentation.
  - throughput: best/median window of `--iters` steps after warmup.
  - train ELBO (per-pixel nats) after `--steps` optimization steps, as a
    sanity anchor that both stacks are optimizing the same objective.

Implementations:
  --impl ref   : the reference torch model imported from /root/reference/src
                 (vae.py + hps.py only; no torchvision/pyro needed).
                 torch.set_num_threads(os.cpu_count()).
  --impl ours  : causal_gen_tpu on the CPU backend (JAX_PLATFORMS=cpu).

Usage:
  python tools/bench_reference_cpu.py --impl ref
  python tools/bench_reference_cpu.py --impl ours
Prints one JSON line per run. Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_batches(bs: int, n_batches: int):
    """Real t10k images (28->32 center pad) + [-1,1] parents, fixed order."""
    from causal_gen_tpu.data.datasets import MORPHOMNIST_MIN_MAX, load_morphomnist, one_hot_np
    from causal_gen_tpu.utils.normalization import normalize

    root = "/root/reference/datasets/morphomnist"
    images, labels, metrics = load_morphomnist(root, train=False, columns=["thickness", "intensity"])
    x = np.zeros((len(images), 32, 32), np.uint8)
    x[:, 2:30, 2:30] = images  # center pad 28 -> 32 (reference eval transform)
    pa = np.concatenate(
        [
            normalize(metrics["thickness"], *MORPHOMNIST_MIN_MAX["thickness"])[:, None],
            normalize(metrics["intensity"], *MORPHOMNIST_MIN_MAX["intensity"])[:, None],
            one_hot_np(labels, 10),
        ],
        axis=1,
    ).astype(np.float32)
    rng = np.random.RandomState(0)
    order = rng.permutation(len(x))
    x, pa = x[order], pa[order]
    batches = []
    for i in range(n_batches):
        s = (i * bs) % (len(x) - bs)
        batches.append((x[s : s + bs], pa[s : s + bs]))
    return batches


def run_windows(step_fn, batches, warmup: int, iters: int, budget_s: float):
    """Common timing protocol: warmup, then windows of `iters` steps."""
    for i in range(warmup):
        step_fn(batches[i % len(batches)], i)
    window_dts, elbos = [], []
    k = warmup
    t_start = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = step_fn(batches[k % len(batches)], k)
            k += 1
        window_dts.append(time.perf_counter() - t0)
        elbos.append(float(last))
        if time.perf_counter() - t_start > budget_s and len(window_dts) >= 4:
            break
    return window_dts, elbos, k


def bench_ref(args) -> dict:
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    sys.path.insert(0, "/root/reference/src")
    import hps as ref_hps  # noqa: E402
    import vae as ref_vae  # noqa: E402

    parser = argparse.ArgumentParser()
    ref_hps.add_arguments(parser)
    argv = [
        "--hps", "morphomnist",
        "--parents_x", "thickness", "intensity", "digit",
        "--context_dim", "12",
        "--concat_pa",
        "--lr", "0.001", "--bs", str(args.bs), "--wd", "0.01", "--beta", "1",
    ] + (["--cond_prior"] if args.cond_prior else [])
    sys.argv = ["bench"] + argv
    h = ref_hps.setup_hparams(parser)
    torch.manual_seed(0)
    model = ref_vae.HVAE(h)
    for m in model.modules():  # main.py:51-55 zero-bias init
        if isinstance(m, torch.nn.Conv2d) and m.bias is not None:
            torch.nn.init.zeros_(m.bias)
    opt = torch.optim.AdamW(model.parameters(), lr=h.lr, weight_decay=h.wd, betas=h.betas)
    model.train()

    batches = load_batches(args.bs, 64)

    def step(batch, it):
        x_np, pa_np = batch
        x = (torch.from_numpy(x_np[:, None].astype(np.float32)) - 127.5) / 127.5
        pa = torch.from_numpy(pa_np)[..., None, None].repeat(1, 1, 32, 32)
        out = model(x, pa, beta=h.beta)
        opt.zero_grad(set_to_none=True)
        out["elbo"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), h.grad_clip)
        opt.step()
        return out["elbo"].item()

    dts, elbos, total = run_windows(step, batches, args.warmup, args.iters, args.budget_s)
    return dict(impl="ref_torch_cpu", torch_threads=torch.get_num_threads(), dts=dts, elbos=elbos, steps=total)


def bench_ours(args) -> dict:
    # The axon TPU plugin overrides the JAX_PLATFORMS env var; the explicit
    # config update before first backend use is what actually forces CPU
    # (mirrors __graft_entry__.py:63-67).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp

    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.train.state import init_train_state
    from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

    cfg = get_config("morphomnist", bs=args.bs, cond_prior=args.cond_prior)
    model = HVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = init_model_params(cfg, model, rng)
    state = init_train_state(cfg, params)
    train_step = make_train_step(cfg, model)

    batches = load_batches(args.bs, 64)
    jbatches = [
        {"x": jnp.asarray(x[:, :, :, None][None]), "pa": jnp.asarray(pa[None])}
        for x, pa in batches
    ]

    holder = {"state": state}

    def step(_batch, it):
        b = jbatches[it % len(jbatches)]
        holder["state"], m = train_step(holder["state"], b, jax.random.fold_in(rng, it))
        jax.block_until_ready(m)
        return m["elbo"]

    dts, elbos, total = run_windows(step, batches, args.warmup, args.iters, args.budget_s)
    return dict(impl="ours_jax_cpu", backend=jax.default_backend(), dts=dts, elbos=elbos, steps=total)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", choices=["ref", "ours"], required=True)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--cond_prior", action="store_true")
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--iters", type=int, default=10, help="steps per timing window")
    p.add_argument("--budget_s", type=float, default=120.0)
    args = p.parse_args()

    out = bench_ref(args) if args.impl == "ref" else bench_ours(args)
    dts = out.pop("dts")
    per_window = [args.bs * args.iters / dt for dt in dts]
    out.update(
        bs=args.bs,
        cond_prior=args.cond_prior,
        windows=len(dts),
        img_per_sec_best=round(max(per_window), 2),
        img_per_sec_median=round(statistics.median(per_window), 2),
        elbo_last=round(out.pop("elbos")[-1], 4),
        host_cpus=os.cpu_count(),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
