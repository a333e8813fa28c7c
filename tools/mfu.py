#!/usr/bin/env python
"""MFU / step-breakdown report for a training config on the attached chip.

Reports ms/step (best + median over windows, pool-freeze tolerant), analytic
FLOPs/step from XLA's cost analysis, and model FLOPs utilization against the
chip's peak (v5e: 197 TFLOP/s bf16, 98.5 TFLOP/s f32 on the MXU).

Usage:
  python tools/mfu.py --hps ukbb192 --bs 96 [--beta 5 --z_max_res 96]
  python tools/mfu.py --hps morphomnist --bs 256 [--stage_scan] [--remat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()  # per-host fingerprinted dir (poisoned-cache fix)

V5E_PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def main() -> None:
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.train.state import init_train_state
    from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

    p = argparse.ArgumentParser()
    p.add_argument("--hps", default="morphomnist")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--beta", type=float, default=None)
    p.add_argument("--z_max_res", type=int, default=None)
    p.add_argument("--stage_scan", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_min_res", type=int, default=None)
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--width_multiple", type=int, default=None,
                   help="round conv widths up to this multiple (lane-padding "
                        "study; changes capacity, so perf-variant only)")
    p.add_argument("--dtype", default=None)
    p.add_argument("--x_like", default=None,
                   help="likelihood override (e.g. shared_dmol for the "
                        "DMoL-bound Pallas comparison)")
    p.add_argument("--windows", type=int, default=12)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace_dir", default="",
                   help="also capture a jax profiler trace here")
    args = p.parse_args()

    kw = dict(bs=args.bs, accu_steps=1)
    for k in ("beta", "z_max_res", "dtype", "x_like", "remat_min_res",
              "width_multiple"):
        v = getattr(args, k)
        if v is not None:
            kw[k] = v
    if args.stage_scan:
        kw["stage_scan"] = True
    if args.remat:
        kw["remat"] = True
    if args.use_pallas:
        kw["use_pallas"] = True
    cfg = get_config(args.hps, **kw)

    model = HVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = init_model_params(cfg, model, rng)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    state = init_train_state(cfg, params)
    step = make_train_step(cfg, model, donate=False)

    x = np.random.randint(
        0, 256, (1, cfg.bs, cfg.input_res, cfg.input_res, cfg.input_channels),
        np.uint8,
    )
    pa = np.random.uniform(-1, 1, (1, cfg.bs, cfg.context_dim)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "pa": jnp.asarray(pa)}

    t0 = time.perf_counter()
    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    # warmup
    new_state, m = compiled(state, batch, rng)
    jax.block_until_ready(m)

    dts = []
    k = 1
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            new_state, m = compiled(new_state, batch, jax.random.fold_in(rng, k))
            k += 1
        jax.block_until_ready(m)
        dts.append((time.perf_counter() - t0) / args.iters)

    device_ms = None
    if args.trace_dir:
        n_traced = 4
        with jax.profiler.trace(args.trace_dir):
            for _ in range(n_traced):
                new_state, m = compiled(new_state, batch, jax.random.fold_in(rng, k))
                k += 1
            # 1-element readback: the only sync the tunneled runtime honors
            float(np.asarray(jax.device_get(jax.tree.leaves(m)[0].reshape(-1)[0])))
        # device-plane module time: immune to tunnel pipelining/contention
        # (tools/device_time.py has the methodology + validation)
        from tools.device_time import module_ms

        device_ms = module_ms(args.trace_dir, "train_step") / n_traced

    best, med = min(dts), float(np.median(dts))
    peak = V5E_PEAK_FLOPS.get(cfg.dtype, V5E_PEAK_FLOPS["float32"])
    report = {
        "hps": args.hps,
        "bs": cfg.bs,
        "dtype": cfg.dtype,
        "stage_scan": cfg.stage_scan,
        "remat": cfg.remat,
        "use_pallas": cfg.use_pallas,
        "params_m": round(n_params / 1e6, 2),
        "compile_s": round(compile_s, 1),
        "ms_per_step_best": round(best * 1e3, 2),
        "ms_per_step_median": round(med * 1e3, 2),
        "img_per_sec_best": round(cfg.bs / best, 1),
        "flops_per_step_g": round(flops / 1e9, 1),
        "mfu_best_pct": round(100.0 * flops / best / peak, 1) if flops else None,
        "pool_contended": bool(med / best > 1.5),
    }
    if device_ms:
        report["ms_per_step_device"] = round(device_ms, 2)
        report["img_per_sec_device"] = round(cfg.bs / (device_ms / 1e3), 1)
        report["mfu_device_pct"] = (
            round(100.0 * flops / (device_ms / 1e3) / peak, 1) if flops else None
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
