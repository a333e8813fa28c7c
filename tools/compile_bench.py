#!/usr/bin/env python
"""Measure jit trace+lower+compile wall time for a config, stage_scan on/off.

The decoder's full Python unroll (70+ blocks on ukbb192/mimic192) produces
huge HLO that takes 20-40 min to compile through the tunneled backend;
stage_scan collapses same-shaped block runs into lax.scan bodies compiled
once (VERDICT round-1 item #6). This tool quantifies the saving:

  python tools/compile_bench.py --hps ukbb192 --bs 32 [--dtype bfloat16]
  python tools/compile_bench.py --hps ukbb192 --bs 32 --stage_scan [--remat]

Compilation caching is DISABLED here so the number is a true cold compile;
run each variant in a fresh process (XLA also keeps an in-process cache).
Reports trace/lower and backend-compile seconds plus HLO op count.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.train.state import init_train_state
    from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

    p = argparse.ArgumentParser()
    p.add_argument("--hps", default="ukbb192")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--dtype", default=None)
    p.add_argument("--stage_scan", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    kw = dict(bs=args.bs, accu_steps=1, stage_scan=args.stage_scan,
              remat=args.remat)
    if args.dtype:
        kw["dtype"] = args.dtype
    cfg = get_config(args.hps, **kw)
    model = HVAE(cfg=cfg)
    params = init_model_params(cfg, model, jax.random.PRNGKey(0))
    state = init_train_state(cfg, params)
    step = make_train_step(cfg, model, donate=False)
    batch = {
        "x": np.zeros((1, cfg.bs, cfg.input_res, cfg.input_res,
                       cfg.input_channels), np.uint8),
        "pa": np.zeros((1, cfg.bs, cfg.context_dim), np.float32),
    }
    rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    lowered = step.lower(state, batch, rng)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    try:
        n_hlo = len(lowered.as_text().splitlines())
    except Exception:
        n_hlo = -1
    print({
        "hps": args.hps, "bs": args.bs, "dtype": cfg.dtype,
        "stage_scan": args.stage_scan, "remat": args.remat,
        "trace_lower_s": round(t_lower, 1),
        "backend_compile_s": round(t_compile, 1),
        "stablehlo_lines": n_hlo,
        "backend": jax.default_backend(),
    })
    del compiled


if __name__ == "__main__":
    main()
