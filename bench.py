#!/usr/bin/env python
"""Benchmark: HVAE train throughput + counterfactual (abduct-act-predict)
throughput on one chip. Prints ONE JSON line:

  {"metric": "hvae_train_images_per_sec_per_chip", "value": N,
   "unit": "images/sec", "vs_baseline": N, ...,
   "counterfactuals_per_sec": {...}, "cpu_measured": {...}}

Baselines (see BASELINE.md):
  - vs_baseline divides by REFERENCE_IMG_PER_SEC, an ESTIMATE of the
    reference PyTorch pipeline on its own hardware (1x Tesla T4) — the repo
    publishes no numbers and no GPU exists on this host, so that anchor
    cannot be measured here. baseline_source says so explicitly.
  - cpu_measured is a MEASURED same-host anchor: the reference torch model
    vs this framework, both on this host's CPU, identical protocol
    (tools/bench_reference_cpu.py; constants below are its committed output,
    re-runnable any time). It is a secondary anchor (CPU, not TPU-vs-T4) but
    it is a real measured ratio.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache, keyed per host machine: XLA:CPU AOT entries
# compiled on a different machine type fail to load (cpu_aot_loader
# machine-feature mismatch, "could lead to SIGILL") — that poisoned-cache
# class nulled BENCH_r04. utils/cache.py scopes the dir by CPU-flags
# fingerprint so a new host starts clean instead of poisoned.
from causal_gen_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

# Reference anchor (PyTorch T4, morphomnist HVAE bs=32): ESTIMATE, see module
# docstring. The measured same-host CPU anchor is CPU_MEASURED below.
REFERENCE_IMG_PER_SEC = 700.0
BASELINE_SOURCE = "estimated (T4 never measured here; see cpu_measured for the measured same-host anchor)"

# Output of tools/bench_reference_cpu.py on this host (1-core CPU,
# 2026-08-19, bs=32 morphomnist, real t10k data, full train step):
#   ref : {"img_per_sec_best": 36.96, "img_per_sec_median": 33.71}
#   ours: {"img_per_sec_best": 7.38, "img_per_sec_median": 4.81}
# Honest reading: on a 1-core CPU the torch reference beats our XLA:CPU
# build 5x — this framework's compute path is designed for the TPU (where
# it runs 9,800+ img/s); XLA:CPU is not a target. Recorded so the bench
# JSON carries at least one fully measured same-host ratio (BASELINE.md).
CPU_MEASURED = {
    "ref_torch_img_per_sec": 36.96,
    "ours_jax_img_per_sec": 7.38,
    "ours_vs_ref_same_host": 0.2,
    "host": "1-core CPU, bs=32, tools/bench_reference_cpu.py",
    "note": "XLA:CPU loses to torch CPU on these tiny convs; TPU is the target backend",
}


def measure_windows(step, iters: int, budget_s: float, max_windows: int = 40,
                    min_windows: int = 6):
    """Best/median window timing under a wall-clock budget.

    The attached chip is a shared pool with bursty external load (measured
    ~3x run-to-run variance, occasional multi-minute freezes). Sample many
    short windows and report the BEST (approximates uncontended device
    throughput) plus median and a contention flag, so one frozen window
    cannot sink the number.
    """
    window_dts = []
    k = 10
    t_start = time.perf_counter()
    while len(window_dts) < max_windows:
        t0 = time.perf_counter()
        for _ in range(iters):
            step(k)
            k += 1
        window_dts.append(time.perf_counter() - t0)
        if time.perf_counter() - t_start > budget_s and len(window_dts) >= min_windows:
            break
    return window_dts


def bench_hvae_train(budget_s: float) -> dict:
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.train.state import init_train_state
    from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

    bs = 256  # large per-chip batch to fill the MXU
    cfg = get_config("morphomnist", bs=bs)
    model = HVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = init_model_params(cfg, model, rng)
    state = init_train_state(cfg, params)
    train_step = make_train_step(cfg, model)

    x = np.random.randint(0, 256, (1, bs, 32, 32, 1), np.uint8)
    pa = np.random.uniform(-1, 1, (1, bs, cfg.context_dim)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "pa": jnp.asarray(pa)}

    holder = {"state": state}

    def step(k):
        holder["state"], m = train_step(holder["state"], batch, jax.random.fold_in(rng, k))
        return m

    # compile + warmup
    jax.block_until_ready(step(1))
    for i in range(2, 5):
        m = step(i)
    jax.block_until_ready(m)

    iters = 10

    def timed(k):
        m = step(k)
        if (k + 1) % iters == 0:
            jax.block_until_ready(m)

    dts = measure_windows(timed, iters, budget_s)
    best, med = min(dts), float(np.median(dts))

    # cross-check: device time from the chip's own tracer (immune to tunnel
    # pipelining/contention artifacts — tools/device_time.py). The donated
    # chained train step is naturally serialized, so wall-clock windows are
    # usually honest here; the device number is the floor check.
    from tools.device_time import device_ms_per_iter

    dev_ms = device_ms_per_iter(step, iters=10, windows=2,
                                module_prefix="train_step", tag="bench_train")
    return {
        "metric": "hvae_train_images_per_sec_per_chip",
        "value": round(bs * iters / best, 1),
        "unit": "images/sec",
        "vs_baseline": round(bs * iters / best / REFERENCE_IMG_PER_SEC, 2),
        "baseline_source": BASELINE_SOURCE,
        "median_images_per_sec": round(bs * iters / med, 1),
        "device_images_per_sec": round(bs / (dev_ms / 1e3), 1),
        "device_ms_per_step": round(dev_ms, 3),
        "windows": len(dts),
        "pool_contended": bool(med / best > 1.5),
    }


def bench_counterfactuals(budget_s: float) -> dict:
    """Full abduct-act-predict throughput (VERDICT r2 item 2).

    One jitted program: PGM exogenous inversion + mutilated forward, HVAE
    latent abduction, two decoder passes with fixed latents, pixel-noise
    abduction u=(x-mu)/sigma, cf_x clamp. Engine measured matches reference
    /root/reference/src/pgm/dscm.py:30-95.
    """
    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.pgm.dscm import DSCM
    from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
    from causal_gen_tpu.train.vae_trainer import init_model_params

    bs = 256
    cfg = get_config("morphomnist", bs=bs)
    vae = HVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    vae_params = init_model_params(cfg, vae, rng)

    pgm = MorphoMNISTPGM(setup_predictors=False)
    predictor = MorphoMNISTPGM(setup_predictors=True, input_res=cfg.input_res)
    # params are batch-size independent: init at a tiny bs so the host-side
    # (1-core) CPU init costs seconds, not minutes — the measured program
    # below still runs at the full bs
    bs_init = 8
    obs_attrs = {
        "thickness": jnp.zeros((bs_init, 1)),
        "intensity": jnp.zeros((bs_init, 1)),
        "digit": jnp.asarray(
            np.eye(10, dtype=np.float32)[np.zeros(bs_init, np.int64)]),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pgm_params = pgm.init({"params": rng, "sample": rng}, obs_attrs)["params"]
        x0 = jnp.zeros((bs_init, cfg.input_res, cfg.input_res, 1))
        pred_params = predictor.init(
            {"params": rng, "sample": rng}, x0,
            method=predictor.anticausal_logprob, **obs_attrs,
        )["params"]
    dev = jax.devices()[0]
    pgm_params = jax.device_put(pgm_params, dev)
    pred_params = jax.device_put(pred_params, dev)

    dscm = DSCM(cfg=cfg, pgm=pgm, predictor=predictor, vae=vae)
    trainable = dscm.init_trainable(vae_params)
    frozen = {"pgm": pgm_params, "predictor": pred_params}

    host = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(host.uniform(-1, 1, (bs, 32, 32, 1)), jnp.float32),
        "thickness": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "intensity": jnp.asarray(host.uniform(-0.8, 0.8, (bs, 1)), jnp.float32),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[host.integers(0, 10, bs)]),
    }
    do = {"thickness": jnp.full((bs, 1), 0.5)}

    def cf_forward(t, f, b, d, r):
        return dscm.forward(t, f, b, d, r)["cfs"]["x"]

    fwd = jax.jit(cf_forward)

    # PROFILER-DERIVED DEVICE TIMING (tools/device_time.py): every wall-clock
    # micro-timing variant was shown untrustworthy through the tunneled
    # shared-pool runtime — independent calls and block_until_ready
    # under-measure (dispatch pipelining / optimistic acks), and the windowed
    # (N+1 minus 1) readback difference is biased LOW under contention (queue
    # wait inflates the subtracted single-call term; best-of-windows picks
    # the most-biased window — it "measured" 85k cf/s at 192 squared, ~200x
    # over physical). Device-plane module durations from the chip's own
    # tracer are immune to all three; an in-trace elementwise control op
    # validated the method at the chip's known HBM bandwidth.
    from tools.device_time import device_ms_per_iter

    holder = {"x": batch["x"]}

    def dispatch(k):
        holder["x"] = fwd(trainable, frozen, {**batch, "x": holder["x"]},
                          do, jax.random.fold_in(rng, k))
        return holder["x"]

    ms = device_ms_per_iter(dispatch, iters=10, windows=3,
                            module_prefix="cf_forward", tag="bench_cf")
    return {
        "value": round(bs / (ms / 1e3), 1),
        "unit": "counterfactuals/sec",
        "device_ms_per_batch": round(ms, 3),
        "config": "morphomnist bs=256, 1 particle, do(thickness), "
                  "profiler device timing",
    }


def _stub_result(err: str) -> dict:
    return {
        "metric": "hvae_train_images_per_sec_per_chip",
        "value": 0.0,
        "unit": "images/sec",
        "vs_baseline": 0.0,
        "error": err,
    }


def main() -> None:
    """Timeout-proof two-phase bench.

    Round 4's driver bench hit rc=124 with NOTHING printed (BENCH_r04
    parsed:null): the chip pool froze mid-phase and the process died to the
    driver's outer timeout. A SIGALRM guard is not enough — a hang inside a
    native tunnel call never returns to the bytecode loop, so the pending
    exception never fires (reproduced on this host). Instead a daemon
    WATCHDOG THREAD (threads keep running while the main thread is blocked
    in native code) prints the best-known partial result at its phase
    deadline, flushes, and hard-exits — the driver always gets a JSON line.
    """
    import threading

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "150"))
    state = {"result": _stub_result("train phase never completed"),
             "phase": "train",
             # phase deadline = measurement budget + compile/warmup headroom
             # (first compile through the tunnel is slow on a cold cache)
             "deadline": time.monotonic() + budget_s + 240.0}

    def _watchdog():
        while True:
            time.sleep(2.0)
            if state["deadline"] is None:
                return
            if time.monotonic() > state["deadline"]:
                out = dict(state["result"])
                out.setdefault(
                    "error", f"wall-clock guard hit in phase {state['phase']}"
                )
                if state["phase"] == "cf":
                    out["counterfactuals_per_sec"] = {
                        "error": "cf phase hit the wall-clock guard"}
                out["cpu_measured"] = CPU_MEASURED
                print(json.dumps(out), flush=True)
                os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    try:
        result = bench_hvae_train(budget_s)
    except Exception as e:  # noqa: BLE001 — must still print a line
        result = _stub_result(f"train phase failed: {e!r}")
    state["result"] = result
    # Print+flush the train number IMMEDIATELY: if the CF phase hangs or
    # dies, this line is already in the driver's tail (the final enriched
    # line supersedes it on full success).
    print(json.dumps(result), flush=True)

    cf_budget = min(budget_s, 90.0)
    state["phase"] = "cf"
    state["deadline"] = time.monotonic() + cf_budget + 240.0
    try:
        cf = bench_counterfactuals(cf_budget)
    except Exception as e:  # noqa: BLE001
        cf = {"error": f"cf phase failed: {e!r}"}
    state["deadline"] = None
    result["counterfactuals_per_sec"] = cf
    result["cpu_measured"] = CPU_MEASURED
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
