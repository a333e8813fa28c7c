"""HVAE/VAE training: jitted step + epoch loop.

Port target: reference src/trainer.py (run_epoch 38-113: beta warmup, grad
accumulation, grad clip + grad skip, NaN skip, EMA update, best-ELBO
checkpointing). TPU-native redesign:

- The whole step (fwd, bwd, clip, conditional update, EMA) is ONE jitted XLA
  program with the state donated; grad-skip is a branchless jnp.where over the
  update pytrees (reference does host-side `if grad_norm < skip` at
  trainer.py:74-85).
- Gradient accumulation is a lax.scan over (accu_steps, micro_bs, ...)-shaped
  microbatches inside the same program (reference backprops per batch and
  steps every accu_steps batches, trainer.py:63-66).
- Pixel normalization uint8 -> [-1,1] happens on device (reference
  preprocess_batch, trainer.py:16-21, runs on host tensors).
- PRNG: the per-step sample key is fold_in(base_key, global_batch_index) so
  runs are exactly reproducible from cfg.seed (BASELINE.json requirement).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from causal_gen_tpu.config import Config
from causal_gen_tpu.data.loader import Loader
from causal_gen_tpu.train.state import (
    TrainState,
    clip_by_global_norm,
    init_train_state,
    make_optimizer,
)
from causal_gen_tpu.utils.ema import ema_update
from causal_gen_tpu.utils.schedules import linear_warmup

log = logging.getLogger(__name__)


def preprocess_x(x: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [-1,1] on device (reference trainer.py:17)."""
    return (x.astype(jnp.float32) - 127.5) / 127.5


def make_train_step(cfg: Config, model, donate: bool = True):
    step_body = _make_step_body(cfg, model)
    return jax.jit(step_body, donate_argnums=(0,) if donate else ())


def make_multi_train_step(cfg: Config, model, donate: bool = True):
    """S optimizer steps per jitted dispatch (lax.scan over stacked batches).

    On a remote/tunneled backend every dispatch pays a round trip and every
    batch pays a transfer-latency floor; scanning ``steps_per_call`` full
    update steps inside one XLA program amortizes both. Update semantics and
    the per-batch RNG stream are IDENTICAL to the single-step path: step j of
    a chunk starting at global batch index ``start`` uses
    ``fold_in(rng, offset + j)`` — the same key the single-step caller
    derives (run_epoch) — verified by tests/test_train.py parity test.
    """
    step_body = _make_step_body(cfg, model)

    def multi_step(
        state: TrainState,
        batch: Dict[str, jax.Array],  # {"x": (S, accu, micro, ...), "pa": (S, accu, micro, ctx)}
        rng: jax.Array,
        offset: jax.Array,  # epoch*100000 + chunk-start batch index (int32)
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def body(st, inp):
            x, pa, j = inp
            key = jax.random.fold_in(rng, offset + j)
            st, m = step_body(st, {"x": x, "pa": pa}, key)
            return st, m

        s = batch["x"].shape[0]
        js = jnp.arange(s, dtype=jnp.int32)
        state, ms = jax.lax.scan(body, state, (batch["x"], batch["pa"], js))
        return state, ms  # metrics stacked on leading S axis

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def _make_step_body(cfg: Config, model):
    opt = make_optimizer(cfg)

    def loss_fn(params, x, pa, beta, rng):
        out = model.apply(
            {"params": params}, x, pa, beta=beta, train=True, rngs={"sample": rng}
        )
        return out["elbo"], out

    def train_step(
        state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        # batch["x"]: (accu, micro_bs, H, W, C) uint8; batch["pa"]: (accu, micro_bs, ctx)
        accu = batch["x"].shape[0]

        # global 1-based batch counter for beta warmup (reference trainer.py:55-59
        # counts batches, not optimizer steps)
        first_iter = state.step * accu + 1

        def micro(carry, inp):
            grads_acc, elbo_a, nll_a, kl_a, i = carry
            x, pa = inp
            it = first_iter + i
            beta = (
                cfg.beta * linear_warmup(it, cfg.beta_warmup_steps)
                if cfg.beta_warmup_steps > 0
                else cfg.beta
            )
            key = jax.random.fold_in(rng, i)
            (elbo, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, preprocess_x(x), pa, beta, key
            )
            grads_acc = jax.tree.map(
                lambda a, g: a + g / accu, grads_acc, grads
            )
            return (
                grads_acc,
                elbo_a + out["elbo"] / accu,
                nll_a + out["nll"] / accu,
                kl_a + out["kl"] / accu,
                i + 1,
            ), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, elbo, nll, kl, _), _ = jax.lax.scan(
            micro,
            (zero_grads, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros((), jnp.int32)),
            (batch["x"], batch["pa"]),
        )

        grads, grad_norm = clip_by_global_norm(grads, cfg.grad_clip)
        nan_found = jnp.isnan(nll) | jnp.isnan(kl) | jnp.isnan(grad_norm)
        ok = (grad_norm < cfg.grad_skip) & ~nan_found

        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # branchless skip: keep old params/opt_state when not ok
        sel = lambda a, b: jax.tree.map(
            lambda x_new, x_old: jnp.where(ok, x_new, x_old), a, b
        )
        new_params = sel(new_params, state.params)
        new_opt_state = sel(new_opt_state, state.opt_state)

        new_ema_updates = state.ema_updates + ok.astype(jnp.int32)
        new_ema = ema_update(
            state.ema_params, new_params, new_ema_updates, beta=cfg.ema_rate
        )
        new_ema = sel(new_ema, state.ema_params)

        new_state = state.replace(
            step=state.step + ok.astype(jnp.int32),
            ema_updates=new_ema_updates,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
            skipped=state.skipped + (1 - ok.astype(jnp.int32)),
        )
        metrics = dict(
            elbo=elbo, nll=nll, kl=kl, grad_norm=grad_norm,
            skipped=(~ok).astype(jnp.float32),
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, model):
    def eval_step(ema_params, batch, rng):
        out = model.apply(
            {"params": ema_params},
            preprocess_x(batch["x"]),
            batch["pa"],
            beta=cfg.beta,
            train=False,
            rngs={"sample": rng},
        )
        return {k: out[k] for k in ("elbo", "nll", "kl")}

    return jax.jit(eval_step)


def _reshape_accu(batch: Dict[str, np.ndarray], accu: int) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in batch.items():
        micro = v.shape[0] // accu
        out[k] = v[: accu * micro].reshape(accu, micro, *v.shape[1:])
    return out


def init_model_params(cfg: Config, model, rng: jax.Array, host_init: bool = True) -> Any:
    """Initialize parameters ON THE HOST CPU, then transfer once.

    Initialization is a long chain of small ops; running it eagerly against a
    remote/tunneled TPU pays per-dispatch latency thousands of times (measured
    ~2 min for even a tiny model). CPU-init + one device_put is the TPU-native
    pattern.
    """
    x = jnp.zeros(
        (1,) + (cfg.input_res,) * cfg.spatial_dims + (cfg.input_channels,),
        jnp.float32,
    )
    pa = jnp.zeros((1, cfg.context_dim), jnp.float32)
    p_rng, s_rng = jax.random.split(rng)
    cpu = None
    if host_init and jax.default_backend() != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
    if cpu is not None and cfg.use_pallas:
        # Pallas can't lower (non-interpret) on the CPU used for host init;
        # the kernels add no params, so init a pallas-free twin instead
        model = type(model)(cfg=cfg.replace(use_pallas=False))
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        variables = model.init(
            {"params": p_rng, "sample": s_rng}, x, pa, beta=cfg.beta, train=False
        )
    params = variables["params"]
    if cpu is not None:
        params = jax.device_put(params, jax.devices()[0])
    return params


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def run_epoch(
    cfg: Config,
    model,
    state: TrainState,
    loader: Loader,
    train_step,
    eval_step,
    rng: jax.Array,
    training: bool,
    epoch: int,
    multi_step=None,
) -> Tuple[TrainState, Dict[str, float]]:
    # metrics stay on device until epoch end: a per-step device_get would
    # force a host sync every step and serialize the dispatch pipeline
    # (costly on remote/tunneled backends)
    ms = []
    sizes = []
    skipped_before = int(jax.device_get(state.skipped)) if training else 0
    spc = cfg.steps_per_call if training else 1
    if spc > 1 and multi_step is not None:
        multi_fn = multi_step
        # chunk the batch stream: S update steps per dispatch
        pend: list = []
        pend_start = 0

        def flush(state):
            start = pend_start
            chunk = {
                k: np.stack([b[k] for b in pend]) for k in pend[0]
            }
            offset = jnp.asarray(epoch * 100000 + start, jnp.int32)
            state, m = multi_fn(state, chunk, rng, offset)
            return state, m

        for i, batch in enumerate(loader):
            sizes.append(batch["x"].shape[0])
            pend.append(_reshape_accu(batch, cfg.accu_steps))
            if len(pend) == spc:
                state, m = flush(state)
                ms.append(m)
                pend, pend_start = [], i + 1
        if pend:
            state, m = flush(state)
            ms.append(m)
        ms = jax.device_get(ms)
        ms = [
            jax.tree.map(lambda v: v[j], m)
            for m in ms
            for j in range(len(m["skipped"]))
        ]
    else:
        for i, batch in enumerate(loader):
            sizes.append(batch["x"].shape[0])
            key = jax.random.fold_in(rng, epoch * 100000 + i)
            if training:
                accu_batch = _reshape_accu(batch, cfg.accu_steps)
                state, m = train_step(state, accu_batch, key)
            else:
                m = eval_step(state.ema_params, batch, key)
                m = dict(m, skipped=jnp.zeros(()))
            ms.append(m)
        ms = jax.device_get(ms)
    stats = {"elbo": 0.0, "nll": 0.0, "kl": 0.0, "n": 0.0}
    for m, bs in zip(ms, sizes):
        w = (1.0 - float(m["skipped"])) * bs  # skipped updates excluded
        # (trainer.py:78-87)
        stats["elbo"] += float(m["elbo"]) * w
        stats["nll"] += float(m["nll"]) * w
        stats["kl"] += float(m["kl"]) * w
        stats["n"] += w
    n = max(stats["n"], 1.0)
    out = {k: v / n for k, v in stats.items() if k != "n"}
    if training:
        out["updates_skipped"] = int(jax.device_get(state.skipped)) - skipped_before
    return state, out


def train(
    cfg: Config,
    model,
    loaders: Dict[str, Loader],
    save_dir: Optional[str] = None,
    epochs: Optional[int] = None,
    callback=None,
    init_state: Optional[TrainState] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Full training driver (reference trainer.py:24-169 minus viz).

    ``init_state`` resumes from a loaded checkpoint (reference main.py:74-88)."""
    rng = jax.random.PRNGKey(cfg.seed)
    init_rng, train_rng, eval_rng = jax.random.split(rng, 3)
    if init_state is not None:
        state = init_state
    else:
        params = init_model_params(cfg, model, init_rng)
        n_params = sum(x.size for x in jax.tree.leaves(params))
        log.info("total params: %s", f"{n_params:,}")
        state = init_train_state(cfg, params)

    train_step = make_train_step(cfg, model)
    eval_step = make_eval_step(cfg, model)
    multi_step = (
        make_multi_train_step(cfg, model) if cfg.steps_per_call > 1 else None
    )

    writer = None
    if save_dir:
        from causal_gen_tpu.train.checkpoint import AsyncCheckpointWriter

        writer = AsyncCheckpointWriter(save_dir, max_to_keep=cfg.ckpt_max_to_keep)

    best_loss = float("inf")
    history: Dict[str, float] = {}
    for epoch in range(1, (epochs or cfg.epochs) + 1):
        t0 = time.time()
        state, tr = run_epoch(
            cfg, model, state, loaders["train"], train_step, eval_step,
            train_rng, training=True, epoch=epoch, multi_step=multi_step,
        )
        dt = time.time() - t0
        log.info(
            "epoch %d | train nelbo %.4f nll %.4f kl %.4f | %.1fs",
            epoch, tr["elbo"], tr["nll"], tr["kl"], dt,
        )
        history = {f"train_{k}": v for k, v in tr.items()}
        if epoch % cfg.eval_freq == 0:
            _, ev = run_epoch(
                cfg, model, state, loaders["valid"], train_step, eval_step,
                eval_rng, training=False, epoch=epoch,
            )
            log.info(
                "epoch %d | valid nelbo %.4f nll %.4f kl %.4f",
                epoch, ev["elbo"], ev["nll"], ev["kl"],
            )
            history.update({f"valid_{k}": v for k, v in ev.items()})
            if ev["elbo"] < best_loss and writer is not None:
                best_loss = ev["elbo"]
                from causal_gen_tpu.train.checkpoint import state_payload

                writer.save(
                    state_payload(state),
                    {"config": cfg.to_dict(),
                     "extra": {"epoch": epoch, "best_loss": best_loss}},
                    step=int(jax.device_get(state.step)),
                    metric=float(ev["elbo"]),
                )
        if callback is not None:
            callback(epoch, state, history)
    if writer is not None:
        writer.close()
    return state, history
