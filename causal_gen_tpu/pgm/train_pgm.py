"""PGM / anticausal-predictor training via SVI.

Port target: reference src/pgm/train_pgm.py (preprocess 25-47, ss_train_epoch
50-108, sup_epoch 111-171, eval_epoch 174-249, main 313-567).

TPU-native redesign: one jitted step per setup. The Pyro Trace_ELBO machinery
reduces, for each setup, to:
- sup_pgm: empty guide + fully observed model => loss = -log p(obs)/bs
  (per-site log-probs from pgm/base.joint_logprob).
- sup_aux: predictor MLE, loss = -sum_site log q(site|x,...)/bs.
- semi_sup (labelled + unlabelled interleave): labelled batch uses
  -log p(obs) + alpha*N_l * aux MLE; unlabelled batch is a Monte-Carlo ELBO
  with guide-sampled attributes — reparameterized for continuous sites and a
  score-function surrogate for categorical sites (what Pyro's Trace_ELBO
  does site-by-site).

Trainer semantics preserved: AdamW(lr, wd), grad clip 200 (train_pgm.py:154),
EMA(beta=0.999, train_pgm.py:421), per-variable eval metrics with the exact
unnormalizations (train_pgm.py:196-249).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from causal_gen_tpu.data.loader import Loader
from causal_gen_tpu.train.state import clip_by_global_norm
from causal_gen_tpu.utils.ema import ema_update
from causal_gen_tpu.utils.metrics import (
    accuracy_binary,
    accuracy_onehot,
    mae,
    roc_auc_binary,
    roc_auc_ovr_macro,
)
from causal_gen_tpu.utils.normalization import (
    MORPHOMNIST_MIN_MAX,
    get_attr_max_min,
)

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class PGMConfig:
    """Hparams of the PGM training entry (reference train_pgm.py:313-383)."""

    dataset: str = "morphomnist"
    setup: str = "sup_pgm"  # sup_pgm | sup_aux | semi_sup
    seed: int = 7
    epochs: int = 1000
    bs: int = 32
    lr: float = 1e-4
    wd: float = 0.1
    input_res: int = 32
    input_channels: int = 1
    pad: int = 4
    hflip: float = 0.5
    sup_frac: float = 1.0
    eval_freq: int = 1
    widths: Tuple[int, ...] = (32, 32)
    parents_x: Tuple[str, ...] = ()
    alpha: float = 1e-3
    std_fixed: float = 0.0
    grad_clip: float = 200.0
    ema_rate: float = 0.999


@flax.struct.dataclass
class PGMTrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any


def preprocess_pgm_batch(
    cfg: PGMConfig, batch: Dict[str, np.ndarray]
) -> Dict[str, jnp.ndarray]:
    """x -> [-1,1]; attrs -> (B, d) float; UKBB raw attrs -> [-1,1]
    (reference preprocess, train_pgm.py:25-47)."""
    out: Dict[str, jnp.ndarray] = {}
    for k, v in batch.items():
        if k == "x":
            out[k] = (jnp.asarray(v, jnp.float32) - 127.5) / 127.5
            continue
        v = jnp.asarray(v, jnp.float32)
        if v.ndim < 2:
            v = v[:, None]
        if "ukbb" in cfg.dataset and k in (
            "age", "brain_volume", "ventricle_volume",
        ):
            k_max, k_min = get_attr_max_min(k)
            v = 2 * (v - k_min) / (k_max - k_min) - 1
        out[k] = v
    return out


def make_pgm_optimizer(cfg: PGMConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.lr, b1=0.9, b2=0.999, weight_decay=cfg.wd)


def init_pgm_state(cfg: PGMConfig, model, obs: Dict[str, jnp.ndarray]) -> PGMTrainState:
    rng = jax.random.PRNGKey(cfg.seed)
    variables = model.init(
        {"params": rng, "sample": rng, "dropout": rng}, obs,
        method=model.svi_logprob,
    )
    params = variables["params"]
    opt = make_pgm_optimizer(cfg)

    @jax.jit
    def build(p):
        return PGMTrainState(
            step=jnp.zeros((), jnp.int32),
            params=p,
            ema_params=p,
            opt_state=opt.init(p),
        )

    return build(params)


def _attrs_only(model, batch):
    return {k: v for k, v in batch.items() if k in model.dag_variables}


def make_pgm_train_step(cfg: PGMConfig, model, donate: bool = True):
    opt = make_pgm_optimizer(cfg)

    def loss_fn(params, batch, rng):
        bs = batch["x"].shape[0] if "x" in batch else next(iter(batch.values())).shape[0]
        rngs = {"sample": rng, "dropout": jax.random.fold_in(rng, 1)}
        if cfg.setup == "sup_pgm":
            lps = model.apply(
                {"params": params}, _attrs_only(model, batch),
                method=model.svi_logprob, rngs=rngs,
            )
        elif cfg.setup == "sup_aux":
            x = batch["x"]
            obs = _attrs_only(model, batch)
            lps = model.apply(
                {"params": params}, x, method=model.anticausal_logprob,
                rngs=rngs, train=True, **obs,
            ) if _wants_train_flag(model) else model.apply(
                {"params": params}, x, method=model.anticausal_logprob,
                rngs=rngs, **obs,
            )
        else:
            raise NotImplementedError(cfg.setup)
        loss = -sum(jnp.sum(v) for v in lps.values()) / bs
        site_lp = {k: jnp.sum(v) / bs for k, v in lps.items()}
        return loss, site_lp

    def train_step(state: PGMTrainState, batch, rng):
        (loss, site_lp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        grads, grad_norm = clip_by_global_norm(grads, cfg.grad_clip)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_ema = ema_update(
            state.ema_params, new_params, new_step, beta=cfg.ema_rate
        )
        return (
            PGMTrainState(
                step=new_step, params=new_params,
                ema_params=new_ema, opt_state=new_opt_state,
            ),
            {"loss": loss, "grad_norm": grad_norm, **site_lp},
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_semi_sup_train_step(cfg: PGMConfig, model, n_labelled: int,
                             donate: bool = True):
    """Semi-supervised SVI step (reference ss_train_epoch, train_pgm.py:50-108).

    Per step: labelled loss -log p(obs_l) + unlabelled Monte-Carlo ELBO with
    guide-sampled attributes + alpha * N_l * predictor MLE on the labelled
    batch. The unlabelled ELBO uses pathwise gradients for reparameterized
    (continuous) guide sites and a score-function surrogate for categorical
    sites — the same per-site estimator split Pyro's Trace_ELBO applies.
    Requires the PGM to expose ``guide_sample`` (MorphoMNISTPGM.guide_sample).
    """
    opt = make_pgm_optimizer(cfg)
    alpha = cfg.alpha * n_labelled

    def loss_fn(params, batch_l, batch_u, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        obs_l = _attrs_only(model, batch_l)
        # labelled: guide contributes nothing when everything is observed
        lps_l = model.apply(
            {"params": params}, obs_l, method=model.svi_logprob,
            rngs={"sample": r1},
        )
        loss_l = -sum(jnp.sum(v) for v in lps_l.values())
        # unlabelled: guide samples all attributes from q(.|x)
        empty = {k: None for k in model.dag_variables}
        values, logq = model.apply(
            {"params": params}, batch_u["x"], empty,
            method=model.guide_sample, rngs={"sample": r2},
        )
        lps_u = model.apply(
            {"params": params}, values, method=model.svi_logprob,
            rngs={"sample": r2},
        )
        logp_u = sum(lps_u.values())  # (B,)
        discrete_kinds = ("categorical", "binary")
        logq_cont = sum(
            (v for k, v in logq.items()
             if model.dag_variables.get(k) not in discrete_kinds),
            start=jnp.zeros(()),
        )
        logq_disc = sum(
            (v for k, v in logq.items()
             if model.dag_variables.get(k) in discrete_kinds),
            start=jnp.zeros(()),
        )
        elbo_u = logp_u - (logq_cont + logq_disc)
        # score-function surrogate for the categorical guide sites
        surrogate_u = elbo_u + logq_disc * jax.lax.stop_gradient(elbo_u)
        loss_u = -jnp.sum(surrogate_u)
        # aux predictor MLE on the labelled batch
        aux_lps = model.apply(
            {"params": params}, batch_l["x"],
            method=model.anticausal_logprob, rngs={"sample": r3}, **obs_l,
        )
        aux_loss = -sum(jnp.sum(v) for v in aux_lps.values())
        loss = loss_l + loss_u + alpha * aux_loss
        return loss, {"loss_l": loss_l, "loss_u": -jnp.sum(elbo_u),
                      "aux_loss": aux_loss}

    def train_step(state: PGMTrainState, batch_l, batch_u, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch_l, batch_u, rng
        )
        grads, grad_norm = clip_by_global_norm(grads, cfg.grad_clip)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_ema = ema_update(
            state.ema_params, new_params, new_step, beta=cfg.ema_rate
        )
        return (
            PGMTrainState(step=new_step, params=new_params,
                          ema_params=new_ema, opt_state=new_opt_state),
            {"loss": loss, "grad_norm": grad_norm, **aux},
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def ss_train_epoch(
    cfg: PGMConfig,
    model,
    state: PGMTrainState,
    loader_l: Loader,
    loader_u: Loader,
    train_step,
    rng: jax.Array,
    epoch: int,
) -> Tuple[PGMTrainState, Dict[str, float]]:
    """Semi-supervised epoch: outer loop over the larger set, inner iterator
    restarted on exhaustion (reference ss_train_epoch, train_pgm.py:50-108)."""
    outer, inner = (
        (loader_u, loader_l) if len(loader_u) > len(loader_l) else (loader_l, loader_u)
    )
    outer_is_l = outer is loader_l
    inner_it = iter(inner)
    stats = {"loss": 0.0, "aux_loss": 0.0, "n": 0}
    for i, raw_outer in enumerate(outer):
        try:
            raw_inner = next(inner_it)
        except StopIteration:
            inner_it = iter(inner)
            raw_inner = next(inner_it)
        b_outer = preprocess_pgm_batch(cfg, raw_outer)
        b_inner = preprocess_pgm_batch(cfg, raw_inner)
        batch_l, batch_u = (
            (b_outer, b_inner) if outer_is_l else (b_inner, b_outer)
        )
        key = jax.random.fold_in(rng, epoch * 100000 + i)
        state, m = train_step(state, batch_l, batch_u, key)
        bs = b_outer["x"].shape[0]
        stats["loss"] += float(m["loss"])
        stats["aux_loss"] += float(m["aux_loss"])
        stats["n"] += bs
    n = max(stats["n"], 1)
    return state, {k: v / n for k, v in stats.items() if k != "n"}


def split_labelled_unlabelled(
    dataset, sup_frac: float, seed: int = 0
):
    """Labelled/unlabelled Subset split (reference train_pgm.py:287-306)."""
    import dataclasses as _dc

    import numpy as _np

    n = len(dataset)
    rng = _np.random.default_rng(seed)
    idx = rng.permutation(n)
    n_l = int(sup_frac * n)
    take = lambda ids: _dc.replace(
        dataset,
        images=dataset.images[ids],
        attrs={k: v[ids] for k, v in dataset.attrs.items()},
    )
    return take(idx[:n_l]), take(idx[n_l:])


def make_pgm_eval_step(cfg: PGMConfig, model):
    def eval_step(params, batch, rng):
        rngs = {"sample": rng}
        if cfg.setup == "sup_pgm":
            lps = model.apply(
                {"params": params}, _attrs_only(model, batch),
                method=model.svi_logprob, rngs=rngs,
            )
        else:
            obs = _attrs_only(model, batch)
            lps = model.apply(
                {"params": params}, batch["x"],
                method=model.anticausal_logprob, rngs=rngs, **obs,
            )
        n = next(iter(batch.values())).shape[0]
        loss = -sum(jnp.sum(v) for v in lps.values()) / n
        return {"loss": loss, **{k: jnp.sum(v) / n for k, v in lps.items()}}

    return jax.jit(eval_step)


def _wants_train_flag(model) -> bool:
    from causal_gen_tpu.pgm.flow_pgm import ChestPGM

    return isinstance(model, ChestPGM)


def make_predict_fn(cfg: PGMConfig, model):
    def predict(params, batch, rng):
        obs = _attrs_only(model, batch)
        return model.apply(
            {"params": params}, batch["x"], method=model.predict,
            rngs={"sample": rng}, **obs,
        )

    return jax.jit(predict)


def pgm_eval_metrics(
    cfg: PGMConfig,
    model,
    params,
    loader: Loader,
    rng: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Per-variable metric sweep (reference eval_epoch, train_pgm.py:174-249)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    predict = make_predict_fn(cfg, model)
    preds: Dict[str, list] = {k: [] for k in model.dag_variables}
    targets: Dict[str, list] = {k: [] for k in model.dag_variables}
    for i, raw in enumerate(loader):
        batch = preprocess_pgm_batch(cfg, raw)
        for k in targets:
            targets[k].append(np.asarray(batch[k]))
        out = predict(params, batch, jax.random.fold_in(rng, i))
        for k in preds:
            preds[k].append(np.asarray(out[k]))
    P = {k: np.concatenate(v) for k, v in preds.items()}
    T = {k: np.concatenate(v) for k, v in targets.items()}

    stats: Dict[str, float] = {}
    for k, kind in model.dag_variables.items():
        if "ukbb" in cfg.dataset:
            if k in ("mri_seq", "sex"):
                stats[k + "_rocauc"] = roc_auc_binary(T[k], P[k])
                stats[k + "_acc"] = accuracy_binary(T[k], P[k])
            else:
                p = (P[k] + 1) / 2
                _max, _min = get_attr_max_min(k)
                p = p * (_max - _min) + _min
                t = (T[k] + 1) / 2 * (_max - _min) + _min
                norm = 1000.0 if "volume" in k else 1.0
                stats[k + "_mae"] = mae(t, p) / norm
        elif cfg.dataset == "morphomnist":
            if k == "digit":
                stats[k + "_acc"] = accuracy_onehot(T[k], P[k])
            else:
                _min, _max = MORPHOMNIST_MIN_MAX[k]
                p = ((P[k] + 1) / 2) * (_max - _min) + _min
                t = ((T[k] + 1) / 2) * (_max - _min) + _min
                stats[k + "_mae"] = mae(t, p)
        elif cfg.dataset == "cmnist":
            stats[k + "_acc"] = accuracy_onehot(T[k], P[k])
        elif "mimic" in cfg.dataset:
            if k in ("sex", "finding"):
                stats[k + "_rocauc"] = roc_auc_binary(T[k], P[k])
                stats[k + "_acc"] = accuracy_binary(T[k], P[k])
            elif k == "age":
                stats[k + "_mae"] = mae((T[k] + 1) * 50, (P[k] + 1) * 50)
            elif k == "race":
                stats[k + "_acc"] = accuracy_onehot(T[k], P[k])
                stats[k + "_rocauc"] = roc_auc_ovr_macro(T[k], P[k])
    return stats


def save_pgm_checkpoint(path: str, cfg: PGMConfig, state: PGMTrainState,
                        extra: Optional[Dict[str, Any]] = None) -> None:
    """Checkpoint {params, ema, opt, hparams} (reference train_pgm.py:533-546)."""
    import dataclasses
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path,
        {
            "params": jax.device_get(state.params),
            "ema_params": jax.device_get(state.ema_params),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(jax.device_get(state.step)),
        },
        force=True,
    )
    with open(path + ".meta.json", "w") as f:
        json.dump(
            {"config": dataclasses.asdict(cfg), "extra": extra or {}},
            f, indent=2, default=str,
        )


def load_pgm_checkpoint(path: str) -> Tuple[PGMConfig, PGMTrainState, Dict[str, Any]]:
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    d = meta["config"]
    d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
    cfg = PGMConfig(**d)
    payload = ocp.PyTreeCheckpointer().restore(path)
    state = PGMTrainState(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=payload["params"],
        ema_params=payload["ema_params"],
        opt_state=payload["opt_state"],
    )
    return cfg, state, meta.get("extra", {})


def train_pgm(
    cfg: PGMConfig,
    model,
    loaders: Dict[str, Loader],
    epochs: Optional[int] = None,
    save_dir: Optional[str] = None,
) -> Tuple[PGMTrainState, Dict[str, float]]:
    """Supervised PGM/aux training driver (reference train_pgm.py:430-567);
    best-valid-loss checkpointing at train_pgm.py:531-546."""
    rng = jax.random.PRNGKey(cfg.seed)
    first = preprocess_pgm_batch(cfg, next(iter(loaders["train"])))
    if cfg.setup == "sup_pgm":
        state = init_pgm_state(cfg, model, _attrs_only(model, first))
    else:
        init_rng = jax.random.PRNGKey(cfg.seed)
        params = model.init(
            {"params": init_rng, "sample": init_rng, "dropout": init_rng},
            first["x"], method=model.anticausal_logprob,
            **_attrs_only(model, first),
        )["params"]
        opt = make_pgm_optimizer(cfg)
        state = PGMTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=opt.init(params),
        )
    train_step = make_pgm_train_step(cfg, model)
    eval_step = make_pgm_eval_step(cfg, model)
    best = float("inf")
    history: Dict[str, float] = {}
    for epoch in range(1, (epochs or cfg.epochs) + 1):
        losses = []
        for i, raw in enumerate(loaders["train"]):
            batch = preprocess_pgm_batch(cfg, raw)
            key = jax.random.fold_in(rng, epoch * 100000 + i)
            state, m = train_step(state, batch, key)
            losses.append(float(m["loss"]))
        history["train_loss"] = float(np.mean(losses))
        if epoch % cfg.eval_freq == 0:
            ev = []
            for i, raw in enumerate(loaders["valid"]):
                batch = preprocess_pgm_batch(cfg, raw)
                m = eval_step(state.ema_params, batch, jax.random.fold_in(rng, i))
                ev.append(float(m["loss"]))
            history["valid_loss"] = float(np.mean(ev))
            if history["valid_loss"] < best:
                best = history["valid_loss"]
                if save_dir:
                    import os

                    save_pgm_checkpoint(
                        os.path.join(save_dir, "checkpoint"), cfg, state,
                        extra={"epoch": epoch, "best_loss": best},
                    )
        log.info("epoch %d | %s", epoch, history)
    return state, history
