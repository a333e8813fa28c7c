"""Counterfactual fine-tuning of the merged DSCM.

Port target: reference src/pgm/train_cf.py (cf_epoch 111-220, dual optimizers
444-457, metrics 63-108, main 223-538).

TPU-native redesign: one jitted step runs the whole DSCM forward (PGM
counterfactual + 3 HVAE decoder passes per particle + predictor ELBO +
Lagrangian), both optimizer updates (AdamW on the VAE params; ascent-AdamW on
the Lagrange multiplier via optax scale(-1)), the lambda >= 0 clamp, grad
clip/skip and NaN skip as branchless selects, and the EMA update — where the
reference round-trips the host for each of these (train_cf.py:166-180).

Random single-parent interventions are drawn on the host per batch
(do(pa_k) = batch values permuted for train; train-set resamples for eval,
train_cf.py:145-153); the jit re-specializes once per intervened-variable
name (bounded by |DAG|+1 variants).
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
from causal_gen_tpu.pgm.dscm import DSCM
from causal_gen_tpu.pgm.train_pgm import PGMConfig, preprocess_pgm_batch
from causal_gen_tpu.train.state import clip_by_global_norm
from causal_gen_tpu.utils.ema import ema_update

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class CFConfig:
    """Hparams of the counterfactual-training entry
    (reference train_cf.py:223-284)."""

    seed: int = 7
    epochs: int = 5000
    bs: int = 32
    lr: float = 1e-4
    lr_lagrange: float = 1e-2
    ema_rate: float = 0.999
    # NOTE faithful reference quirk: --alpha is documented as "aux loss
    # multiplier" but only scales the LOGGED aux_loss (train_cf.py:207,270);
    # the optimized Lagrangian (dscm.py:85-88) never sees it, so it does not
    # change training. The effective knobs on the predictor-vs-fidelity
    # tradeoff are epochs (early stopping) and elbo_constraint (eps).
    alpha: float = 1.0  # aux loss stat multiplier
    lmbda_init: float = 0.0
    damping: float = 100.0
    do_pa: Optional[str] = None
    eval_freq: int = 1
    cf_particles: int = 1
    # 192^2 batch-wall knobs (RESULTS.md "HBM finding"): at bs<128 XLA pads
    # C=32 activations to the 128-lane tile (4x HBM expansion) but bs=128's
    # tripled CF graph OOMs. accu_steps splits the batch into microbatches
    # scanned inside ONE jitted step (grads averaged, one optimizer update —
    # effective batch decoupled from live activations, reference
    # trainer.py:63-66 semantics); steps_per_call scans S full update steps
    # per dispatch (dispatch/transfer amortization, same as the HVAE
    # trainer's knob). cf_remat recomputes each particle's decoder passes in
    # backward instead of keeping 3 passes of activations live, letting
    # bs=128's batch-on-lanes layouts fit.
    accu_steps: int = 1
    steps_per_call: int = 1
    cf_remat: bool = False
    # inherited from the VAE checkpoint (train_cf.py:404-411)
    beta: float = 1.0
    grad_clip: float = 350.0
    grad_skip: float = 500.0
    wd: float = 0.01
    betas: Tuple[float, float] = (0.9, 0.9)
    elbo_constraint: float = 0.0
    # differentiable measured-morphometry penalty weights + host-fitted
    # thickness calibration (ops/soft_morph.py; TPU-native extension, no
    # reference counterpart)
    thickness_weight: float = 0.0
    intensity_weight: float = 0.0
    thickness_calib: Tuple[float, float] = (1.0, 0.0)


@flax.struct.dataclass
class CFTrainState:
    step: jax.Array
    ema_updates: jax.Array
    trainable: Any  # {"vae": vae_params, "lmbda": (1,)}
    ema_trainable: Any
    opt_state: Any
    lagrange_opt_state: Any
    skipped: jax.Array


def make_cf_optimizers(cfg: CFConfig):
    opt = optax.adamw(
        cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1], weight_decay=cfg.wd
    )
    # maximize=True AdamW on lambda (train_cf.py:450-457): flip the gradient,
    # no weight decay
    lagrange_opt = optax.chain(
        optax.scale(-1.0),
        optax.adamw(cfg.lr_lagrange, b1=cfg.betas[0], b2=cfg.betas[1], weight_decay=0.0),
    )
    return opt, lagrange_opt


def init_cf_state(cfg: CFConfig, dscm: DSCM, vae_params: Any) -> CFTrainState:
    opt, lagrange_opt = make_cf_optimizers(cfg)
    # cfg is authoritative for the multiplier init (train_cf.py args.lmbda_init);
    # dscm.lmbda_init is kept in sync by the CLI
    lmbda_init = cfg.lmbda_init

    @jax.jit
    def build(p):
        trainable = {"vae": p, "lmbda": jnp.full((1,), lmbda_init, jnp.float32)}
        return CFTrainState(
            step=jnp.zeros((), jnp.int32),
            ema_updates=jnp.zeros((), jnp.int32),
            trainable=trainable,
            ema_trainable=trainable,
            opt_state=opt.init(trainable["vae"]),
            lagrange_opt_state=lagrange_opt.init(trainable["lmbda"]),
            skipped=jnp.zeros((), jnp.int32),
        )

    return build(vae_params)


def make_cf_train_step(cfg: CFConfig, dscm: DSCM, frozen: Dict[str, Any],
                       donate: bool = True):
    step_body = _make_cf_step_body(cfg, dscm, frozen)
    return jax.jit(step_body, donate_argnums=(0,) if donate else ())


def make_cf_multi_step(cfg: CFConfig, dscm: DSCM, frozen: Dict[str, Any],
                       donate: bool = True):
    """S full CF update steps per jitted dispatch (lax.scan over batches
    stacked on a leading S axis) — the CF-loop analog of the HVAE trainer's
    steps_per_call. RNG parity with the single-step path: step j of a chunk
    starting at batch index ``start`` uses fold_in(rng, offset + j), the
    exact key cf_train_epoch derives (epoch*100000 + i)."""
    step_body = _make_cf_step_body(cfg, dscm, frozen)

    def multi_step(state: CFTrainState, batch, do, do_mask, rng, offset):
        def body(st, inp):
            b, d, m, j = inp
            key = jax.random.fold_in(rng, offset + j)
            st, metrics = step_body(st, b, d, m, key)
            return st, metrics

        s = jax.tree.leaves(batch)[0].shape[0]
        js = jnp.arange(s, dtype=jnp.int32)
        state, ms = jax.lax.scan(body, state, (batch, do, do_mask, js))
        return state, ms  # metrics stacked on leading S axis

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def _make_cf_step_body(cfg: CFConfig, dscm: DSCM, frozen: Dict[str, Any]):
    opt, lagrange_opt = make_cf_optimizers(cfg)

    def loss_fn(trainable, batch, do, do_mask, rng):
        out = dscm.forward(
            trainable, frozen, batch, do, rng,
            cf_particles=cfg.cf_particles, beta=cfg.beta, do_mask=do_mask,
        )
        return out["loss"], out

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accu = max(int(cfg.accu_steps), 1)

    def train_step(state: CFTrainState, batch, do, do_mask, rng):
        if accu == 1:
            (loss, out), grads = grad_fn(
                state.trainable, batch, do, do_mask, rng
            )
        else:
            # microbatch accumulation: leaves arrive stacked (accu, micro,
            # ...); grads averaged over microbatches inside a scan so only
            # one microbatch's activations are ever live (reference
            # trainer.py:63-66 accumulation semantics)
            def micro(carry, inp):
                g_acc, loss_a, out_a, i = carry
                b, d, m = inp
                key = jax.random.fold_in(rng, i)
                (loss_i, out_i), g_i = grad_fn(state.trainable, b, d, m, key)
                g_acc = jax.tree.map(lambda a, g: a + g / accu, g_acc, g_i)
                out_keep = {
                    k: out_a[k] + out_i[k] / accu
                    for k in ("aux_loss", "elbo", "nll", "kl", "morph_loss")
                }
                return (g_acc, loss_a + loss_i / accu, out_keep, i + 1), None

            zero_g = jax.tree.map(jnp.zeros_like, state.trainable)
            zero_out = {k: jnp.zeros(()) for k in
                        ("aux_loss", "elbo", "nll", "kl", "morph_loss")}
            (grads, loss, out, _), _ = jax.lax.scan(
                micro,
                (zero_g, jnp.zeros(()), zero_out, jnp.zeros((), jnp.int32)),
                (batch, do, do_mask),
            )
            out = dict(out, loss=loss)
        grads, grad_norm = clip_by_global_norm(grads, cfg.grad_clip)
        nan_found = jnp.isnan(loss) | jnp.isnan(grad_norm)
        ok = (grad_norm < cfg.grad_skip) & ~nan_found

        vae_updates, new_opt_state = opt.update(
            grads["vae"], state.opt_state, state.trainable["vae"]
        )
        new_vae = optax.apply_updates(state.trainable["vae"], vae_updates)
        l_updates, new_l_state = lagrange_opt.update(
            grads["lmbda"], state.lagrange_opt_state, state.trainable["lmbda"]
        )
        new_lmbda = jnp.clip(
            optax.apply_updates(state.trainable["lmbda"], l_updates), min=0.0
        )  # lambda >= 0 clamp (train_cf.py:176-177)
        new_trainable = {"vae": new_vae, "lmbda": new_lmbda}

        sel = lambda a, b: jax.tree.map(
            lambda x_new, x_old: jnp.where(ok, x_new, x_old), a, b
        )
        new_trainable = sel(new_trainable, state.trainable)
        new_opt_state = sel(new_opt_state, state.opt_state)
        new_l_state = sel(new_l_state, state.lagrange_opt_state)
        new_ema_updates = state.ema_updates + ok.astype(jnp.int32)
        new_ema = ema_update(
            state.ema_trainable, new_trainable, new_ema_updates, beta=cfg.ema_rate
        )
        new_ema = sel(new_ema, state.ema_trainable)

        metrics = {
            "loss": out["loss"],
            "aux_loss": out["aux_loss"],
            "elbo": out["elbo"],
            "nll": out["nll"],
            "kl": out["kl"],
            "morph_loss": out["morph_loss"],
            "lmbda": state.trainable["lmbda"][0],
            "grad_norm": grad_norm,
            "skipped": (~ok).astype(jnp.float32),
        }
        return (
            state.replace(
                step=state.step + ok.astype(jnp.int32),
                ema_updates=new_ema_updates,
                trainable=new_trainable,
                ema_trainable=new_ema,
                opt_state=new_opt_state,
                lagrange_opt_state=new_l_state,
                skipped=state.skipped + (1 - ok.astype(jnp.int32)),
            ),
            metrics,
        )

    return train_step


def make_cf_eval_step(cfg: CFConfig, dscm: DSCM, frozen: Dict[str, Any]):
    """Forward + predictor sweep on counterfactuals (train_cf.py:181-189)."""

    def eval_step(trainable, batch, do, rng):
        out = dscm.forward(
            trainable, frozen, batch, do, rng,
            cf_particles=cfg.cf_particles, beta=cfg.beta,
        )
        cfs = out["cfs"]
        cf_pa = {k: v for k, v in cfs.items() if k != "x"}
        preds = dscm.predictor.apply(
            {"params": frozen["predictor"]}, cfs["x"],
            method=dscm.predictor.predict, rngs={"sample": rng}, **cf_pa,
        )
        return (
            {k: out[k] for k in ("loss", "aux_loss", "elbo", "nll", "kl", "morph_loss")},
            preds,
            cfs,
        )

    return jax.jit(eval_step)


def random_intervention(
    rng: np.random.Generator,
    dag_vars: Tuple[str, ...],
    batch: Dict[str, jnp.ndarray],
    do_pa: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """do(pa_k) with values permuted within the batch (train_cf.py:145-149)."""
    do_k = do_pa if do_pa else dag_vars[rng.integers(0, len(dag_vars))]
    perm = rng.permutation(batch[do_k].shape[0])
    return {do_k: batch[do_k][perm]}


def dense_intervention(
    dag_vars: Tuple[str, ...],
    batch: Dict[str, jnp.ndarray],
    do: Dict[str, jnp.ndarray],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Encode a sparse do-dict as dense (values, mask) over ALL DAG variables
    so the jitted step never re-specializes on the intervened-variable set."""
    n = next(iter(batch.values())).shape[0]
    values, mask = {}, {}
    for k in dag_vars:
        if k in do:
            values[k] = do[k]
            mask[k] = jnp.ones((n, 1), jnp.float32)
        else:
            values[k] = jnp.zeros_like(batch[k])
            mask[k] = jnp.zeros((n, 1), jnp.float32)
    return values, mask


def cf_state_payload(state: CFTrainState) -> Dict[str, Any]:
    """CFTrainState -> host-side checkpoint payload incl. both optimizer
    states (reference train_cf.py:511-529)."""
    return {
        "trainable": jax.device_get(state.trainable),
        "ema_trainable": jax.device_get(state.ema_trainable),
        "opt_state": jax.device_get(state.opt_state),
        "lagrange_opt_state": jax.device_get(state.lagrange_opt_state),
        "step": int(jax.device_get(state.step)),
        "ema_updates": int(jax.device_get(state.ema_updates)),
        "skipped": int(jax.device_get(state.skipped)),
    }


def save_cf_checkpoint(path: str, cfg: CFConfig, state: CFTrainState,
                       extra: Optional[Dict[str, Any]] = None) -> None:
    """CF checkpoint incl. both optimizer states
    (reference train_cf.py:511-529)."""
    import dataclasses
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ocp.PyTreeCheckpointer().save(path, cf_state_payload(state), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump({"config": dataclasses.asdict(cfg), "extra": extra or {}},
                  f, indent=2, default=str)


def load_cf_meta(path: str) -> Tuple[CFConfig, Dict[str, Any]]:
    """Config + extra from a CF checkpoint's sidecar, without the arrays."""
    import json
    import os

    with open(os.path.abspath(path) + ".meta.json") as f:
        meta = json.load(f)
    d = {k: tuple(v) if isinstance(v, list) else v
         for k, v in meta["config"].items()}
    return CFConfig(**d), meta.get("extra", {})


def load_cf_checkpoint(
    path: str, template_state: Optional[CFTrainState] = None
) -> Tuple[CFConfig, CFTrainState, Dict[str, Any]]:
    """Restore a CF checkpoint.

    ``template_state`` (a freshly built CFTrainState from init_cf_state)
    restores the optimizer pytrees with their optax NamedTuple structure
    intact — without it orbax returns raw dicts and opt.update crashes on
    resume (same template pattern as cli/main.py's HVAE resume).
    """
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    d = {k: tuple(v) if isinstance(v, list) else v
         for k, v in meta["config"].items()}
    cfg = CFConfig(**d)
    if template_state is not None:
        p = ocp.PyTreeCheckpointer().restore(
            path, item=cf_state_payload(template_state)
        )
    else:
        p = ocp.PyTreeCheckpointer().restore(path)
    state = CFTrainState(
        step=jnp.asarray(p["step"], jnp.int32),
        ema_updates=jnp.asarray(p["ema_updates"], jnp.int32),
        trainable=p["trainable"],
        ema_trainable=p["ema_trainable"],
        opt_state=p["opt_state"],
        lagrange_opt_state=p["lagrange_opt_state"],
        skipped=jnp.asarray(p.get("skipped", 0), jnp.int32),
    )
    return cfg, state, meta.get("extra", {})


def cf_get_metrics(
    dataset: str,
    preds: Dict[str, np.ndarray],
    targets: Dict[str, np.ndarray],
) -> Dict[str, float]:
    """Counterfactual-eval metrics (reference get_metrics, train_cf.py:63-108)."""
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

    stats: Dict[str, float] = {}
    for k in preds:
        P, T = np.asarray(preds[k]), np.asarray(targets[k])
        if "ukbb" in dataset:
            if k in ("mri_seq", "sex"):
                stats[k + "_rocauc"] = roc_auc_binary(T, P)
                stats[k + "_acc"] = accuracy_binary(T, P)
            else:
                p = ((P + 1) / 2)
                _max, _min = get_attr_max_min(k)
                p = p * (_max - _min) + _min
                t = ((T + 1) / 2) * (_max - _min) + _min
                norm = 1000.0 if "volume" in k else 1.0
                stats[k + "_mae"] = mae(t, p) / norm
        elif "mimic" in dataset:
            if k in ("sex", "finding"):
                stats[k + "_rocauc"] = roc_auc_binary(T, P)
                stats[k + "_acc"] = accuracy_binary(T, P)
            elif k == "age":
                stats[k + "_mae"] = mae((T + 1) * 50, (P + 1) * 50)
            elif k == "race":
                stats[k + "_acc"] = accuracy_onehot(T, P)
                stats[k + "_rocauc"] = roc_auc_ovr_macro(T, P)
        elif "morphomnist" in dataset:
            if k == "digit":
                stats[k + "_acc"] = accuracy_onehot(T, P)
            else:
                lo, hi = MORPHOMNIST_MIN_MAX[k]
                p = ((P + 1) / 2) * (hi - lo) + lo
                t = ((T + 1) / 2) * (hi - lo) + lo
                stats[k + "_mae"] = mae(t, p)
        else:
            stats[k + "_acc"] = accuracy_onehot(T, P) if T.ndim > 1 else accuracy_binary(T, P)
    return stats


def cf_eval_epoch(
    cfg: CFConfig,
    pgm_cfg: PGMConfig,
    dscm: DSCM,
    state: CFTrainState,
    frozen: Dict[str, Any],
    loaders: Dict[str, Loader],
    eval_step,
    rng: jax.Array,
    do_pa: Optional[str] = None,
) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Eval sweep: do(pa_k) drawn from train-set resamples; counterfactual
    predictions scored against the interventions
    (reference cf_epoch eval branch, train_cf.py:145-153, 181-189)."""
    dag_vars = tuple(dscm.pgm.dag_variables.keys())
    # do-values must live in the PGM's parent space: run the raw train-set
    # attrs through the SAME preprocessing the batches get (UKBB loads raw
    # and preprocess_pgm_batch maps age/volumes to [-1,1]; feeding raw years
    # into a [-1,1]-trained flow exploded every downstream recomputation)
    train_attrs = {
        k: np.asarray(
            preprocess_pgm_batch(
                pgm_cfg, {k: np.asarray(loaders["train"].ds.attrs[k])}
            )[k]
        )
        for k in dag_vars
    }
    host_rng = np.random.default_rng(cfg.seed + 1)
    stats = {k: 0.0 for k in ["loss", "aux_loss", "elbo", "nll", "kl", "morph_loss"]}
    preds: Dict[str, list] = {k: [] for k in dag_vars}
    targets: Dict[str, list] = {k: [] for k in dag_vars}
    n = 0
    for i, raw in enumerate(loaders["valid"]):
        batch = preprocess_pgm_batch(pgm_cfg, raw)
        bs = batch["x"].shape[0]
        do_k = do_pa if do_pa else dag_vars[int(host_rng.integers(0, len(dag_vars)))]
        vals = train_attrs[do_k]
        idx = host_rng.permutation(len(vals))[:bs]
        v = vals[idx]
        do = {do_k: jnp.asarray(v if v.ndim > 1 else v[:, None], jnp.float32)}
        m, p, cfs = eval_step(
            state.ema_trainable, batch, do, jax.random.fold_in(rng, i)
        )
        n += bs
        for k in stats:
            scale = cfg.alpha if k == "aux_loss" else 1.0
            stats[k] += float(m[k]) * scale * bs
        for k in dag_vars:
            preds[k].append(np.asarray(p[k]))
            tgt = do[k] if k in do else cfs[k]
            targets[k].append(np.asarray(tgt))
    stats = {k: v / max(n, 1) for k, v in stats.items()}
    metrics = cf_get_metrics(
        pgm_cfg.dataset,
        {k: np.concatenate(v) for k, v in preds.items()},
        {k: np.concatenate(v) for k, v in targets.items()},
    )
    return stats, metrics


def _reshape_accu_cf(tree, accu: int):
    """(B, ...) leaves -> (accu, B//accu, ...) for the in-step microbatch
    scan. B must be divisible by accu (the Loader's drop_last guarantees
    full batches)."""
    if accu <= 1:
        return tree
    return jax.tree.map(
        lambda v: v.reshape(accu, v.shape[0] // accu, *v.shape[1:]), tree
    )


def cf_train_epoch(
    cfg: CFConfig,
    pgm_cfg: PGMConfig,
    dscm: DSCM,
    state: CFTrainState,
    frozen: Dict[str, Any],
    loader: Loader,
    train_step,
    rng: jax.Array,
    epoch: int,
    host_rng: np.random.Generator,
    multi_step=None,
) -> Tuple[CFTrainState, Dict[str, float]]:
    dag_vars = tuple(dscm.pgm.dag_variables.keys())
    keys = ["loss", "aux_loss", "elbo", "nll", "kl", "morph_loss"]
    accu = max(int(cfg.accu_steps), 1)
    spc = cfg.steps_per_call if multi_step is not None else 1

    ms = []  # per-step metric dicts (device) and batch sizes
    sizes = []

    def prep(i, raw):
        batch = preprocess_pgm_batch(pgm_cfg, raw)
        do = random_intervention(host_rng, dag_vars, batch, cfg.do_pa)
        do_values, do_mask = dense_intervention(dag_vars, batch, do)
        sizes.append(batch["x"].shape[0])
        return tuple(
            _reshape_accu_cf(t, accu) for t in (batch, do_values, do_mask)
        )

    if spc > 1:
        pend, pend_start = [], 0
        for i, raw in enumerate(loader):
            pend.append(prep(i, raw))
            if len(pend) == spc:
                chunk = jax.tree.map(lambda *xs: jnp.stack(xs), *pend)
                offset = jnp.asarray(epoch * 100000 + pend_start, jnp.int32)
                state, m = multi_step(state, *chunk, rng, offset)
                ms.append(m)
                pend, pend_start = [], i + 1
        # partial tail chunk: a different S would force a second full
        # compile of the scanned program — run the leftovers single-step
        tail = []
        for j, (batch, do_values, do_mask) in enumerate(pend):
            key = jax.random.fold_in(rng, epoch * 100000 + pend_start + j)
            state, m = train_step(state, batch, do_values, do_mask, key)
            tail.append(m)
        ms = jax.device_get(ms)
        ms = [
            jax.tree.map(lambda v: v[j], m)
            for m in ms
            for j in range(len(m["skipped"]))
        ] + jax.device_get(tail)
    else:
        for i, raw in enumerate(loader):
            batch, do_values, do_mask = prep(i, raw)
            key = jax.random.fold_in(rng, epoch * 100000 + i)
            state, m = train_step(state, batch, do_values, do_mask, key)
            ms.append(m)
        ms = jax.device_get(ms)

    stats = {k: 0.0 for k in keys}
    n = 0
    for m, bs in zip(ms, sizes):
        if bool(m["skipped"]):
            continue
        n += bs
        for k in stats:
            scale = cfg.alpha if k == "aux_loss" else 1.0
            stats[k] += float(m[k]) * scale * bs
    return state, {k: v / max(n, 1) for k, v in stats.items()}
