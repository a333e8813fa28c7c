"""Counterfactual effectiveness evaluation.

Port target: reference notebooks/eval_example.ipynb cell 9 (cf_epoch +
eval_cf_loop): for each intervention do(pa_k ~ p(pa_k)) over the test set,
generate counterfactual images at sampling temperature t_z = t_u = 0.1,
re-predict the parents with the anticausal predictors (accuracy / MAE
against the intervention targets), and — for Morpho-MNIST — re-MEASURE
thickness/intensity with the true morphometric tools; multi-seed mean+-std.

TPU-native: the whole per-batch counterfactual generation (PGM cf + abduct +
2 decoder passes + prediction) is one jitted program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.config import Config
from causal_gen_tpu.data.loader import Loader
from causal_gen_tpu.pgm.dscm import vae_preprocess
from causal_gen_tpu.pgm.train_cf import cf_get_metrics, dense_intervention
from causal_gen_tpu.utils.metrics import mae
from causal_gen_tpu.utils.normalization import MORPHOMNIST_MIN_MAX


def make_cf_generate_fn(cfg: Config, vae, pgm, predictor,
                        t_z: float = 0.1, t_u: float = 0.1,
                        te_cf: bool = False, alpha: float = 0.65):
    """Returns jitted fn(params, batch, do_values, do_mask, rng) ->
    (cfs, preds). Interventions arrive DENSE (values + mask over all DAG
    variables, pgm/train_cf.py::dense_intervention) so every do-pattern in
    the sweep shares ONE compiled program — the sparse-dict form made each
    distinct intervened-variable set a separate jit specialization, which at
    192^2 through the tunneled backend meant minutes of compile per pattern."""

    def gen(vae_params, pgm_params, pred_params, batch, do_values, do_mask,
            rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        x = batch["x"]
        pa = {k: v for k, v in batch.items() if k != "x"}
        cf_pa = pgm.apply(
            {"params": pgm_params}, pa, do_values, do_mask,
            method=pgm.counterfactual_dense, rngs={"sample": k1},
        )
        _pa = vae_preprocess(cfg, pa)
        _cf_pa = vae_preprocess(cfg, cf_pa)
        zs = vae.apply(
            {"params": vae_params}, x, _pa, t=t_z,
            method=vae.abduct, rngs={"sample": k2},
        )
        zs_plain = [z["z"] if isinstance(z, dict) else z for z in zs]
        rec_loc, rec_scale = vae.apply(
            {"params": vae_params}, zs_plain, _pa,
            method=vae.forward_latents, rngs={"sample": k2},
        )
        u = (x - rec_loc) / jnp.clip(rec_scale, min=1e-12)
        if te_cf and cfg.cond_prior:
            cf_z = vae.apply(
                {"params": vae_params}, x, _pa, cf_parents=_cf_pa, alpha=alpha,
                method=vae.abduct, rngs={"sample": k3},
            )
            cf_loc, cf_scale = vae.apply(
                {"params": vae_params}, cf_z, _cf_pa,
                method=vae.forward_latents, rngs={"sample": k3},
            )
        else:
            cf_loc, cf_scale = vae.apply(
                {"params": vae_params}, zs_plain, _cf_pa,
                method=vae.forward_latents, rngs={"sample": k3},
            )
        cf_x = jnp.clip(cf_loc + cf_scale * t_u * u, -1.0, 1.0)
        cfs = {"x": cf_x, **cf_pa}
        preds = predictor.apply(
            {"params": pred_params}, cf_x, method=predictor.predict,
            rngs={"sample": rng}, **cf_pa,
        )
        return cfs, preds

    return jax.jit(gen)


def eval_counterfactuals(
    cfg: Config,
    vae, vae_params,
    pgm, pgm_params,
    predictor, pred_params,
    loader: Loader,
    train_attrs: Dict[str, np.ndarray],
    do_pa: Optional[str] = None,
    seed: int = 0,
    measure: bool = True,
    te_cf: bool = False,
    alpha: float = 0.65,
) -> Dict[str, float]:
    """One evaluation sweep (one seed): returns per-variable metrics and,
    for Morpho-MNIST, measured thickness/intensity MAEs. ``te_cf`` switches
    the cond_prior total-effect path (mediator z* via the alpha-mixture
    abduction, eval_example.ipynb cell 9)."""
    gen = make_cf_generate_fn(cfg, vae, pgm, predictor, te_cf=te_cf, alpha=alpha)
    rng = jax.random.PRNGKey(seed)
    host = np.random.default_rng(seed)
    dag_vars = list(pgm.dag_variables.keys())

    P: Dict[str, List[np.ndarray]] = {k: [] for k in dag_vars}
    T: Dict[str, List[np.ndarray]] = {k: [] for k in dag_vars}
    cf_images: List[np.ndarray] = []
    for i, raw in enumerate(loader):
        batch = {
            "x": (jnp.asarray(raw["x"], jnp.float32) - 127.5) / 127.5,
            **{k: jnp.asarray(v if v.ndim > 1 else v[:, None], jnp.float32)
               for k, v in raw.items() if k != "x"},
        }
        bs = raw["x"].shape[0]
        # do(pa_k ~ p(pa_k)) via train-set resamples (notebook cell 9)
        do = {}
        keys = [do_pa] if do_pa else [
            k for k in dag_vars if host.random() > 0.5
        ] or [dag_vars[int(host.integers(0, len(dag_vars)))]]
        for k in keys:
            vals = train_attrs[k]
            idx = host.permutation(len(vals))[:bs]
            v = vals[idx]
            do[k] = jnp.asarray(v if v.ndim > 1 else v[:, None], jnp.float32)
        do_values, do_mask = dense_intervention(tuple(dag_vars), batch, do)
        cfs, preds = gen(
            vae_params, pgm_params, pred_params, batch, do_values, do_mask,
            jax.random.fold_in(rng, i),
        )
        cf_images.append(np.asarray(cfs["x"]))
        for k in dag_vars:
            P[k].append(np.asarray(preds[k]))
            tgt = do[k] if k in do else cfs[k]
            T[k].append(np.asarray(tgt))

    Pc = {k: np.concatenate(v) for k, v in P.items()}
    Tc = {k: np.concatenate(v) for k, v in T.items()}
    # Per-variable metrics in PHYSICAL units via the same per-dataset
    # unnormalization as the CF-training eval surface (reference
    # train_cf.py:63-108): ukbb volumes in ml (the /1000 convention), ages
    # in years, binaries as ROC-AUC/acc rather than prob-MAE — so the
    # effectiveness tables read directly against the paper's scales.
    stats: Dict[str, float] = dict(cf_get_metrics(cfg.name, Pc, Tc))

    if measure and "morphomnist" in cfg.name:
        from causal_gen_tpu.eval.morphometrics import (
            get_intensity,
            measure_thickness,
        )

        x_cf = (np.concatenate(cf_images)[..., 0] + 1.0) * 127.5  # (N,H,W)
        measured_i = get_intensity(x_cf)
        measured_t = measure_thickness(x_cf)
        for k, measured in [("thickness", measured_t), ("intensity", measured_i)]:
            lo, hi = MORPHOMNIST_MIN_MAX[k]
            target = ((Tc[k][:, 0] + 1) / 2) * (hi - lo) + lo
            stats[k + "_measured_mae"] = mae(target, measured)
    return stats


def eval_cf_loop(
    cfg: Config, vae, vae_params, pgm, pgm_params, predictor, pred_params,
    loader: Loader, train_attrs: Dict[str, np.ndarray],
    seeds: Tuple[int, ...] = (0, 1, 2), do_pa: Optional[str] = None,
    measure: bool = True, te_cf: bool = False, alpha: float = 0.65,
) -> Dict[str, Tuple[float, float]]:
    """Multi-seed mean+-std (eval_example.ipynb cell 9 protocol)."""
    runs = [
        eval_counterfactuals(
            cfg, vae, vae_params, pgm, pgm_params, predictor, pred_params,
            loader, train_attrs, do_pa=do_pa, seed=s, measure=measure,
            te_cf=te_cf, alpha=alpha,
        )
        for s in seeds
    ]
    out = {}
    for k in runs[0]:
        vals = np.array([r[k] for r in runs])
        out[k] = (float(vals.mean()), float(vals.std()))
    return out
