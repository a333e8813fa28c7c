"""DSCM: merged mechanisms + full-image counterfactual engine.

Port target: reference src/pgm/dscm.py (DSCM module 16-95, ukbb_preprocess
98-118, vae_preprocess 121-132) and the Lagrangian objective of
train_cf.py.

TPU-native redesign: the DSCM is not an nn.Module graph but a composition of
three (module, params) pairs — frozen PGM, frozen predictor, trainable VAE —
plus the scalar Lagrange multiplier. The whole abduct-act-predict pipeline
(PGM counterfactual + HVAE abduction + two decoder passes per particle +
predictor ELBO + Lagrangian) traces into ONE jittable function; particles are
a static Python loop inside the program (the reference loops on the host with
a fresh graph per particle, dscm.py:43-63).

Semantics preserved:
- pixel-level abduction u = (x - rec_loc)/rec_scale with 1e-12 floor and
  cf_x = clamp(cf_loc + cf_scale*u, [-1,1]) (dscm.py:55-56)
- multi-particle mean + Var[X] = E[X^2] - E[X]^2 uncertainty map (58-72)
- Lagrangian loss = aux - (lmbda - damping*sg(eps - elbo))*(eps - elbo) with
  sg = stop_gradient (85-88)
- the UKBB [-1,1] <-> log-standard parent conversion constants (98-118) are
  preserved bit-for-bit (checkpoint compatibility, SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from causal_gen_tpu.config import Config
from causal_gen_tpu.utils.normalization import get_attr_max_min

# log-standardization constants of the UKBB training set
# (reference dscm.py:108-117; load-bearing for checkpoint compat)
UKBB_LOG_STANDARD = {
    "age": (4.112339973449707, 0.11769197136163712),
    "brain_volume": (13.965583801269531, 0.09537758678197861),
    "ventricle_volume": (10.345998764038086, 0.43127763271331787),
}


def ukbb_preprocess(pa: Dict[str, Array]) -> Dict[str, Array]:
    """[-1,1] PGM parent space -> log-standard VAE parent space
    (reference dscm.py:98-118)."""
    out = dict(pa)
    for k, v in pa.items():
        if k not in ("mri_seq", "sex"):
            v01 = (v + 1) / 2
            _max, _min = get_attr_max_min(k)
            out[k] = v01 * (_max - _min) + _min
    for k, (mu, sd) in UKBB_LOG_STANDARD.items():
        if k in out:
            out[k] = (jnp.log(jnp.clip(out[k], min=1e-12)) - mu) / sd
    return out


def vae_preprocess(cfg: Config, pa: Dict[str, Array]) -> Array:
    """Concatenate parents in cfg.parents_x order -> (B, context_dim)
    (reference dscm.py:121-132; we skip the HxW broadcast — our VAE consumes
    parent vectors and broadcasts lazily at each conv)."""
    if "ukbb" in cfg.name:
        pa = ukbb_preprocess(pa)
    cols = []
    for k in cfg.parents_x:
        v = pa[k]
        cols.append(v if v.ndim > 1 else v[..., None])
    return jnp.concatenate(cols, axis=1).astype(jnp.float32)


@dataclass
class DSCM:
    """Merged-mechanism model (reference dscm.py:16-95).

    ``vae_params``/``lmbda`` are the trainable leaves; ``pgm_params`` and
    ``predictor_params`` are frozen (stop_gradient applied inside forward,
    mirroring requires_grad_(False) at dscm.py:21-24).
    """

    cfg: Config  # VAE config (name/parents_x/beta drive preprocessing)
    pgm: Any  # BasePGMModule (the causal DAG over attributes)
    predictor: Any  # BasePGMModule instance used for anticausal_logprob
    vae: Any  # HVAE or SimpleVAE module
    elbo_constraint: float = 0.0  # eps (train_cf.py:409)
    lmbda_init: float = 0.0
    damping: float = 100.0
    # differentiable measured-morphometry penalty (ops/soft_morph.py; no
    # reference counterpart — addresses the measured-thickness regression
    # the predictor-only objective causes). Active on Morpho-MNIST when
    # the weights are > 0.
    thickness_weight: float = 0.0
    intensity_weight: float = 0.0
    thickness_calib: Tuple[float, float] = (1.0, 0.0)
    # rematerialize each HVAE pass in backward: the CF loss differentiates
    # through THREE decoder passes (abduct + 2x forward_latents) plus the
    # factual ELBO — without remat their activations coexist and 192^2
    # training is pinned to bs=16 by HBM (RESULTS.md "HBM finding"); with it
    # only one pass's residuals are live at a time, letting bs=128's
    # batch-on-lanes layouts fit at ~1.3x recompute.
    remat: bool = False

    def init_trainable(self, vae_params: Any) -> Dict[str, Any]:
        return {
            "vae": vae_params,
            "lmbda": jnp.full((1,), self.lmbda_init, jnp.float32),
        }

    def forward(
        self,
        trainable: Dict[str, Any],
        frozen: Dict[str, Any],  # {"pgm": params, "predictor": params}
        obs: Dict[str, Array],
        do: Dict[str, Array],
        rng: Array,
        cf_particles: int = 1,
        beta: Optional[float] = None,
        t_abduct: Optional[float] = None,
        do_mask: Optional[Dict[str, Array]] = None,
    ) -> Dict[str, Any]:
        """When ``do_mask`` is given, ``do`` must contain (B, d) values for
        every masked variable and the dense one-program counterfactual path
        is used (no per-intervention recompilation)."""
        cfg = self.cfg
        beta = cfg.beta if beta is None else beta
        vae_params = trainable["vae"]
        lmbda = trainable["lmbda"]
        pgm_params = jax.lax.stop_gradient(frozen["pgm"])
        pred_params = jax.lax.stop_gradient(frozen["predictor"])

        x = obs["x"]
        pa = {k: v for k, v in obs.items() if k != "x"}
        _pa = vae_preprocess(cfg, pa)

        # optional remat of each full HVAE pass (see class docstring): the
        # wrapped functions are pure in (params, arrays, key) so backward
        # recomputes them instead of keeping 3-4 passes of activations live
        ckpt = jax.checkpoint if self.remat else (lambda f: f)

        def fact_fn(p, x_, pa_, key):
            return self.vae.apply(
                {"params": p}, x_, pa_, beta=beta, train=False,
                rngs={"sample": key},
            )

        def abduct_fn(p, x_, pa_, key):
            return self.vae.apply(
                {"params": p}, x_, pa_, t=t_abduct,
                method=self.vae.abduct, rngs={"sample": key},
            )

        def decode_fn(p, zs_, pa_, key):
            return self.vae.apply(
                {"params": p}, zs_, pa_,
                method=self.vae.forward_latents, rngs={"sample": key},
            )

        r_fact, r_loop = jax.random.split(rng)
        vae_out = ckpt(fact_fn)(vae_params, x, _pa, r_fact)

        cf_sum = jnp.zeros_like(x)
        cf_sq = jnp.zeros_like(x)
        cf_pa: Dict[str, Array] = {}
        for p in range(cf_particles):
            kp = jax.random.fold_in(r_loop, p)
            k1, k2, k3, k4 = jax.random.split(kp, 4)
            if do_mask is not None:
                cf_pa = self.pgm.apply(
                    {"params": pgm_params}, pa, do, do_mask,
                    method=self.pgm.counterfactual_dense, rngs={"sample": k1},
                )
            else:
                cf_pa = self.pgm.apply(
                    {"params": pgm_params}, pa, do,
                    method=self.pgm.counterfactual, rngs={"sample": k1},
                )
            _cf_pa = vae_preprocess(cfg, cf_pa)
            zs = ckpt(abduct_fn)(vae_params, x, _pa, k2)
            # cond_prior abduction returns {z, q_loc, q_logscale} dicts
            # (vae.py:271-276); the decoder consumes plain latents
            zs = [z["z"] if isinstance(z, dict) else z for z in zs]
            cf_loc, cf_scale = ckpt(decode_fn)(vae_params, zs, _cf_pa, k3)
            rec_loc, rec_scale = ckpt(decode_fn)(vae_params, zs, _pa, k4)
            u = (x - rec_loc) / jnp.clip(rec_scale, min=1e-12)
            cf_x = jnp.clip(cf_loc + cf_scale * u, -1.0, 1.0)
            cf_sum = cf_sum + cf_x
            cf_sq = cf_sq + jax.lax.stop_gradient(cf_x) ** 2

        cf_x_mean = cf_sum / cf_particles
        if cf_particles > 1:
            var_cf_x = jax.lax.stop_gradient(
                (cf_sq - cf_sum**2 / cf_particles) / cf_particles
            )
        else:
            var_cf_x = None

        cfs = {"x": cf_x_mean, **cf_pa}
        bs = x.shape[0]

        def aux_fn(p, cf_x_, cf_pa_, key):
            return self.predictor.apply(
                {"params": p}, cf_x_,
                method=self.predictor.anticausal_logprob,
                rngs={"sample": key}, **cf_pa_,
            )

        aux_lps = ckpt(aux_fn)(pred_params, cfs["x"], cf_pa, rng)
        aux_loss = -sum(jnp.sum(v) for v in aux_lps.values()) / bs

        # Lagrangian with damping (dscm.py:85-88)
        constraint = self.elbo_constraint - vae_out["elbo"]
        sg = jax.lax.stop_gradient(constraint)
        damp = self.damping * sg
        loss = aux_loss - jnp.sum((lmbda - damp) * constraint)

        morph_loss = jnp.zeros(())
        if self.thickness_weight > 0 and "thickness" in cf_pa:
            from causal_gen_tpu.ops.soft_morph import soft_thickness
            from causal_gen_tpu.utils.normalization import MORPHOMNIST_MIN_MAX

            lo, hi = MORPHOMNIST_MIN_MAX["thickness"]
            tgt = (cf_pa["thickness"].reshape(bs) + 1) / 2 * (hi - lo) + lo
            est = soft_thickness(
                (cf_x_mean[..., 0] + 1.0) / 2.0, calib=self.thickness_calib
            )
            morph_loss = morph_loss + self.thickness_weight * jnp.abs(
                est - jax.lax.stop_gradient(tgt)
            ).mean()
        if self.intensity_weight > 0 and "intensity" in cf_pa:
            from causal_gen_tpu.ops.soft_morph import soft_intensity
            from causal_gen_tpu.utils.normalization import MORPHOMNIST_MIN_MAX

            lo, hi = MORPHOMNIST_MIN_MAX["intensity"]
            tgt = (cf_pa["intensity"].reshape(bs) + 1) / 2 * (hi - lo) + lo
            est = soft_intensity((cf_x_mean[..., 0] + 1.0) * 127.5)
            morph_loss = morph_loss + self.intensity_weight * jnp.abs(
                est - jax.lax.stop_gradient(tgt)
            ).mean()
        loss = loss + morph_loss

        out = dict(vae_out)
        out.update(
            {"loss": loss, "aux_loss": aux_loss, "cfs": cfs,
             "var_cf_x": var_cf_x, "morph_loss": morph_loss}
        )
        return out
