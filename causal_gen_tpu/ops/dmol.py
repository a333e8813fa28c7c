"""Discretized mixture-of-logistics likelihood (pure JAX, channels-last).

Port target: reference src/dmol.py (loss 24-118, sampling 121-161, mean decode
164-215). Our tensors are NHWC natively so no permutes are needed at the model
boundary (the reference permutes NCHW<->NHWC at dmol.py:229-245).

Parameterization (nr_mix=K mixtures, RGB): l[..., :K] are mixture logits; the
remaining 9K channels reshape to (..., 3, 3K) = per-RGB (means, log_scales,
coeffs). Autoregression over subpixels: green mean is shifted by coeff0*red,
blue by coeff1*red + coeff2*green (reference dmol.py:42-55).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from causal_gen_tpu.ops.distributions import log_prob_from_logits


def _unpack(l: Array, nr_mix: int) -> Tuple[Array, Array, Array, Array]:
    """Split raw conv output (B,H,W,10K) -> logits (B,H,W,K) and per-channel
    means/log_scales/coeffs each (B,H,W,3,K)."""
    logit_probs = l[..., :nr_mix]
    rest = l[..., nr_mix:].reshape(*l.shape[:-1], 3, nr_mix * 3)
    means = rest[..., :nr_mix]
    log_scales = jnp.clip(rest[..., nr_mix : 2 * nr_mix], min=-7.0)
    coeffs = jnp.tanh(rest[..., 2 * nr_mix : 3 * nr_mix])
    return logit_probs, means, log_scales, coeffs


def _shift_means(means: Array, coeffs: Array, x: Array) -> Array:
    """Condition green/blue means on true (loss) or sampled (decode) subpixels.

    x: (B,H,W,3[,1]) broadcastable to means (B,H,W,3,K).
    """
    m0 = means[..., 0, :]
    m1 = means[..., 1, :] + coeffs[..., 0, :] * x[..., 0, :]
    m2 = means[..., 2, :] + coeffs[..., 1, :] * x[..., 0, :] + coeffs[..., 2, :] * x[..., 1, :]
    return jnp.stack([m0, m1, m2], axis=-2)


def discretized_mix_logistic_loss(x: Array, l: Array, low_bit: bool = False) -> Array:
    """Per-image mean NLL; x (B,H,W,3) in [-1,1], l (B,H,W,10K).

    Bit-level parity with reference dmol.py:24-118 (clamps -7 logscale, 1e-12
    cdf floor, 1e-5 delta switch, log(127.5)/log(15.5) tail approximations).
    """
    nr_mix = l.shape[-1] // 10
    logit_probs, means, log_scales, coeffs = _unpack(l, nr_mix)
    x_b = x[..., None]  # (B,H,W,3,1) broadcast against K mixtures
    means = _shift_means(means, coeffs, x_b)
    centered_x = x_b - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / 31.0 if low_bit else 1.0 / 255.0
    plus_in = inv_stdv * (centered_x + half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_x - half_bin)
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # x == 0 edge case
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)  # x == 255 edge case
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered_x
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
    tail = math.log(15.5) if low_bit else math.log(127.5)
    log_probs = jnp.where(
        x_b < -0.999,
        log_cdf_plus,
        jnp.where(
            x_b > 0.999,
            log_one_minus_cdf_min,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.clip(cdf_delta, min=1e-12)),
                log_pdf_mid - tail,
            ),
        ),
    )
    # sum over RGB, mix over components, sum over H,W; mean per dim
    log_probs = jnp.sum(log_probs, axis=-2) + log_prob_from_logits(logit_probs)
    mixture_probs = jax.nn.logsumexp(log_probs, axis=-1)
    n_dims = math.prod(x.shape[1:])
    return -1.0 * jnp.sum(mixture_probs, axis=(1, 2)) / n_dims


def _autoregress_clip(x: Array, coeffs_sel: Array) -> Array:
    x0 = jnp.clip(x[..., 0], -1.0, 1.0)
    x1 = jnp.clip(x[..., 1] + coeffs_sel[..., 0] * x0, -1.0, 1.0)
    x2 = jnp.clip(x[..., 2] + coeffs_sel[..., 1] * x0 + coeffs_sel[..., 2] * x1, -1.0, 1.0)
    return jnp.stack([x0, x1, x2], axis=-1)


def sample_from_discretized_mix_logistic(
    key: Array, l: Array, nr_mix: int, t: Optional[float] = None
) -> Tuple[Array, Array]:
    """Gumbel-max mixture select + logistic inverse-CDF sample.

    Mirrors reference dmol.py:121-161 (uniforms in [1e-5, 1-1e-5]); returns
    (sample, scale) both (B,H,W,3).
    """
    logit_probs, means_all, log_scales_all, coeffs_all = _unpack(l, nr_mix)
    k_mix, k_u = jax.random.split(key)
    eps = jax.random.uniform(k_mix, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)
    amax = jnp.argmax(logit_probs - jnp.log(-jnp.log(eps)), axis=-1)
    sel = jax.nn.one_hot(amax, nr_mix)[..., None, :]  # (B,H,W,1,K)
    means = jnp.sum(means_all * sel, axis=-1)
    log_scales = jnp.clip(jnp.sum(log_scales_all * sel, axis=-1), min=-7.0)
    coeffs = jnp.sum(coeffs_all * sel, axis=-1)
    u = jax.random.uniform(k_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    if t is not None:
        log_scales = log_scales + math.log(t)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return _autoregress_clip(x, coeffs), jnp.exp(log_scales)


def mean_discretized_mix_logistic(
    l: Array, nr_mix: int, mask: str = "soft"
) -> Tuple[Array, Array]:
    """Deterministic decode; soft/hard/top-k mixture masks (dmol.py:164-215)."""
    logit_probs, means_all, log_scales_all, coeffs_all = _unpack(l, nr_mix)
    if mask == "soft":
        sel = jnp.exp(log_prob_from_logits(logit_probs))[..., None, :]
    elif mask == "hard":
        amax = jnp.argmax(logit_probs, axis=-1)
        sel = jax.nn.one_hot(amax, nr_mix)[..., None, :]
    elif mask.startswith("top"):
        top_k = int(mask[-1])
        if top_k >= nr_mix:
            raise ValueError("invalid top_k")
        v = jnp.sort(logit_probs, axis=-1, descending=True)
        kth = v[..., top_k - 1][..., None]
        masked = jnp.where(logit_probs < kth, -jnp.inf, logit_probs)
        sel = jnp.exp(log_prob_from_logits(masked))[..., None, :]
    else:
        raise NotImplementedError(mask)
    means = jnp.sum(means_all * sel, axis=-1)
    log_scales = jnp.clip(jnp.sum(log_scales_all * sel, axis=-1), min=-7.0)
    coeffs = jnp.sum(coeffs_all * sel, axis=-1)
    return _autoregress_clip(means, coeffs), jnp.exp(log_scales)
