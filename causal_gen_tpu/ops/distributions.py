"""Pure-function distribution math for the image mechanisms.

TPU-native port targets (formula parity, see tests/goldens):
- gaussian_kl / sample_gaussian: reference src/vae.py:14-30
- discretized Gaussian NLL with tanh approx-CDF: reference src/vae.py:388-411
- EPS logscale floor: reference src/vae.py:11

Everything is a pure jnp function of explicit arrays + PRNG keys so it can be
vmapped/jitted/sharded freely and later swapped for Pallas-fused kernels.
Computations are kept in float32: the clamp constants (1e-12 CDF floors) are
below bf16 resolution (SURVEY.md §7 "Numerical parity").
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import Array

EPS_LOGSCALE = -9.0  # minimum logscale (reference vae.py:11)


def gaussian_kl(q_loc: Array, q_logscale: Array, p_loc: Array, p_logscale: Array) -> Array:
    """KL(q || p) per element for diagonal Gaussians (reference vae.py:14-25)."""
    return (
        -0.5
        + p_logscale
        - q_logscale
        + 0.5
        * (jnp.exp(q_logscale) ** 2 + (q_loc - p_loc) ** 2)
        / jnp.exp(p_logscale) ** 2
    )


def sample_gaussian(key: Array, loc: Array, logscale: Array) -> Array:
    """Reparameterized Gaussian sample (reference vae.py:28-30)."""
    return loc + jnp.exp(logscale) * jax.random.normal(key, loc.shape, loc.dtype)


def approx_cdf(x: Array) -> Array:
    """tanh-based standard normal CDF approximation (reference vae.py:388-391)."""
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_nll(loc: Array, logscale: Array, x: Array) -> Array:
    """Per-image mean NLL of 8-bit-discretized Gaussian likelihood.

    x is in [-1, 1]; bin width 2/255. Mirrors reference vae.py:393-411
    (DGaussNet.nll) including clamp constants; reduces with mean over all
    non-batch axes.
    """
    centered_x = x - loc
    inv_stdv = jnp.exp(-logscale)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    reduce_axes = tuple(range(1, x.ndim))
    return -1.0 * jnp.mean(log_probs, axis=reduce_axes)


def log_prob_from_logits(x: Array) -> Array:
    """Numerically stable log-softmax over the last axis (reference dmol.py:7-11)."""
    m = jnp.max(x, axis=-1, keepdims=True)
    return x - m - jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


# ---------------------------------------------------------------------------
# Elementary log-probs for the PGM layer (replaces torch.distributions usage in
# reference flow_pgm.py; kept as plain functions for SCM-site composition).
# ---------------------------------------------------------------------------

_LOG_2PI = math.log(2.0 * math.pi)


def normal_logpdf(x: Array, loc: Array, scale: Array) -> Array:
    z = (x - loc) / scale
    return -0.5 * (z**2 + _LOG_2PI) - jnp.log(scale)


def bernoulli_logpmf_logits(x: Array, logits: Array) -> Array:
    # log p = x*log(sigmoid(l)) + (1-x)*log(1-sigmoid(l)) = x*l - softplus(l)
    return x * logits - jax.nn.softplus(logits)


def bernoulli_logpmf_probs(x: Array, probs: Array, eps: float = 1e-7) -> Array:
    p = jnp.clip(probs, eps, 1.0 - eps)
    return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)


def onehot_categorical_logpmf(x_onehot: Array, logits: Array) -> Array:
    """log p(one-hot x) under Categorical(logits); sums over the class axis."""
    return jnp.sum(x_onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def gumbel_logpdf(x: Array, loc: Array, scale: Array) -> Array:
    z = (x - loc) / scale
    return -(z + jnp.exp(-z)) - jnp.log(scale)


def sample_bernoulli(key: Array, logits: Array, shape=None) -> Array:
    p = jax.nn.sigmoid(logits)
    shape = shape if shape is not None else jnp.shape(p)
    return (jax.random.uniform(key, shape) < p).astype(jnp.float32)


def sample_onehot_categorical(key: Array, logits: Array, shape_prefix=()) -> Array:
    """Sample one-hot from Categorical(logits); logits may broadcast."""
    n = logits.shape[-1]
    idx = jax.random.categorical(key, logits, shape=(*shape_prefix,) if shape_prefix else None)
    return jax.nn.one_hot(idx, n, dtype=jnp.float32)


def sample_gumbel(key: Array, shape, loc=0.0, scale=1.0, dtype=jnp.float32) -> Array:
    return loc + scale * jax.random.gumbel(key, shape, dtype)
