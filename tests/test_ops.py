"""Unit + golden parity tests for the distribution/likelihood math.

Goldens were produced by executing the reference implementation (torch CPU)
via tools/make_goldens.py; see SURVEY.md §4 test strategy (a)/(c).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from causal_gen_tpu.ops import dmol as dmol_ops
from causal_gen_tpu.ops import distributions as D

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def load(name):
    return np.load(os.path.join(GOLD, name + ".npz"))


def test_gaussian_kl_golden():
    g = load("gaussian_kl")
    kl = D.gaussian_kl(g["q_loc"], g["q_logscale"], g["p_loc"], g["p_logscale"])
    np.testing.assert_allclose(np.asarray(kl), g["kl"], rtol=3e-5, atol=1e-6)


def test_gaussian_kl_zero_at_equality():
    loc = jnp.array([[0.3, -1.2]])
    ls = jnp.array([[0.1, -0.4]])
    kl = D.gaussian_kl(loc, ls, loc, ls)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)


def test_sample_gaussian_deterministic():
    key = jax.random.PRNGKey(7)
    a = D.sample_gaussian(key, jnp.zeros((3, 4)), jnp.zeros((3, 4)))
    b = D.sample_gaussian(key, jnp.zeros((3, 4)), jnp.zeros((3, 4)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_discretized_gaussian_nll_golden():
    g = load("dgauss_nll")
    # golden is NCHW; our convention is NHWC
    x = np.transpose(g["x"], (0, 2, 3, 1))
    loc = np.transpose(g["loc"], (0, 2, 3, 1))
    logscale = np.transpose(g["logscale"], (0, 2, 3, 1))
    nll = D.discretized_gaussian_nll(jnp.array(loc), jnp.array(logscale), jnp.array(x))
    np.testing.assert_allclose(np.asarray(nll), g["nll"], rtol=1e-5, atol=1e-6)


def test_dgauss_head_conv_golden():
    """1x1-conv head params from the reference reproduce loc/logscale."""
    g = load("dgauss_nll")
    h = np.transpose(g["h"], (0, 2, 3, 1))  # NCHW -> NHWC
    w_loc = g["w_loc"][:, :, 0, 0].T  # (out,in,1,1) -> (in,out)
    w_ls = g["w_ls"][:, :, 0, 0].T
    loc = jnp.einsum("bhwc,co->bhwo", jnp.array(h), jnp.array(w_loc)) + g["b_loc"]
    logscale = jnp.clip(
        jnp.einsum("bhwc,co->bhwo", jnp.array(h), jnp.array(w_ls)) + g["b_ls"],
        min=D.EPS_LOGSCALE,
    )
    np.testing.assert_allclose(
        np.asarray(loc), np.transpose(g["loc"], (0, 2, 3, 1)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logscale),
        np.transpose(g["logscale"], (0, 2, 3, 1)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_dmol_loss_golden():
    g = load("dmol")
    loss = dmol_ops.discretized_mix_logistic_loss(jnp.array(g["x"]), jnp.array(g["l"]))
    np.testing.assert_allclose(np.asarray(loss), g["loss"], rtol=1e-5, atol=1e-6)


def test_dmol_loss_low_bit_golden():
    g = load("dmol")
    loss = dmol_ops.discretized_mix_logistic_loss(
        jnp.array(g["x"]), jnp.array(g["l"]), low_bit=True
    )
    np.testing.assert_allclose(np.asarray(loss), g["loss_low_bit"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mask", ["soft", "hard", "top3"])
def test_dmol_mean_decode_golden(mask):
    g = load("dmol")
    got, scale = dmol_ops.mean_discretized_mix_logistic(jnp.array(g["l"]), 10, mask=mask)
    np.testing.assert_allclose(
        np.asarray(got), g[f"mean_{mask}"], rtol=1e-5, atol=1e-5
    )
    if mask == "soft":
        np.testing.assert_allclose(np.asarray(scale), g["scale_soft"], rtol=1e-5, atol=1e-6)


def test_dmol_sample_in_range_and_deterministic():
    g = load("dmol")
    key = jax.random.PRNGKey(0)
    s1, sc1 = dmol_ops.sample_from_discretized_mix_logistic(key, jnp.array(g["l"]), 10)
    s2, _ = dmol_ops.sample_from_discretized_mix_logistic(key, jnp.array(g["l"]), 10)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert np.all(np.asarray(s1) >= -1.0) and np.all(np.asarray(s1) <= 1.0)
    assert s1.shape == g["x"].shape


def test_dmol_temperature_reduces_spread():
    g = load("dmol")
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    l = jnp.array(g["l"])
    hot = np.std([np.asarray(dmol_ops.sample_from_discretized_mix_logistic(k, l, 10, t=1.0)[0]) for k in keys], axis=0)
    cold = np.std([np.asarray(dmol_ops.sample_from_discretized_mix_logistic(k, l, 10, t=0.1)[0]) for k in keys], axis=0)
    assert cold.mean() < hot.mean()


def test_log_prob_from_logits_is_log_softmax():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10)) * 3
    np.testing.assert_allclose(
        np.asarray(D.log_prob_from_logits(x)),
        np.asarray(jax.nn.log_softmax(x, axis=-1)),
        rtol=1e-6,
        atol=1e-6,
    )


def test_elementary_logprobs():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (16,))
    # normal
    lp = D.normal_logpdf(x, 0.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(lp), -0.5 * np.asarray(x) ** 2 - 0.5 * np.log(2 * np.pi), rtol=1e-6
    )
    # bernoulli logits vs probs paths agree
    logits = jax.random.normal(key, (16,))
    b = (jax.random.uniform(key, (16,)) < 0.5).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(D.bernoulli_logpmf_logits(b, logits)),
        np.asarray(D.bernoulli_logpmf_probs(b, jax.nn.sigmoid(logits))),
        rtol=1e-4, atol=1e-5,
    )
    # onehot categorical sums to valid log prob
    oh = jax.nn.one_hot(jnp.array([1, 3]), 5)
    lg = jnp.zeros((2, 5))
    np.testing.assert_allclose(
        np.asarray(D.onehot_categorical_logpmf(oh, lg)), np.log(1 / 5) * np.ones(2), rtol=1e-6
    )
