"""Model-level tests: likelihood-head golden parity (params injected from the
reference checkpoint format) and HVAE/SimpleVAE mechanism-API behavior."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from causal_gen_tpu.config import get_config
from causal_gen_tpu.models.hvae import HVAE
from causal_gen_tpu.models.likelihoods import DGaussNet
from causal_gen_tpu.models.simple_vae import SimpleVAE

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def load(name):
    return np.load(os.path.join(GOLD, name + ".npz"))


# ---------------------------------------------------------------------------
# DGaussNet head parity (reference vae.py:322-423)
# ---------------------------------------------------------------------------


def test_dgauss_head_golden_gray():
    g = load("dgauss_nll")
    h = jnp.array(np.transpose(g["h"], (0, 2, 3, 1)))  # NCHW -> NHWC
    x = jnp.array(np.transpose(g["x"], (0, 2, 3, 1)))
    net = DGaussNet(input_channels=1, width=8, x_like="diag_dgauss", std_init=0.0)
    params = {
        "x_loc": {
            # torch (out,in,1,1) -> flax (1,1,in,out)
            "kernel": jnp.array(g["w_loc"].transpose(2, 3, 1, 0)),
            "bias": jnp.array(g["b_loc"]),
        },
        "x_logscale_kernel": jnp.array(g["w_ls"][:, :, 0, 0].T),
        "x_logscale_bias": jnp.array(g["b_ls"]),
    }
    nll = net.apply({"params": params}, h, x, method="nll")
    np.testing.assert_allclose(np.asarray(nll), g["nll"], rtol=3e-5, atol=1e-6)


def test_dgauss_head_golden_rgb():
    g = load("dgauss_rgb")
    h = jnp.array(np.transpose(g["h"], (0, 2, 3, 1)))
    x = jnp.array(np.transpose(g["x"], (0, 2, 3, 1)))
    net = DGaussNet(input_channels=3, width=8, x_like="diag_dgauss", std_init=0.0)
    params = {
        "x_loc": {
            "kernel": jnp.array(g["x_loc__weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.array(g["x_loc__bias"]),
        },
        "x_logscale_kernel": jnp.array(g["x_logscale__weight"][:, :, 0, 0].T),
        "x_logscale_bias": jnp.array(g["x_logscale__bias"]),
        "channel_coeffs": {
            "kernel": jnp.array(g["channel_coeffs__weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.array(g["channel_coeffs__bias"]),
        },
    }
    nll = net.apply({"params": params}, h, x, method="nll")
    np.testing.assert_allclose(np.asarray(nll), g["nll"], rtol=3e-5, atol=1e-6)
    loc, logscale = net.apply({"params": params}, h)  # inference path x=None
    np.testing.assert_allclose(
        np.asarray(loc), np.transpose(g["loc_inf"], (0, 2, 3, 1)), rtol=3e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# HVAE mechanism API
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hvae_setup():
    cfg = get_config("morphomnist", bs=2)
    model = HVAE(cfg=cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (2, 32, 32, 1), minval=-1, maxval=1)
    pa = jax.random.uniform(jax.random.PRNGKey(1), (2, 12), minval=-1, maxval=1)
    variables = model.init({"params": k, "sample": k}, x, pa)
    return cfg, model, variables, x, pa


def test_hvae_forward_outputs(hvae_setup):
    _, model, vs, x, pa = hvae_setup
    out = model.apply(vs, x, pa, 1.0, True, rngs={"sample": jax.random.PRNGKey(2)})
    for k in ("elbo", "nll", "kl"):
        assert out[k].shape == ()
        assert np.isfinite(float(out[k]))
    assert float(out["kl"]) >= 0 or True  # MC kl can be slightly negative per-elem
    # elbo = nll + beta*kl
    np.testing.assert_allclose(
        float(out["elbo"]), float(out["nll"]) + float(out["kl"]), rtol=1e-5
    )


def test_hvae_beta_scaling(hvae_setup):
    _, model, vs, x, pa = hvae_setup
    r = {"sample": jax.random.PRNGKey(3)}
    o1 = model.apply(vs, x, pa, 1.0, False, rngs=r)
    o5 = model.apply(vs, x, pa, 5.0, False, rngs=r)
    np.testing.assert_allclose(
        float(o5["elbo"]), float(o5["nll"]) + 5.0 * float(o5["kl"]), rtol=1e-5
    )
    # same rng stream => same nll/kl regardless of beta
    np.testing.assert_allclose(float(o1["nll"]), float(o5["nll"]), rtol=1e-6)


def test_hvae_determinism_same_key(hvae_setup):
    _, model, vs, x, pa = hvae_setup
    k = jax.random.PRNGKey(11)
    a = model.apply(vs, x, pa, 1.0, True, rngs={"sample": k})
    b = model.apply(vs, x, pa, 1.0, True, rngs={"sample": k})
    assert float(a["elbo"]) == float(b["elbo"])
    c = model.apply(vs, x, pa, 1.0, True, rngs={"sample": jax.random.PRNGKey(12)})
    assert float(a["elbo"]) != float(c["elbo"])


def test_hvae_abduct_forward_latents_roundtrip(hvae_setup):
    """forward_latents on abducted z is deterministic given z (the stochastic
    path is fully captured by the latents), reference dscm.py:52-56 relies on
    this."""
    _, model, vs, x, pa = hvae_setup
    zs = model.apply(vs, x, pa, rngs={"sample": jax.random.PRNGKey(4)}, method="abduct")
    assert len(zs) == 20  # all decoder blocks stochastic at z_max_res=192
    loc1, scale1 = model.apply(
        vs, zs, pa, rngs={"sample": jax.random.PRNGKey(5)}, method="forward_latents"
    )
    loc2, scale2 = model.apply(
        vs, zs, pa, rngs={"sample": jax.random.PRNGKey(99)}, method="forward_latents"
    )
    np.testing.assert_array_equal(np.asarray(loc1), np.asarray(loc2))
    assert loc1.shape == x.shape
    assert np.all(np.asarray(scale1) > 0)


def test_hvae_partial_latents(hvae_setup):
    """Passing a prefix of latents samples the rest from the prior
    (reference vae.py:281-285 try/except semantics)."""
    _, model, vs, x, pa = hvae_setup
    zs = model.apply(vs, x, pa, rngs={"sample": jax.random.PRNGKey(4)}, method="abduct")
    loc, _ = model.apply(
        vs, zs[:3], pa, rngs={"sample": jax.random.PRNGKey(5)}, method="forward_latents"
    )
    assert loc.shape == x.shape


def test_hvae_sample_temperature(hvae_setup):
    _, model, vs, x, pa = hvae_setup
    xs, scale = model.apply(
        vs, pa, True, 0.1, rngs={"sample": jax.random.PRNGKey(6)}, method="sample"
    )
    assert xs.shape == x.shape
    assert np.all(np.asarray(xs) >= -1) and np.all(np.asarray(xs) <= 1)


def test_hvae_cond_prior_mixture_abduction():
    cfg = get_config("morphomnist", bs=2).replace(cond_prior=True)
    model = HVAE(cfg=cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (2, 32, 32, 1), minval=-1, maxval=1)
    pa = jax.random.uniform(jax.random.PRNGKey(1), (2, 12), minval=-1, maxval=1)
    vs = model.init({"params": k, "sample": k}, x, pa)
    # abduct without cf: returns dicts with q stats
    zs = model.apply(vs, x, pa, rngs={"sample": k}, method="abduct")
    assert isinstance(zs[0], dict) and set(zs[0]) == {"z", "q_loc", "q_logscale"}
    # abduct with cf parents: returns mixture z* arrays
    cf_pa = pa.at[:, 0].set(-pa[:, 0])
    cf_zs = model.apply(vs, x, pa, cf_pa, 0.65, rngs={"sample": k}, method="abduct")
    assert not isinstance(cf_zs[0], dict)
    assert cf_zs[0].shape == zs[0]["z"].shape


# ---------------------------------------------------------------------------
# SimpleVAE mechanism API
# ---------------------------------------------------------------------------


def test_simple_vae_api():
    cfg = get_config("morphomnist", bs=2)
    model = SimpleVAE(cfg=cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (2, 32, 32, 1), minval=-1, maxval=1)
    pa = jax.random.uniform(jax.random.PRNGKey(1), (2, 12), minval=-1, maxval=1)
    vs = model.init({"params": k, "sample": k}, x, pa)
    out = model.apply(vs, x, pa, 1.0, True, rngs={"sample": k})
    assert np.isfinite(float(out["elbo"]))
    zs = model.apply(vs, x, pa, rngs={"sample": k}, method="abduct")
    assert len(zs) == 1 and zs[0].shape == (2, cfg.z_dim)
    loc, scale = model.apply(vs, zs, pa, rngs={"sample": k}, method="forward_latents")
    assert loc.shape == x.shape
    xs, _ = model.apply(vs, pa, True, 0.5, rngs={"sample": k}, method="sample")
    assert xs.shape == x.shape
