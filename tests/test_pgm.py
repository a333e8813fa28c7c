"""PGM stack tests: transforms, SCM core, and the four PGMs.

Covers the behavioral contracts from the reference (SURVEY.md §4):
- flow forward/inverse round-trip (discrete_mechanisms.ipynb cell 5 assert)
- logdet correctness vs autodiff
- Gumbel-Max posterior exactness (layers.py:144-168: abducted noise must
  re-produce the observed class under argmax)
- counterfactual axioms: null intervention reproduces the observation
  exactly; intervening on a cause changes its effects (notebook cell 4)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causal_gen_tpu.pgm import base
from causal_gen_tpu.pgm.transforms import (
    Affine,
    Compose,
    LinearRationalSpline,
    Sigmoid,
    normalize_neg11,
)


def rand_spline(key, K=4, batch_shape=(1,)):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = lambda k, shape: 0.5 * jax.random.normal(k, shape)
    return LinearRationalSpline(
        w_un=s(k1, (*batch_shape, K)),
        h_un=s(k2, (*batch_shape, K)),
        d_un=s(k3, (*batch_shape, K - 1)),
        l_un=s(k4, (*batch_shape, K)),
    )


class TestTransforms:
    def test_affine_roundtrip(self):
        t = Affine(loc=jnp.float32(2.0), log_scale=jnp.float32(0.5))
        x = jnp.linspace(-3, 3, 7)
        y, ld = t.forward(x)
        x2, ld_inv = t.inverse(y)
        assert np.allclose(x, x2, atol=1e-6)
        assert np.allclose(ld, -ld_inv)

    def test_sigmoid_roundtrip_and_logdet(self):
        t = Sigmoid()
        x = jnp.linspace(-4, 4, 9)
        y, ld = t.forward(x)
        x2, _ = t.inverse(y)
        assert np.allclose(x, x2, atol=1e-5)
        dydx = jax.vmap(jax.grad(lambda v: t.forward(v)[0]))(x)
        assert np.allclose(ld, jnp.log(dydx), atol=1e-5)

    def test_spline_roundtrip(self):
        t = rand_spline(jax.random.PRNGKey(0))
        x = jnp.linspace(-5.0, 5.0, 101)[:, None]  # includes outside bound
        y, ld = t.forward(x)
        x2, ld_inv = t.inverse(y)
        assert np.allclose(x, x2, atol=1e-5), np.abs(x - x2).max()
        assert np.allclose(ld, -ld_inv, atol=1e-5)

    def test_spline_monotonic_and_identity_outside(self):
        t = rand_spline(jax.random.PRNGKey(1))
        x = jnp.linspace(-6, 6, 201)[:, None]
        y, _ = t.forward(x)
        assert np.all(np.diff(y[:, 0]) > 0)
        out = np.abs(x[:, 0]) > 3.0
        assert np.allclose(y[out, 0], x[out, 0])

    def test_spline_logdet_matches_autodiff(self):
        t = rand_spline(jax.random.PRNGKey(2))
        x = jnp.linspace(-2.9, 2.9, 41)
        dydx = jax.vmap(jax.grad(lambda v: t.forward(v[None, None])[0][0, 0]))(x)
        _, ld = t.forward(x[:, None])
        assert np.allclose(ld[:, 0], jnp.log(dydx), atol=1e-4), (
            np.abs(ld[:, 0] - jnp.log(dydx)).max()
        )

    def test_spline_continuity_at_lambda_and_knots(self):
        t = rand_spline(jax.random.PRNGKey(3))
        x = jnp.linspace(-3.0 + 1e-4, 3.0 - 1e-4, 5001)[:, None]
        y, ld = t.forward(x)
        # derivative estimate between consecutive points stays close to
        # analytic logdet -> no jumps at internal knots/middles
        fd = np.diff(y[:, 0]) / np.diff(x[:, 0])
        an = np.exp(ld[:-1, 0])
        assert np.allclose(fd, an, rtol=5e-2)

    def test_compose_normalize_neg11(self):
        t = normalize_neg11()
        x = jnp.linspace(-4, 4, 21)
        y, ld = t.forward(x)
        assert np.all(np.abs(y) <= 1.0)
        x2, ld_inv = t.inverse(y)
        assert np.allclose(x, x2, atol=1e-4)
        assert np.allclose(ld, -ld_inv, atol=1e-5)


class TestGumbelMax:
    def test_posterior_reproduces_argmax(self):
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(key, (64, 5))
        k_obs = jax.random.randint(jax.random.PRNGKey(1), (64, 1), 0, 5).astype(
            jnp.float32
        )
        for seed in range(5):
            eps = base.gumbel_posterior(jax.random.PRNGKey(seed), logits, k_obs)
            k_re = jnp.argmax(eps + logits, axis=-1, keepdims=True)
            assert np.array_equal(np.asarray(k_re), np.asarray(k_obs, np.int32))

    def test_posterior_is_stochastic(self):
        logits = jnp.zeros((8, 3))
        k_obs = jnp.ones((8, 1))
        e1 = base.gumbel_posterior(jax.random.PRNGKey(0), logits, k_obs)
        e2 = base.gumbel_posterior(jax.random.PRNGKey(1), logits, k_obs)
        assert not np.allclose(e1, e2)


def _init_pgm(cls, key, obs, **kw):
    model = cls(setup_predictors=False, **kw)
    params = model.init({"params": key, "sample": key}, obs)["params"]
    return model, params


def _morpho_obs(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "thickness": jnp.asarray(rng.uniform(-0.9, 0.9, (n, 1)), jnp.float32),
        "intensity": jnp.asarray(rng.uniform(-0.9, 0.9, (n, 1)), jnp.float32),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]),
    }


class TestMorphoMNISTPGM:
    def setup_method(self):
        from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM

        self.obs = _morpho_obs()
        self.model, self.params = _init_pgm(
            MorphoMNISTPGM, jax.random.PRNGKey(0), self.obs
        )

    def apply(self, method, *a, **kw):
        return self.model.apply(
            {"params": self.params},
            *a,
            method=method,
            rngs={"sample": kw.pop("rng", jax.random.PRNGKey(9))},
            **kw,
        )

    def test_sample_shapes(self):
        s = self.apply(self.model.sample, 8)
        assert s["thickness"].shape == (8, 1)
        assert s["digit"].shape == (8, 10)
        assert np.all(np.abs(np.asarray(s["thickness"])) <= 1.0)
        assert np.all(np.abs(np.asarray(s["intensity"])) <= 1.0)

    def test_null_counterfactual_is_identity(self):
        # abduct-act-predict with empty intervention must reproduce obs
        # exactly for flow nodes and roots (notebook cell 4 reversibility)
        cf = self.apply(self.model.counterfactual, self.obs, {})
        for k in self.obs:
            assert np.allclose(cf[k], self.obs[k], atol=1e-4), k

    def test_intervention_effectiveness(self):
        do = {"thickness": jnp.full((16, 1), 0.5)}
        cf = self.apply(self.model.counterfactual, self.obs, do)
        assert np.allclose(cf["thickness"], 0.5)
        # intensity is a child of thickness: must change for most samples
        assert np.abs(np.asarray(cf["intensity"] - self.obs["intensity"])).max() > 1e-4
        # digit is not a descendant: unchanged
        assert np.allclose(cf["digit"], self.obs["digit"])

    def test_svi_logprob_finite_and_differentiable(self):
        def loss(params):
            lps = self.model.apply(
                {"params": params},
                self.obs,
                method=self.model.svi_logprob,
                rngs={"sample": jax.random.PRNGKey(0)},
            )
            return -sum(jnp.sum(v) for v in lps.values())

        val, grads = jax.value_and_grad(loss)(self.params)
        assert np.isfinite(float(val))
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_counterfactual_deterministic_given_key(self):
        do = {"thickness": jnp.full((16, 1), 0.3)}
        cf1 = self.apply(self.model.counterfactual, self.obs, do, rng=jax.random.PRNGKey(5))
        cf2 = self.apply(self.model.counterfactual, self.obs, do, rng=jax.random.PRNGKey(5))
        for k in cf1:
            assert np.array_equal(np.asarray(cf1[k]), np.asarray(cf2[k]))


class TestChestPGM:
    def setup_method(self):
        from causal_gen_tpu.pgm.flow_pgm import ChestPGM

        rng = np.random.default_rng(0)
        n = 16
        self.obs = {
            "race": jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)]),
            "sex": jnp.asarray(rng.integers(0, 2, (n, 1)), jnp.float32),
            "finding": jnp.asarray(rng.integers(0, 2, (n, 1)), jnp.float32),
            "age": jnp.asarray(rng.uniform(-0.9, 0.9, (n, 1)), jnp.float32),
        }
        self.model, self.params = _init_pgm(ChestPGM, jax.random.PRNGKey(0), self.obs)

    def apply(self, method, *a, **kw):
        return self.model.apply(
            {"params": self.params},
            *a,
            method=method,
            rngs={"sample": kw.pop("rng", jax.random.PRNGKey(9))},
            **kw,
        )

    def test_null_counterfactual_identity(self):
        cf = self.apply(self.model.counterfactual, self.obs, {})
        for k in self.obs:
            # finding: restored via the MIMIC hack; age: exact flow inversion
            assert np.allclose(cf[k], self.obs[k], atol=1e-4), k

    def test_gumbel_abduction_consistency(self):
        # without the restore hack, abducted gumbels must still reproduce the
        # observed finding when age is untouched
        noise = self.apply(self.model.infer_exogeneous, self.obs)
        assert "finding_base" in noise and "age_base" in noise
        cf = self.apply(
            self.model.sample_scm,
            16,
            noise={**noise, "sex": self.obs["sex"], "race": self.obs["race"]},
            do={},
        )
        assert np.array_equal(
            np.asarray(cf["finding"]), np.asarray(self.obs["finding"])
        )

    def test_age_intervention_can_flip_finding(self):
        do = {"age": jnp.full((16, 1), 3.0)}
        cf = self.apply(self.model.counterfactual, self.obs, do)
        assert cf["finding"].shape == (16, 1)
        assert np.allclose(cf["age"], 3.0)


class TestColourMNISTPGM:
    def test_sample_and_counterfactual(self):
        from causal_gen_tpu.pgm.flow_pgm import ColourMNISTPGM

        rng = np.random.default_rng(0)
        n = 8
        obs = {
            "digit": jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]),
            "colour": jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]),
        }
        model, params = _init_pgm(ColourMNISTPGM, jax.random.PRNGKey(0), obs)
        cf = model.apply(
            {"params": params},
            obs,
            {"digit": jnp.asarray(np.eye(10, dtype=np.float32)[np.full(n, 3)])},
            method=model.counterfactual,
            rngs={"sample": jax.random.PRNGKey(1)},
        )
        assert np.allclose(np.argmax(cf["digit"], -1), 3)
        assert np.allclose(cf["colour"], obs["colour"])  # root passthrough


class TestUKBBPGM:
    def test_counterfactual_chain(self):
        from causal_gen_tpu.pgm.flow_pgm import FlowPGM

        rng = np.random.default_rng(0)
        n = 8
        obs = {
            "sex": jnp.asarray(rng.integers(0, 2, (n, 1)), jnp.float32),
            "mri_seq": jnp.asarray(rng.integers(0, 2, (n, 1)), jnp.float32),
            "age": jnp.asarray(rng.normal(0, 1, (n, 1)), jnp.float32),
            "brain_volume": jnp.asarray(rng.normal(0, 1, (n, 1)), jnp.float32),
            "ventricle_volume": jnp.asarray(rng.normal(0, 1, (n, 1)), jnp.float32),
        }
        model, params = _init_pgm(FlowPGM, jax.random.PRNGKey(0), obs)
        ap = lambda m, *a, **kw: model.apply(
            {"params": params}, *a, method=m,
            rngs={"sample": jax.random.PRNGKey(2)}, **kw,
        )
        cf0 = ap(model.counterfactual, obs, {})
        for k in obs:
            assert np.allclose(cf0[k], obs[k], atol=1e-4), k
        # intervening on sex flows through brain_volume -> ventricle_volume
        do = {"sex": 1.0 - obs["sex"]}
        cf = ap(model.counterfactual, obs, do)
        assert np.abs(np.asarray(cf["brain_volume"] - obs["brain_volume"])).max() > 1e-6
        assert np.abs(
            np.asarray(cf["ventricle_volume"] - obs["ventricle_volume"])
        ).max() > 1e-6
        # age unchanged (non-descendant of sex)
        assert np.allclose(cf["age"], obs["age"], atol=1e-4)


class TestUKBBPreprocessContract:
    """Regression for the CF eval-sweep normalization bug: do-values drawn
    from train-set attrs MUST pass through preprocess_pgm_batch so UKBB raw
    units land in the PGM's [-1,1] parent space (pgm/train_cf.py
    cf_eval_epoch); raw years fed to a [-1,1]-trained flow exploded every
    downstream recomputation in the flagship 192^2 run."""

    def test_ukbb_attrs_normalize_without_x(self):
        from causal_gen_tpu.pgm.train_pgm import (
            PGMConfig,
            preprocess_pgm_batch,
        )
        from causal_gen_tpu.utils.normalization import get_attr_max_min

        cfg = PGMConfig(dataset="ukbb")
        raw_age = np.array([44.0, 58.5, 73.0], np.float32)
        out = preprocess_pgm_batch(cfg, {"age": raw_age})
        a_max, a_min = get_attr_max_min("age")
        expect = 2 * (raw_age - a_min) / (a_max - a_min) - 1
        np.testing.assert_allclose(
            np.asarray(out["age"])[:, 0], expect, rtol=1e-6)
        assert float(np.abs(np.asarray(out["age"])).max()) <= 1.5
        # binary attrs pass through untouched
        sex = np.array([0.0, 1.0, 1.0], np.float32)
        assert np.array_equal(
            np.asarray(preprocess_pgm_batch(cfg, {"sex": sex})["sex"])[:, 0],
            sex)
