"""Gumbel-Softmax discrete mechanism as a first-class SCM node.

Port target: reference notebooks/discrete_mechanisms.ipynb — continuous
cause x -> discrete (relaxed one-hot) effect y via a Gumbel-base flow through
ConditionalAffine + SoftmaxCentered, with the notebook's counterfactual
soundness asserts (cell 4: do-nothing reproduces y exactly; intervening on
the cause changes some effects) and transform round-trip (cell 5).
"""

import jax
import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.pgm import base
from causal_gen_tpu.pgm.base import Node
from causal_gen_tpu.pgm.transforms import Affine, Compose, SoftmaxCentered


def make_nodes(w: jnp.ndarray, b: jnp.ndarray):
    """x (continuous root, dim 2) -> y (3-class simplex via K=2 gumbel flow).

    The affine context net is a fixed linear map for the test: loc = x @ w + b.
    """

    def y_transform(values):
        loc = values["x"] @ w + b  # (B, 2)
        return Compose([
            Affine(loc=loc, log_scale=jnp.zeros_like(loc)),
            SoftmaxCentered(),
        ])

    return [
        Node("x", base.FLOW, transform_fn=lambda v: Affine(
            loc=jnp.float32(0.0), log_scale=jnp.float32(0.0)), dim=2),
        Node("y", base.FLOW, ("x",), transform_fn=y_transform, dim=2,
             base="gumbel", out_dim=3),
    ]


class TestGumbelSoftmaxMechanism:
    def setup_method(self):
        key = jax.random.PRNGKey(0)
        self.w = 2.0 * jax.random.normal(key, (2, 2))
        self.b = jnp.zeros((2,))
        self.nodes = make_nodes(self.w, self.b)

    def test_ancestral_sample_on_simplex(self):
        vals = base.ancestral_sample(self.nodes, jax.random.PRNGKey(1), 32)
        assert vals["y"].shape == (32, 3)
        assert np.allclose(np.asarray(vals["y"]).sum(-1), 1.0, atol=1e-5)
        assert np.all(np.asarray(vals["y"]) >= 0)

    def test_null_counterfactual_reproduces_y(self):
        # cell 4 second assert: do(y := y) (here: do nothing) reproduces y
        vals = base.ancestral_sample(self.nodes, jax.random.PRNGKey(2), 64)
        cf = base.counterfactual(self.nodes, jax.random.PRNGKey(3), vals, {})
        assert np.allclose(np.asarray(cf["y"]), np.asarray(vals["y"]), atol=1e-4)
        assert np.allclose(np.asarray(cf["x"]), np.asarray(vals["x"]), atol=1e-5)

    def test_cause_intervention_changes_effects(self):
        # cell 4 first assert: randomly intervening on the cause changes the
        # argmax class for at least some samples
        vals = base.ancestral_sample(self.nodes, jax.random.PRNGKey(4), 64)
        new_x = 2 * jax.random.uniform(jax.random.PRNGKey(5), (64, 2)) - 1
        cf = base.counterfactual(self.nodes, jax.random.PRNGKey(6), vals,
                                 {"x": new_x})
        before = np.argmax(np.asarray(vals["y"]), -1)
        after = np.argmax(np.asarray(cf["y"]), -1)
        assert (before != after).sum() > 0
        assert (before == after).sum() > 0  # abduction preserves noise

    def test_joint_logprob_finite(self):
        vals = base.ancestral_sample(self.nodes, jax.random.PRNGKey(7), 16)
        lps = base.joint_logprob(self.nodes, vals)
        assert np.isfinite(np.asarray(lps["x"])).all()
        assert np.isfinite(np.asarray(lps["y"])).all()

    def test_transform_roundtrip(self):
        # cell 5: forward/inverse round-trip through the full chain
        vals = base.ancestral_sample(self.nodes, jax.random.PRNGKey(8), 8)
        t = self.nodes[1].transform_fn(vals)
        u, _ = t.inverse(vals["y"])
        y2, _ = t.forward(u)
        assert np.allclose(np.asarray(y2), np.asarray(vals["y"]), atol=1e-5)
