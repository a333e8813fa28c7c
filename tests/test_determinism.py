"""End-to-end determinism: identical seeds + weights => identical
counterfactual images through the merged DSCM (BASELINE.json requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from tests.test_dscm import build_dscm, synth_batch


class TestDSCMDeterminism:
    def test_identical_cf_images_given_identical_seed(self):
        dscm, vae_params, frozen, cfg = build_dscm(res=16)
        trainable = dscm.init_trainable(vae_params)
        batch = synth_batch()
        do = {"intensity": jnp.full((8, 1), 0.3)}
        out1 = dscm.forward(trainable, frozen, batch, do, jax.random.PRNGKey(11))
        out2 = dscm.forward(trainable, frozen, batch, do, jax.random.PRNGKey(11))
        assert np.array_equal(
            np.asarray(out1["cfs"]["x"]), np.asarray(out2["cfs"]["x"])
        )
        out3 = dscm.forward(trainable, frozen, batch, do, jax.random.PRNGKey(12))
        # attribute abduction is exact (deterministic) for this DAG, but the
        # latent abduction samples z ~ q, so a different key changes cf_x
        assert not np.array_equal(
            np.asarray(out1["cfs"]["x"]), np.asarray(out3["cfs"]["x"])
        )

    def test_dense_and_sparse_do_agree(self):
        from causal_gen_tpu.pgm.train_cf import dense_intervention

        dscm, vae_params, frozen, cfg = build_dscm(res=16)
        trainable = dscm.init_trainable(vae_params)
        batch = synth_batch()
        do = {"thickness": jnp.full((8, 1), -0.4)}
        out_sparse = dscm.forward(trainable, frozen, batch, do, jax.random.PRNGKey(5))
        dag_vars = tuple(dscm.pgm.dag_variables.keys())
        attrs = {k: batch[k] for k in dag_vars}
        dov, dom = dense_intervention(dag_vars, attrs, do)
        out_dense = dscm.forward(
            trainable, frozen, batch, dov, jax.random.PRNGKey(5), do_mask=dom
        )
        for k in out_sparse["cfs"]:
            assert np.allclose(
                np.asarray(out_sparse["cfs"][k]),
                np.asarray(out_dense["cfs"][k]),
                atol=1e-5,
            ), k
