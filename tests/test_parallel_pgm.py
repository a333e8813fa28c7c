"""Multi-device (CPU-mesh) coverage for the PGM and CF training steps —
the TPU-native substitute for a fake distributed backend (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from causal_gen_tpu.parallel.mesh import make_mesh, replicate, shard_batch

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'


class TestPGMDataParallel:
    def test_pgm_step_matches_single_device(self):
        from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
        from causal_gen_tpu.pgm.train_pgm import (
            PGMConfig,
            init_pgm_state,
            make_pgm_train_step,
        )

        cfg = PGMConfig(dataset="morphomnist", setup="sup_pgm", bs=16, lr=1e-3)
        model = MorphoMNISTPGM(setup_predictors=False)
        rng = np.random.default_rng(0)
        n = 16
        batch = {
            "thickness": jnp.asarray(rng.uniform(-0.8, 0.8, (n, 1)), jnp.float32),
            "intensity": jnp.asarray(rng.uniform(-0.8, 0.8, (n, 1)), jnp.float32),
            "digit": jnp.asarray(
                np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]
            ),
        }
        state = init_pgm_state(cfg, model, batch)
        step = make_pgm_train_step(cfg, model, donate=False)
        _, m_single = step(state, batch, jax.random.PRNGKey(1))

        mesh = make_mesh((8,), ("data",))
        with mesh:
            state_r = replicate(state, mesh)
            sharded = shard_batch(mesh, batch, batch_dim=0)
            _, m_dp = step(state_r, sharded, jax.random.PRNGKey(1))
        assert np.isclose(float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-5)

    def test_cf_step_runs_on_mesh(self):
        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            dense_intervention,
            init_cf_state,
            make_cf_train_step,
        )
        from tests.test_dscm import build_dscm, synth_batch

        dscm, vae_params, frozen, cfg = build_dscm(res=16)
        cf_cfg = CFConfig(bs=8, grad_skip=1e9, elbo_constraint=1.8)
        state = init_cf_state(cf_cfg, dscm, vae_params)
        step = make_cf_train_step(cf_cfg, dscm, frozen, donate=False)
        batch = synth_batch()
        do = {"thickness": jnp.full((8, 1), 0.2)}
        dag_vars = tuple(dscm.pgm.dag_variables.keys())
        dov, dom = dense_intervention(dag_vars, {k: batch[k] for k in dag_vars}, do)
        mesh = make_mesh((8,), ("data",))
        with mesh:
            state_r = replicate(state, mesh)
            frozen_r = replicate(frozen, mesh)
            step_r = make_cf_train_step(cf_cfg, dscm, frozen_r, donate=False)
            sharded = shard_batch(mesh, batch, batch_dim=0)
            dov_s = shard_batch(mesh, dov, batch_dim=0)
            dom_s = shard_batch(mesh, dom, batch_dim=0)
            new_state, m = step_r(state_r, sharded, dov_s, dom_s, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        assert int(new_state.step) == 1
