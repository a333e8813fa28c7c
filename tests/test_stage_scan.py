"""Stage-scan decoder tests (models/hvae.py::DecoderRunCell).

The scanned layout must (a) group only shape-uniform non-boundary blocks,
(b) produce byte-identical deterministic outputs to the unrolled decoder
after checkpoint migration, and (c) train (finite elbo, grads flow into the
stacked run params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.config import get_config
from causal_gen_tpu.models.hvae import (
    HVAE,
    migrate_decoder_params,
    plan_decoder_blocks,
    plan_decoder_layout,
)


def small_cfg(**kw):
    return get_config(
        "morphomnist",
        bs=4,
        input_res=16,
        enc_arch="16b1d2,8b2d2,4b1d4,1b1",
        dec_arch="1b2,4b3,8b3,16b1",
        widths=(8, 8, 16, 16),
        z_dim=4,
        context_dim=12,
        bias_max_res=16,
        **kw,
    )


def init_params(cfg, model, seed=0):
    x = jnp.zeros((cfg.bs, cfg.input_res, cfg.input_res, 1), jnp.float32)
    pa = jnp.zeros((cfg.bs, cfg.context_dim), jnp.float32)
    k = jax.random.PRNGKey(seed)
    return model.init({"params": k, "sample": k}, x, pa)["params"]


class TestLayoutPlan:
    def test_runs_exclude_boundaries(self):
        cfg = small_cfg(stage_scan=True)
        stages = plan_decoder_blocks(cfg)
        layout = plan_decoder_layout(cfg)
        covered = []
        for elem in layout:
            if elem[0] == "single":
                covered.append(elem[1])
            else:
                start, length = elem[1], elem[2]
                assert length >= 2
                for j in range(start, start + length):
                    # uniform: same res as predecessor, in == out width
                    assert stages[j - 1][0] == stages[j][0]
                    nxt = stages[min(len(stages) - 1, j + 1)][1]
                    assert nxt == stages[j][1]
                covered.extend(range(start, start + length))
        assert sorted(covered) == list(range(len(stages)))

    def test_big_config_compresses(self):
        # ukbb192's 24b12 stage must collapse into a long run
        cfg = get_config("ukbb192", stage_scan=True)
        layout = plan_decoder_layout(cfg)
        longest = max(e[2] for e in layout if e[0] == "run")
        assert longest >= 8, layout
        n_elems = len(layout)
        assert n_elems < len(plan_decoder_blocks(cfg)) * 2 // 3, layout


class TestScanParity:
    def test_deterministic_paths_match_after_migration(self):
        cfg_u = small_cfg()
        cfg_s = small_cfg(stage_scan=True)
        m_u, m_s = HVAE(cfg=cfg_u), HVAE(cfg=cfg_s)
        params_u = init_params(cfg_u, m_u)
        params_s = migrate_decoder_params(cfg_u, params_u)

        rng = jax.random.PRNGKey(3)
        x = jax.random.uniform(rng, (cfg_u.bs, 16, 16, 1), minval=-1, maxval=1)
        pa = jax.random.normal(rng, (cfg_u.bs, cfg_u.context_dim))

        # abduct on the unrolled model -> full latent set
        zs = m_u.apply({"params": params_u}, x, pa, method=m_u.abduct,
                       rngs={"sample": rng})
        zs = [z["z"] if isinstance(z, dict) else z for z in zs]
        loc_u, scale_u = m_u.apply({"params": params_u}, zs, pa,
                                   method=m_u.forward_latents,
                                   rngs={"sample": rng})
        loc_s, scale_s = m_s.apply({"params": params_s}, zs, pa,
                                   method=m_s.forward_latents,
                                   rngs={"sample": rng})
        np.testing.assert_allclose(np.asarray(loc_u), np.asarray(loc_s),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scale_u), np.asarray(scale_s),
                                   rtol=0, atol=1e-5)

    def test_partial_latents_match(self):
        # the viz partial-abduction sweep gives latents for a prefix only
        cfg_u = small_cfg()
        cfg_s = small_cfg(stage_scan=True)
        m_u, m_s = HVAE(cfg=cfg_u), HVAE(cfg=cfg_s)
        params_u = init_params(cfg_u, m_u)
        params_s = migrate_decoder_params(cfg_u, params_u)

        rng = jax.random.PRNGKey(5)
        x = jax.random.uniform(rng, (cfg_u.bs, 16, 16, 1), minval=-1, maxval=1)
        pa = jax.random.normal(rng, (cfg_u.bs, cfg_u.context_dim))
        zs = m_u.apply({"params": params_u}, x, pa, method=m_u.abduct,
                       rngs={"sample": rng})
        zs = [z["z"] if isinstance(z, dict) else z for z in zs]
        # keep first 3 latents; the rest sample from the prior at t->0
        part = zs[:3]
        loc_u, _ = m_u.apply({"params": params_u}, part, pa, t=1e-5,
                             method=m_u.forward_latents, rngs={"sample": rng})
        loc_s, _ = m_s.apply({"params": params_s}, part, pa, t=1e-5,
                             method=m_s.forward_latents, rngs={"sample": rng})
        np.testing.assert_allclose(np.asarray(loc_u), np.asarray(loc_s),
                                   rtol=0, atol=1e-3)


class TestScanTraining:
    def test_elbo_and_grads(self):
        cfg = small_cfg(stage_scan=True)
        model = HVAE(cfg=cfg)
        params = init_params(cfg, model)
        # stacked run params present with leading run-length axis
        runs = [k for k in params["decoder"] if k.startswith("run_")]
        assert runs, list(params["decoder"])
        leaf = jax.tree.leaves(params["decoder"][runs[0]])[0]
        assert leaf.shape[0] >= 2

        x = jax.random.uniform(jax.random.PRNGKey(0), (cfg.bs, 16, 16, 1),
                               minval=-1, maxval=1)
        pa = jnp.zeros((cfg.bs, cfg.context_dim))

        def loss(p, k):
            out = model.apply({"params": p}, x, pa, train=True,
                              rngs={"sample": k})
            return out["elbo"]

        val, grads = jax.value_and_grad(loss)(params, jax.random.PRNGKey(1))
        assert np.isfinite(float(val))
        gnorm = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree.leaves(grads["decoder"][runs[0]])
        )
        assert gnorm > 0.0

    def test_remat_compiles(self):
        cfg = small_cfg(stage_scan=True, remat=True)
        model = HVAE(cfg=cfg)
        params = init_params(cfg, model)
        x = jnp.zeros((cfg.bs, 16, 16, 1))
        pa = jnp.zeros((cfg.bs, cfg.context_dim))

        @jax.jit
        def step(p, k):
            return jax.grad(
                lambda q: model.apply({"params": q}, x, pa, train=True,
                                      rngs={"sample": k})["elbo"]
            )(p)

        g = step(params, jax.random.PRNGKey(0))
        assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


class TestSelectiveRemat:
    """remat_min_res gates which stages rematerialize; it must not change
    the math or the param tree (checkpoints stay interchangeable)."""

    def _value_and_gnorm(self, cfg):
        model = HVAE(cfg=cfg)
        params = init_params(cfg, model)
        x = jax.random.uniform(jax.random.PRNGKey(0), (cfg.bs, 16, 16, 1),
                               minval=-1, maxval=1)
        pa = jax.random.normal(jax.random.PRNGKey(2), (cfg.bs, cfg.context_dim))

        @jax.jit
        def vg(p, k):
            return jax.value_and_grad(
                lambda q: model.apply({"params": q}, x, pa, train=True,
                                      rngs={"sample": k})["elbo"]
            )(p)

        val, grads = vg(params, jax.random.PRNGKey(1))
        gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        return params, float(val), gnorm

    def test_partial_remat_matches_full_remat(self):
        for extra in ({}, {"stage_scan": True}):
            p_full, v_full, g_full = self._value_and_gnorm(
                small_cfg(remat=True, **extra))
            p_sel, v_sel, g_sel = self._value_and_gnorm(
                small_cfg(remat=True, remat_min_res=8, **extra))
            p_off, v_off, g_off = self._value_and_gnorm(small_cfg(**extra))
            # identical param structure (checkpoint compatibility)
            assert (jax.tree_util.tree_structure(p_full)
                    == jax.tree_util.tree_structure(p_sel)
                    == jax.tree_util.tree_structure(p_off))
            np.testing.assert_allclose(v_sel, v_full, rtol=1e-5)
            np.testing.assert_allclose(v_sel, v_off, rtol=1e-5)
            np.testing.assert_allclose(g_sel, g_full, rtol=1e-4)
            np.testing.assert_allclose(g_sel, g_off, rtol=1e-4)


class TestBf16Stream:
    """bf16 compute-dtype configs: the residual stream must stay type-stable
    through scan carries (incl. the dead z carry in q_correction mode) and
    produce finite losses/grads."""

    def _step(self, **kw):
        cfg = small_cfg(dtype="bfloat16", **kw)
        model = HVAE(cfg=cfg)
        params = init_params(cfg, model)
        x = jax.random.uniform(jax.random.PRNGKey(0), (cfg.bs, 16, 16, 1),
                               minval=-1, maxval=1)
        pa = jax.random.normal(jax.random.PRNGKey(1), (cfg.bs, cfg.context_dim))

        @jax.jit
        def vg(p, k):
            return jax.value_and_grad(
                lambda q: model.apply({"params": q}, x, pa, train=True,
                                      rngs={"sample": k})["elbo"]
            )(p)

        val, grads = vg(params, jax.random.PRNGKey(2))
        assert np.isfinite(float(val)), val
        for g in jax.tree.leaves(grads):
            assert g.dtype == jnp.float32  # f32 master grads
        assert np.isfinite(float(jax.tree.leaves(grads)[0].sum()))
        return float(val)

    def test_unrolled(self):
        self._step()

    def test_stage_scan_remat(self):
        self._step(stage_scan=True, remat=True)

    def test_q_correction_scan_carry(self):
        # dead z carry in q_correction mode must keep a uniform scan dtype
        self._step(stage_scan=True, q_correction=True)

    def test_cond_prior_scan(self):
        self._step(stage_scan=True, cond_prior=True, cond_drop_from=10)
