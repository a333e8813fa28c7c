"""3-D volumetric HVAE: the spatial_dims=3 generalization.

No reference counterpart (the reference is strictly 2-D images); this is the
TPU-native extension the spatial-sharding helpers were built for
(parallel/mesh.py::spatial_sharding). Covers: forward/sample/abduct/
forward_latents shapes, the jitted train step, stage_scan parity in 3-D,
the synthetic sphere dataset's SCM, and eval under (data, space) sharding
on the 8-device virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.config import get_config
from causal_gen_tpu.models.hvae import HVAE
from causal_gen_tpu.train.state import init_train_state
from causal_gen_tpu.train.vae_trainer import (
    init_model_params,
    make_train_step,
    preprocess_x,
)


def tiny3d_cfg(**kw):
    base = dict(
        input_res=8, bs=4, dtype="float32",
        enc_arch="8b1d2,4b1d4,1b1", dec_arch="1b1,4b2,8b1",
        widths=(8, 16, 32), z_dim=4, bias_max_res=4,
    )
    base.update(kw)
    return get_config("vol3d32", **base)


@pytest.fixture(scope="module")
def tiny3d():
    cfg = tiny3d_cfg()
    model = HVAE(cfg=cfg)
    params = init_model_params(cfg, model, jax.random.PRNGKey(0))
    return cfg, model, params


class TestHVAE3D:
    def test_forward_shapes_finite(self, tiny3d):
        cfg, model, params = tiny3d
        x = jnp.zeros((4, 8, 8, 8, 1), jnp.float32)
        pa = jnp.zeros((4, cfg.context_dim), jnp.float32)
        out = model.apply({"params": params}, x, pa, train=False,
                          rngs={"sample": jax.random.PRNGKey(1)})
        for k in ("elbo", "nll", "kl"):
            assert np.isfinite(float(out[k])), k

    def test_sample_abduct_forward_latents(self, tiny3d):
        cfg, model, params = tiny3d
        rng = jax.random.PRNGKey(2)
        pa = jnp.zeros((4, cfg.context_dim), jnp.float32)
        xs, _ = model.apply({"params": params}, pa, method=model.sample,
                            rngs={"sample": rng})
        assert xs.shape == (4, 8, 8, 8, 1)
        x = jnp.tanh(jax.random.normal(rng, (4, 8, 8, 8, 1)))
        zs = model.apply({"params": params}, x, pa, method=model.abduct,
                         rngs={"sample": rng})
        # latents are cubic per stochastic block resolution
        assert [z.shape[1:-1] for z in zs] == [(1, 1, 1), (4, 4, 4), (4, 4, 4),
                                               (8, 8, 8)]
        xf, _ = model.apply({"params": params}, zs, pa,
                            method=model.forward_latents, rngs={"sample": rng})
        assert xf.shape == x.shape

    def test_abduct_forward_is_reconstruction(self, tiny3d):
        """Null intervention: decoding abducted latents under the factual
        parents reproduces the posterior-mean reconstruction deterministically
        (the CF engine's identity axiom, as in test_cf for 2-D)."""
        cfg, model, params = tiny3d
        rng = jax.random.PRNGKey(3)
        x = jnp.tanh(jax.random.normal(rng, (4, 8, 8, 8, 1)))
        pa = jnp.zeros((4, cfg.context_dim), jnp.float32)
        zs = model.apply({"params": params}, x, pa, method=model.abduct,
                         rngs={"sample": rng})
        x1, _ = model.apply({"params": params}, zs, pa,
                            method=model.forward_latents, rngs={"sample": rng})
        x2, _ = model.apply({"params": params}, zs, pa,
                            method=model.forward_latents, rngs={"sample": rng})
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=0)

    def test_train_step_updates(self, tiny3d):
        cfg, model, params = tiny3d
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, donate=False)
        x = np.random.default_rng(0).integers(
            0, 256, (1, 4, 8, 8, 8, 1), np.uint8
        )
        batch = {"x": jnp.asarray(x),
                 "pa": jnp.zeros((1, 4, cfg.context_dim), jnp.float32)}
        state, m = step(state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(m["elbo"]))
        assert int(state.step) == 1

    def test_stage_scan_matches_unrolled(self):
        """The scanned 3-D decoder is numerically identical to the unrolled
        one after checkpoint migration (same invariant as 2-D)."""
        from causal_gen_tpu.models.hvae import migrate_decoder_params

        cfg = tiny3d_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        cfg_s = cfg.replace(stage_scan=True)
        model_s = HVAE(cfg=cfg_s)
        params_s = migrate_decoder_params(cfg_s, params)
        x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 8, 1)))
        pa = jnp.zeros((2, cfg.context_dim), jnp.float32)
        rngs = {"sample": jax.random.PRNGKey(6)}
        out = model.apply({"params": params}, x, pa, train=False, rngs=rngs)
        out_s = model_s.apply({"params": params_s}, x, pa, train=False, rngs=rngs)
        np.testing.assert_allclose(
            float(out["nll"]), float(out_s["nll"]), rtol=1e-5
        )


class TestVol3DDataset:
    def test_generator_deterministic_scm(self):
        from causal_gen_tpu.data.datasets import make_vol3d

        v1, a1 = make_vol3d(8, 16, seed=3)
        v2, a2 = make_vol3d(8, 16, seed=3)
        np.testing.assert_array_equal(v1, v2)
        assert v1.shape == (8, 16, 16, 16, 1) and v1.dtype == np.uint8
        # the SCM: larger radius -> dimmer (negative mechanism slope)
        v, a = make_vol3d(256, 8, seed=0)
        r = np.corrcoef(a["radius"], a["intensity"])[0, 1]
        assert r < -0.8, r

    def test_setup_datasets_dispatch(self):
        from causal_gen_tpu.data.datasets import setup_datasets

        cfg = get_config("vol3d32", input_res=8)
        ds = setup_datasets(cfg)
        b = ds["train"].batch(np.arange(4))
        assert b["x"].shape == (4, 8, 8, 8, 1)
        assert b["pa"].shape == (4, 2)
        assert b["pa"].min() >= -1.001 and b["pa"].max() <= 1.001


class TestSharded3D:
    def test_eval_matches_under_data_space_sharding(self, tiny3d):
        """(data, space)-sharded forward == unsharded forward: GSPMD inserts
        the 3-D conv halo exchanges (the volumetric use-case
        spatial_sharding was built for)."""
        from causal_gen_tpu.parallel.mesh import (
            make_mesh,
            replicate,
            shard_batch_spatial,
        )

        if jax.device_count() < 4:
            pytest.skip("needs >=4 devices")
        cfg, model, params = tiny3d
        rng = jax.random.PRNGKey(7)
        x = jnp.tanh(jax.random.normal(rng, (4, 8, 8, 8, 1)))
        pa = jnp.zeros((4, cfg.context_dim), jnp.float32)

        def fwd(p, x, pa):
            return model.apply({"params": p}, x, pa, train=False,
                               rngs={"sample": jax.random.PRNGKey(8)})["nll"]

        ref = float(jax.jit(fwd)(params, x, pa))
        mesh = make_mesh((2, 2), ("data", "space"),
                         devices=jax.devices()[:4])
        with mesh:
            p_r = replicate(params, mesh)
            batch = shard_batch_spatial(mesh, {"x": x, "pa": pa})
            got = float(jax.jit(fwd)(p_r, batch["x"], batch["pa"]))
        np.testing.assert_allclose(got, ref, rtol=1e-4)
