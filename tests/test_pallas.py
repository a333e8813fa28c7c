"""Pallas kernel numerics tests.

These run the kernels through the TPU interpreter on the CPU mesh
(pltpu.force_tpu_interpret_mode). Caveat: interpreter-mode
pltpu.prng_random_bits returns ZERO bits, so the Box-Muller noise degenerates
to a constant — the in-kernel RNG's distributional statistics are asserted on
real TPU by tools/tpu_checks.py instead; here we verify the deterministic
math (KL, DMoL NLL, gradients) exactly against the pure-jnp ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from causal_gen_tpu.ops.distributions import gaussian_kl
from causal_gen_tpu.ops.dmol import discretized_mix_logistic_loss

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'


class TestFusedSampleKL:
    def test_kl_matches_reference(self):
        from causal_gen_tpu.ops.pallas_kernels import fused_sample_kl

        rng = np.random.default_rng(0)
        shape = (64, 8, 8, 16)
        q_loc = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        q_logscale = jnp.asarray(rng.normal(0, 0.3, shape), jnp.float32)
        p_loc = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        p_logscale = jnp.asarray(rng.normal(0, 0.3, shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            z, kl = fused_sample_kl(jnp.int32(7), q_loc, q_logscale, p_loc, p_logscale)
        ref_kl = gaussian_kl(q_loc, q_logscale, p_loc, p_logscale)
        assert np.allclose(kl, ref_kl, atol=1e-5)
        # interpreter PRNG gives constant eps: z = loc + exp(logscale)*const
        eps = (np.asarray(z) - np.asarray(q_loc)) / np.exp(np.asarray(q_logscale))
        assert eps.std() < 1e-4  # constant across elements => formula path ok
        assert np.isfinite(eps).all()

    def test_shapes_and_padding(self):
        from causal_gen_tpu.ops.pallas_kernels import fused_sample_kl

        # row count not a multiple of the tile
        a = jnp.ones((7, 33))
        with pltpu.force_tpu_interpret_mode():
            z, kl = fused_sample_kl(jnp.int32(0), a, a, a, a)
        assert z.shape == (7, 33) and kl.shape == (7, 33)
        assert np.allclose(kl, gaussian_kl(a, a, a, a), atol=1e-5)


class TestDmolPallas:
    def test_matches_reference_op(self):
        from causal_gen_tpu.ops.pallas_kernels import dmol_loss_pallas

        rng = np.random.default_rng(0)
        x = jnp.asarray(
            np.round(rng.uniform(-1, 1, (4, 8, 8, 3)) * 127.5) / 127.5, jnp.float32
        )
        l = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 100)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = dmol_loss_pallas(x, l, False, False)
        want = discretized_mix_logistic_loss(x, l)
        assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()

    def test_low_bit_and_edges(self):
        from causal_gen_tpu.ops.pallas_kernels import dmol_loss_pallas

        rng = np.random.default_rng(1)
        x = np.full((2, 4, 4, 3), -1.0, np.float32)
        x[0, 0, 0] = 1.0  # exercise both edge branches
        x = jnp.asarray(x)
        l = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 100)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = dmol_loss_pallas(x, l, True, False)
        want = discretized_mix_logistic_loss(x, l, low_bit=True)
        assert np.allclose(got, want, atol=1e-4)

    def test_gradients_flow(self):
        from causal_gen_tpu.ops.pallas_kernels import dmol_loss_pallas

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 4, 4, 3)), jnp.float32)
        l = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 100)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            g_pallas = jax.grad(
                lambda ll: jnp.sum(dmol_loss_pallas(x, ll, False, False))
            )(l)
        g_ref = jax.grad(
            lambda ll: jnp.sum(discretized_mix_logistic_loss(x, ll))
        )(l)
        assert np.allclose(g_pallas, g_ref, atol=1e-5)


class TestFusedSampleKLGrad:
    def test_vjp_matches_reparam_autodiff(self):
        """Custom VJP = reparameterization grads (eps held fixed) + closed-
        form Gaussian-KL derivatives; compare against autodiff of the pure
        formulas with eps recovered from the kernel's own sample."""
        from causal_gen_tpu.ops.pallas_kernels import fused_sample_kl

        rng = np.random.default_rng(3)
        shape = (8, 33)
        args = [jnp.asarray(rng.normal(0, 0.5, shape), jnp.float32) for _ in range(4)]
        q_loc, q_logscale, p_loc, p_logscale = args

        def f(q_loc, q_logscale, p_loc, p_logscale):
            z, kl = fused_sample_kl(jnp.int32(5), q_loc, q_logscale, p_loc, p_logscale)
            return jnp.sum(z * 1.7) + jnp.sum(kl * 0.3)

        with pltpu.force_tpu_interpret_mode():
            z, _ = fused_sample_kl(jnp.int32(5), *args)
            grads = jax.grad(f, argnums=(0, 1, 2, 3))(*args)
        eps = (z - q_loc) / jnp.exp(q_logscale)  # fixed noise, same seed

        def ref(q_loc, q_logscale, p_loc, p_logscale):
            zz = q_loc + jnp.exp(q_logscale) * eps
            kl = gaussian_kl(q_loc, q_logscale, p_loc, p_logscale)
            return jnp.sum(zz * 1.7) + jnp.sum(kl * 0.3)

        ref_grads = jax.grad(ref, argnums=(0, 1, 2, 3))(*args)
        for g, rg in zip(grads, ref_grads):
            assert np.allclose(g, rg, atol=1e-5), np.abs(g - rg).max()


class TestDmolSamplePallas:
    def test_hard_decode_limit(self):
        """Interpreter-mode PRNG yields zero bits -> uniforms collapse to
        1e-5: the Gumbel shift is constant (mixture select = argmax) and at
        t->0 the logistic sample collapses onto the selected mean, so the
        kernel must reproduce the jnp hard-mask decode."""
        from causal_gen_tpu.ops.dmol import mean_discretized_mix_logistic
        from causal_gen_tpu.ops.pallas_kernels import dmol_sample_pallas

        rng = np.random.default_rng(4)
        l = jnp.asarray(rng.normal(0, 1.5, (2, 5, 5, 100)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            x, scale = dmol_sample_pallas(jnp.int32(9), l, 10, t=1e-6)
        want_x, _ = mean_discretized_mix_logistic(l, 10, mask="hard")
        assert x.shape == (2, 5, 5, 3) and scale.shape == (2, 5, 5, 3)
        assert np.allclose(x, np.clip(want_x, -1, 1), atol=1e-3), (
            np.abs(x - want_x).max()
        )
        # selected scale = exp(clip(log_scale, -7) + log t) <= exp(-7)*t*...
        assert np.isfinite(scale).all() and (np.asarray(scale) > 0).all()

    def test_model_use_pallas_end_to_end(self):
        """HVAE with cfg.use_pallas: fused sample+KL in the decoder and the
        Pallas DMoL head run under jit (interpret on CPU) with finite loss
        and flowing gradients."""
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.vae_trainer import (
            init_model_params, make_train_step,
        )
        from causal_gen_tpu.train.state import init_train_state
        from tests.test_train import make_batch, tiny_cfg

        cfg = tiny_cfg(bs=4, use_pallas=True, x_like="shared_dmol",
                       input_channels=3)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, donate=False)
        batch = make_batch(cfg)
        batch["x"] = np.repeat(batch["x"], 3, axis=-1)  # RGB for DMoL
        new_state, m = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["elbo"]))
        assert int(new_state.step) == 1
        # sampling path (DMoL Pallas sampler) under jit
        pa = jnp.asarray(batch["pa"][0])
        xs, _ = jax.jit(
            lambda p, pa: model.apply(
                {"params": p}, pa, False, t=0.7, method="sample",
                rngs={"sample": jax.random.PRNGKey(2)},
            )
        )(new_state.params, pa)
        assert np.isfinite(np.asarray(xs)).all()
