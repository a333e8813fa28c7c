"""Single-stochastic-layer conditional VAE (Flax linen, NHWC).

Port target: reference src/simple_vae.py:34-415. Implements the identical
four-method mechanism API as the HVAE {__call__, sample, abduct,
forward_latents} so it is a drop-in image mechanism for the DSCM.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from causal_gen_tpu.config import Config
from causal_gen_tpu.models.likelihoods import make_likelihood
from causal_gen_tpu.ops.distributions import gaussian_kl, sample_gaussian

EPS_Z = -9.0  # minimum latent logscale (reference simple_vae.py:12)


class SimpleEncoder(nn.Module):
    """q(z | x, pa) conv encoder (reference simple_vae.py:34-70)."""

    hidden_dim: int
    z_dim: int

    @nn.compact
    def __call__(
        self, x: Array, y: Array, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        n = self.hidden_dim // 4
        # torch Conv2d(k=5, s=2, p=1): 32 -> 15; keep identical arithmetic
        h = nn.Conv(n, (5, 5), strides=(2, 2), padding=1)(x)
        h = nn.leaky_relu(h)
        h = nn.Conv(n, (3, 3), strides=(2, 2), padding=1)(h)  # -> 8x8
        h = nn.leaky_relu(h)
        h = nn.Conv(n, (3, 3), strides=(2, 2), padding=1)(h)  # -> 4x4
        h = nn.leaky_relu(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.leaky_relu(nn.Dense(self.hidden_dim)(h))
        h = nn.leaky_relu(nn.Dense(self.hidden_dim)(jnp.concatenate([h, y], axis=-1)))
        loc = nn.Dense(self.z_dim)(h)
        logscale = jnp.clip(nn.Dense(self.z_dim)(h), min=EPS_Z)
        if t is not None:
            logscale = logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)
        return loc, logscale


class CondPrior(nn.Module):
    """p(z | pa) MLP prior (reference simple_vae.py:73-100)."""

    hidden_dim: int
    z_dim: int

    @nn.compact
    def __call__(
        self, y: Array, t: Optional[float] = None
    ) -> Tuple[Array, Array, Array]:
        h = nn.leaky_relu(nn.Dense(self.hidden_dim)(y))
        h = nn.leaky_relu(nn.Dense(self.hidden_dim)(h))
        zeros = nn.initializers.zeros
        loc = nn.Dense(self.z_dim, kernel_init=zeros, bias_init=zeros)(h)
        logscale = jnp.clip(
            nn.Dense(self.z_dim, kernel_init=zeros, bias_init=zeros)(h), min=EPS_Z
        )
        if t is not None:
            logscale = logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)
        return loc, logscale, nn.Dense(self.z_dim)(h)


class SimpleDecoder(nn.Module):
    """p(x | z, pa) deconv decoder (reference simple_vae.py:250-321)."""

    cfg: Config
    hidden_dim: int

    def setup(self):
        cfg = self.cfg
        n = self.hidden_dim // 4
        if cfg.cond_prior:
            self.prior = CondPrior(hidden_dim=self.hidden_dim, z_dim=cfg.z_dim)
        self.fc1 = nn.Dense(self.hidden_dim)
        self.fc2 = nn.Dense(n * 4 * 4)
        self.conv1 = nn.Conv(n, (3, 3), padding="SAME")
        self.conv2 = nn.Conv(n, (3, 3), padding="SAME")
        self.conv3 = nn.Conv(16, (5, 5), padding="SAME")
        self._n = n

    def _drop(self) -> Tuple[Array, Array]:
        key = self.make_rng("sample")
        opt = jax.random.randint(key, (), 0, 3)
        return jnp.where(opt == 0, 0.0, 1.0), jnp.where(opt == 1, 0.0, 1.0)

    def __call__(
        self,
        y: Array,
        z: Optional[Array] = None,
        t: Optional[float] = None,
        train: bool = False,
    ) -> Tuple[Array, Tuple[Array, Array]]:
        cfg = self.cfg
        if train and cfg.cond_prior:
            p1, p2 = self._drop()
        else:
            p1, p2 = 1.0, 1.0
        # conditioning dropout of channels [2:] (reference simple_vae.py:290-293)
        y1 = y.at[:, 2:].multiply(p1)
        y2 = y.at[:, 2:].multiply(p2)

        if cfg.cond_prior:
            p_loc, p_logscale, p_feat = self.prior(y1, t)
        else:
            p_loc = jnp.zeros((y.shape[0], cfg.z_dim))
            p_logscale = jnp.zeros((y.shape[0], cfg.z_dim))
            if t is not None:
                p_logscale = p_logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)

        if z is None:
            z = sample_gaussian(self.make_rng("sample"), p_loc, p_logscale)
        if cfg.cond_prior:
            z = jnp.concatenate([p_feat, z], axis=-1)

        h = jnp.concatenate([z, y2], axis=-1)
        h = nn.relu(self.fc1(h))
        h = nn.relu(self.fc2(h))
        h = h.reshape(h.shape[0], 4, 4, self._n)
        for conv in (self.conv1, self.conv2, self.conv3):
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)  # nearest x2
            h = nn.relu(conv(h))
        return h, (p_loc, p_logscale)


class SimpleVAE(nn.Module):
    """Conditional VAE with the 4-method mechanism API
    (reference simple_vae.py:324-415)."""

    cfg: Config
    hidden_dim: int = 128

    def setup(self):
        cfg = self.cfg
        self.cond_prior = cfg.cond_prior
        self.encoder = SimpleEncoder(hidden_dim=self.hidden_dim, z_dim=cfg.z_dim)
        self.decoder = SimpleDecoder(cfg=cfg, hidden_dim=self.hidden_dim)
        # decoder output width is 16 channels (reference simple_vae.py:278)
        self.likelihood = make_likelihood(cfg.input_channels, 16, cfg.x_like, cfg.std_init)

    def __call__(
        self, x: Array, parents: Array, beta: float = 1.0, train: bool = True
    ) -> Dict[str, Array]:
        q_loc, q_logscale = self.encoder(x, y=parents)
        z = sample_gaussian(self.make_rng("sample"), q_loc, q_logscale)
        h, (p_loc, p_logscale) = self.decoder(y=parents, z=z, train=train)
        nll_pp = self.likelihood.nll(h, x)
        kl = gaussian_kl(q_loc, q_logscale, p_loc, p_logscale)
        kl_pp = jnp.sum(kl, axis=-1) / math.prod(x.shape[1:])
        elbo = jnp.mean(nll_pp) + beta * jnp.mean(kl_pp)
        return dict(elbo=elbo, nll=jnp.mean(nll_pp), kl=jnp.mean(kl_pp))

    def sample(
        self, parents: Array, return_loc: bool = True, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        h, _ = self.decoder(y=parents, t=t)
        return self.likelihood.sample(h, return_loc, t=t)

    def abduct(
        self,
        x: Array,
        parents: Array,
        cf_parents: Optional[Array] = None,
        alpha: float = 0.5,
        t: Optional[float] = None,
    ) -> List[Any]:
        q_loc, q_logscale = self.encoder(x, y=parents)
        z = sample_gaussian(self.make_rng("sample"), q_loc, q_logscale)
        if self.cond_prior:
            if cf_parents is None:
                return [{"z": z, "q_loc": q_loc, "q_logscale": q_logscale}]
            p_loc, p_logscale, _ = self.decoder.prior(cf_parents, t)
            q_scale = jnp.exp(q_logscale)
            u = (z - q_loc) / q_scale
            p_var = jnp.exp(p_logscale) ** 2
            # mixture weights are linear in alpha here (simple_vae.py:387-389),
            # unlike the HVAE's alpha^2 variant
            r_loc = alpha * q_loc + (1 - alpha) * p_loc
            r_var = alpha * q_scale**2 + (1 - alpha) * p_var
            r_scale = jnp.sqrt(r_var)
            if t is not None:
                r_scale = r_scale * t
            return [r_loc + r_scale * u]
        return [jax.lax.stop_gradient(z)]

    def forward_latents(
        self,
        latents: Sequence[Optional[Array]],
        parents: Array,
        return_loc: bool = True,
        t: Optional[float] = None,
    ) -> Tuple[Array, Array]:
        h, _ = self.decoder(y=parents, z=latents[0], t=t)
        return self.likelihood.sample(h, return_loc, t=t)
