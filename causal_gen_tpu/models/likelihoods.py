"""Image likelihood heads (Flax linen, NHWC).

Port targets:
- DGaussNet: reference src/vae.py:322-423 (discretized Gaussian; RGB
  autoregressive channel coeffs; fixed/shared/diag covariance freezing)
- GaussNet: reference src/simple_vae.py:173-247 (dequantized logit-Normal)
- DmolNet: reference src/dmol.py:218-245 (discretized mix of logistics)

All heads share the surface {__call__(h, x, t) -> (loc, logscale),
nll(h, x), sample(h, return_loc, t) -> (x, scale)}. Sampling draws PRNG via
the linen "sample" rng stream instead of global torch RNG.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from causal_gen_tpu.ops import dmol as dmol_ops
from causal_gen_tpu.ops.distributions import (
    EPS_LOGSCALE,
    discretized_gaussian_nll,
    normal_logpdf,
)


class DGaussNet(nn.Module):
    """Discretized Gaussian head (reference vae.py:322-423)."""

    input_channels: int
    width: int  # widths[0], channels of decoder output h
    x_like: str = "diag_dgauss"
    std_init: float = 0.0
    spatial_dims: int = 2  # 2 = images, 3 = volumes

    def setup(self):
        cov = self.x_like.split("_")[0]
        if cov not in ("fixed", "shared", "diag"):
            raise NotImplementedError(f"{self.x_like} not implemented.")
        self.covariance = cov
        self.x_loc = nn.Conv(self.input_channels, (1,) * self.spatial_dims)
        # logscale as explicit params for selective freezing (vae.py:335-348):
        # fixed -> freeze kernel+bias; shared -> freeze kernel only.
        if self.std_init > 0:
            k_init = nn.initializers.zeros
            b_init = nn.initializers.constant(math.log(self.std_init))
        else:
            k_init = nn.initializers.lecun_normal()
            b_init = nn.initializers.zeros
        self.logscale_kernel = self.param(
            "x_logscale_kernel", k_init, (self.width, self.input_channels)
        )
        self.logscale_bias = self.param(
            "x_logscale_bias", b_init, (self.input_channels,)
        )
        if self.input_channels == 3:
            self.channel_coeffs = nn.Conv(3, (1,) * self.spatial_dims)

    def _logscale(self, h: Array) -> Array:
        k, b = self.logscale_kernel, self.logscale_bias
        if self.std_init > 0:
            if self.covariance == "fixed":
                k, b = jax.lax.stop_gradient(k), jax.lax.stop_gradient(b)
            elif self.covariance == "shared":
                k = jax.lax.stop_gradient(k)
        return jnp.einsum("...c,co->...o", h, k) + b

    def __call__(
        self, h: Array, x: Optional[Array] = None, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        loc = self.x_loc(h)
        logscale = jnp.clip(self._logscale(h), min=EPS_LOGSCALE)
        if self.input_channels == 3:  # RGB autoregression (vae.py:357-381)
            coeff = jnp.tanh(self.channel_coeffs(h))
            if x is None:  # inference: condition on clipped predicted subpixels
                r = jnp.clip(loc[..., 0], -1, 1)
                g = jnp.clip(loc[..., 1] + coeff[..., 0] * r, -1, 1)
                b_ = jnp.clip(loc[..., 2] + coeff[..., 1] * r + coeff[..., 2] * g, -1, 1)
            else:  # training: condition on true subpixels
                r = loc[..., 0]
                g = loc[..., 1] + coeff[..., 0] * x[..., 0]
                b_ = loc[..., 2] + coeff[..., 1] * x[..., 0] + coeff[..., 2] * x[..., 1]
            loc = jnp.stack([r, g, b_], axis=-1)
        if t is not None:
            logscale = logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)
        return loc, logscale

    def nll(self, h: Array, x: Array) -> Array:
        loc, logscale = self(h, x)
        return discretized_gaussian_nll(loc, logscale, x)

    def sample(
        self, h: Array, return_loc: bool = True, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        if return_loc:
            x, logscale = self(h)
        else:
            loc, logscale = self(h, t=t)
            key = self.make_rng("sample")
            x = loc + jnp.exp(logscale) * jax.random.normal(key, loc.shape, loc.dtype)
        return jnp.clip(x, -1.0, 1.0), jnp.exp(logscale)


class GaussNet(nn.Module):
    """Dequantized logit-Normal head (reference simple_vae.py:173-247)."""

    input_channels: int
    width: int
    x_like: str = "shared_gauss"
    std_init: float = 1.0
    spatial_dims: int = 2

    def setup(self):
        cov = self.x_like.split("_")[0]
        self.covariance = cov
        self.x_loc = nn.Conv(self.input_channels, (1,) * self.spatial_dims)
        if self.std_init > 0:
            k_init = nn.initializers.zeros
            b_init = nn.initializers.constant(math.log(self.std_init))
        else:
            k_init = nn.initializers.lecun_normal()
            b_init = nn.initializers.zeros
        self.logscale_kernel = self.param(
            "x_logscale_kernel", k_init, (self.width, self.input_channels)
        )
        self.logscale_bias = self.param(
            "x_logscale_bias", b_init, (self.input_channels,)
        )

    def _params(self, h: Array, t: Optional[float]) -> Tuple[Array, Array]:
        k, b = self.logscale_kernel, self.logscale_bias
        if self.std_init > 0:
            if self.covariance == "fixed":
                k, b = jax.lax.stop_gradient(k), jax.lax.stop_gradient(b)
            elif self.covariance == "shared":
                k = jax.lax.stop_gradient(k)
        loc = self.x_loc(h)
        logscale = jnp.clip(jnp.einsum("...c,co->...o", h, k) + b, min=EPS_LOGSCALE)
        if t is not None:
            logscale = logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)
        return loc, logscale

    def __call__(self, h: Array, x=None, t: Optional[float] = None):
        return self._params(h, t)

    def nll(self, h: Array, x: Array) -> Array:
        loc, logscale = self._params(h, None)
        key = self.make_rng("sample")
        # [-1,1] -> [0,255], dequantize to [0,256), then logit(x/256)
        # (reference simple_vae.py:221-226, 237-247 with alpha=0)
        x255 = (x + 1.0) * 127.5
        x_deq = x255 + jax.random.uniform(key, x.shape, x.dtype)
        u = x_deq / 256.0
        x_logit = jnp.log(u) - jnp.log1p(-u)
        lp = normal_logpdf(x_logit, loc, jnp.exp(logscale))
        n_dims = math.prod(x.shape[1:])
        return -1.0 * jnp.sum(lp, axis=tuple(range(1, x.ndim))) / n_dims

    def sample(
        self, h: Array, return_loc: bool = True, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        loc, logscale = self._params(h, t)
        if not return_loc:
            key = self.make_rng("sample")
            loc = loc + jnp.exp(logscale) * jax.random.normal(key, loc.shape, loc.dtype)
        x = jax.nn.sigmoid(loc) * 256.0  # inverse of logit preprocess
        x = jnp.clip((x - 128.0) / 128.0, -1.0, 1.0)
        return x, jnp.exp(logscale)


class DmolNet(nn.Module):
    """Discretized mixture-of-logistics head (reference dmol.py:218-245)."""

    input_channels: int
    width: int
    num_mixtures: int = 10
    mask: str = "soft"
    use_pallas: bool = False  # fused Pallas NLL + sampler (TPU)

    def setup(self):
        if self.input_channels != 3:
            raise NotImplementedError("DMoL head expects RGB input")
        self.conv = nn.Conv(self.num_mixtures * 10, (1, 1))

    def __call__(self, h: Array, x=None, t: Optional[float] = None) -> Array:
        return self.conv(h)  # already channels-last

    def nll(self, h: Array, x: Array) -> Array:
        if self.use_pallas:
            from causal_gen_tpu.ops.pallas_kernels import (
                default_interpret, dmol_loss_pallas,
            )

            return dmol_loss_pallas(x, self.conv(h), False, default_interpret())
        return dmol_ops.discretized_mix_logistic_loss(x=x, l=self.conv(h))

    def sample(
        self, h: Array, return_loc: bool = True, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        l = self.conv(h)
        if return_loc:
            x, scale = dmol_ops.mean_discretized_mix_logistic(
                l, self.num_mixtures, mask=self.mask
            )
        elif self.use_pallas:
            from causal_gen_tpu.ops.pallas_kernels import (
                default_interpret, dmol_sample_pallas,
            )

            seed = jax.random.randint(
                self.make_rng("sample"), (), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
            x, scale = dmol_sample_pallas(
                seed, l, self.num_mixtures, t=1.0 if t is None else t,
                interpret=default_interpret(),
            )
        else:
            key = self.make_rng("sample")
            x, scale = dmol_ops.sample_from_discretized_mix_logistic(
                key, l, self.num_mixtures, t=t
            )
        return jnp.clip(x, -1.0, 1.0), scale


def make_likelihood(input_channels: int, width: int, x_like: str, std_init: float,
                    use_pallas: bool = False, spatial_dims: int = 2):
    kind = x_like.split("_")[1]
    if kind == "dgauss":
        return DGaussNet(
            input_channels=input_channels, width=width, x_like=x_like,
            std_init=std_init, spatial_dims=spatial_dims,
        )
    if kind == "gauss":
        return GaussNet(
            input_channels=input_channels, width=width, x_like=x_like,
            std_init=std_init, spatial_dims=spatial_dims,
        )
    if kind == "dmol":
        if spatial_dims != 2:
            raise NotImplementedError("DMoL head is RGB-image (2-D) only")
        return DmolNet(input_channels=input_channels, width=width,
                       use_pallas=use_pallas)
    raise NotImplementedError(f"{x_like} not implemented.")
