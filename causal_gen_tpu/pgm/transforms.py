"""Invertible 1-D transforms for the attribute mechanisms (pure JAX).

Port targets (behavioral, not code): the Pyro transforms used by the
reference PGMs — T.Spline(order="linear") / AffineTransform /
SigmoidTransform / ComposeTransform (reference src/pgm/flow_pgm.py:137-147,
313-340, 552-566) and ConditionalAffineTransform (src/pgm/layers.py:33-43).

Design: a Transform is a tiny pytree-of-arrays + static metadata object with
``forward(x) -> (y, logdet)`` and ``inverse(y) -> (x, logdet)``, where logdet
is d log|dy/dx| accumulated elementwise. Everything is shape-polymorphic and
vmap/jit-safe; parameters enter as explicit arrays (from Flax modules), so
conditional flows are just transforms built from per-sample parameter
tensors.

The spline is the linear rational spline of Dolatabadi et al. 2020 (the
family behind Pyro's order="linear" Spline), derived from scratch: each bin
[x_k, x_k+1] is split at fractional position lambda into two linear-rational
segments with a middle knot; weights are fixed by matching the knot
derivatives d_k, d_k+1 and continuity (see _spline_params). Analytic inverse
(linear-fractional solve), exact logdet.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

# Pyro-compatible spline regularization constants
MIN_BIN_SIZE = 1e-3
MIN_DERIVATIVE = 1e-3
DEFAULT_BOUND = 3.0


class Transform:
    def forward(self, x: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    def inverse(self, y: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    def __call__(self, x: Array) -> Array:
        return self.forward(x)[0]

    def inv(self, y: Array) -> Array:
        return self.inverse(y)[0]


@dataclass
class Affine(Transform):
    """y = loc + scale * x (torch AffineTransform semantics)."""

    loc: Array
    log_scale: Array

    def forward(self, x):
        y = self.loc + jnp.exp(self.log_scale) * x
        return y, jnp.broadcast_to(self.log_scale, y.shape)

    def inverse(self, y):
        x = (y - self.loc) * jnp.exp(-self.log_scale)
        return x, jnp.broadcast_to(-self.log_scale, x.shape)


@dataclass
class Sigmoid(Transform):
    """y = sigmoid(x); logdet = log sigmoid'(x) = -softplus(x) - softplus(-x)."""

    def forward(self, x):
        y = jax.nn.sigmoid(x)
        ld = -jax.nn.softplus(x) - jax.nn.softplus(-x)
        return y, ld

    def inverse(self, y):
        eps = jnp.finfo(y.dtype).eps
        y_ = jnp.clip(y, eps, 1.0 - eps)
        x = jnp.log(y_) - jnp.log1p(-y_)
        ld = jax.nn.softplus(x) + jax.nn.softplus(-x)
        return x, ld


@dataclass
class Compose(Transform):
    """Transform chain. Logdet accumulation handles mixed granularity: when a
    part returns an EVENT-level logdet (one fewer dim, e.g. SoftmaxCentered),
    the running elementwise logdet is reduced over the event axis first."""

    parts: Sequence[Transform]

    @staticmethod
    def _accumulate(ld, d):
        if ld is None:
            return d
        if d.ndim == ld.ndim:
            return ld + d
        if d.ndim < ld.ndim:
            return jnp.sum(ld, axis=-1) + d
        return ld + jnp.sum(d, axis=-1)

    def forward(self, x):
        ld = None
        for t in self.parts:
            x, d = t.forward(x)
            ld = self._accumulate(ld, d)
        return x, ld

    def inverse(self, y):
        ld = None
        for t in reversed(list(self.parts)):
            y, d = t.inverse(y)
            ld = self._accumulate(ld, d)
        return y, ld


@dataclass
class SoftmaxCentered(Transform):
    """Softmax as a bijection R^K -> interior(simplex^{K+1}): forward appends
    an implicit zero pivot coordinate then softmaxes; inverse takes log-ratios
    against the last coordinate.

    Port target: the discrete-mechanism prototype (reference
    notebooks/discrete_mechanisms.ipynb cell 3) used for continuous-cause ->
    discrete-effect Gumbel-Softmax mechanisms. Unlike the elementwise
    transforms above, logdet here is per-EVENT (last dim reduced):
    log|det dy/dx| = 0.5*log(K+1) + sum(log y).
    """

    temperature: float = 1.0

    def forward(self, x):
        zero = jnp.zeros((*x.shape[:-1], 1), x.dtype)
        y = jax.nn.softmax(
            jnp.concatenate([x, zero], axis=-1) / self.temperature, axis=-1
        )
        kp1 = jnp.asarray(y.shape[-1], y.dtype)
        ld = 0.5 * jnp.log(kp1) + jnp.sum(
            jnp.log(jnp.clip(y, min=1e-12)), axis=-1
        )
        return y, ld

    def inverse(self, y):
        log_y = jnp.log(jnp.clip(y, min=1e-12))
        x = (log_y[..., :-1] - log_y[..., -1:]) * self.temperature
        kp1 = jnp.asarray(y.shape[-1], y.dtype)
        ld = -(0.5 * jnp.log(kp1) + jnp.sum(log_y, axis=-1))
        return x, ld


def normalize_neg11() -> Compose:
    """[-1,1] squashing tail used by the Morpho-MNIST PGM:
    Sigmoid then Affine(loc=-1, scale=2) (reference flow_pgm.py:326-329)."""
    return Compose([Sigmoid(), Affine(loc=jnp.float32(-1.0), log_scale=jnp.float32(math.log(2.0)))])


# ---------------------------------------------------------------------------
# Linear rational spline
# ---------------------------------------------------------------------------


def _spline_bins(unnormalized: Array, bound: float, min_size: float) -> Tuple[Array, Array]:
    """softmax bin sizes over [-bound, bound] with a min size; returns
    (sizes, cumulative-knots) with knots[0] = -bound, knots[-1] = bound."""
    K = unnormalized.shape[-1]
    probs = jax.nn.softmax(unnormalized, axis=-1)
    sizes = min_size + (1.0 - min_size * K) * probs
    sizes = sizes * (2.0 * bound)
    knots = jnp.cumsum(sizes, axis=-1)
    knots = jnp.concatenate([jnp.zeros_like(knots[..., :1]), knots], axis=-1) - bound
    # pin the endpoints exactly (cumsum rounding)
    knots = knots.at[..., -1].set(bound)
    sizes = knots[..., 1:] - knots[..., :-1]
    return sizes, knots


@dataclass
class LinearRationalSpline(Transform):
    """Elementwise monotonic linear-rational spline on [-bound, bound],
    identity outside (Dolatabadi et al. 2020; Pyro Spline(order='linear')).

    Parameter arrays have trailing dim K (n. bins) / K-1 (interior derivs):
      w_un: (..., K) unnormalized bin widths
      h_un: (..., K) unnormalized bin heights
      d_un: (..., K-1) unnormalized interior knot derivatives (softplus)
      l_un: (..., K) unnormalized per-bin lambda (split position)
    Leading dims broadcast against the input.
    """

    w_un: Array
    h_un: Array
    d_un: Array
    l_un: Array
    bound: float = DEFAULT_BOUND

    def _params(self):
        widths, xk = _spline_bins(self.w_un, self.bound, MIN_BIN_SIZE)
        heights, yk = _spline_bins(self.h_un, self.bound, MIN_BIN_SIZE)
        d_in = MIN_DERIVATIVE + jax.nn.softplus(self.d_un)
        ones = jnp.ones_like(d_in[..., :1])
        d = jnp.concatenate([ones, d_in, ones], axis=-1)  # boundary derivs = 1
        lam = 0.025 + 0.95 * jax.nn.sigmoid(self.l_un)  # in [0.025, 0.975]
        return widths, xk, heights, yk, d, lam

    def _bin_quantities(self, idx, widths, xk, heights, yk, d, lam):
        def take(a, i):
            a = jnp.broadcast_to(a, (*i.shape, a.shape[-1]))
            return jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
        w = take(widths, idx)
        h = take(heights, idx)
        x0 = take(xk, idx)
        y0 = take(yk, idx)
        dk = take(d, idx)
        dk1 = take(d, idx + 1)
        lm = take(lam, idx)
        s = h / w
        # weights (see module docstring derivation): wa := 1
        wb = jnp.sqrt(dk / dk1)
        wc = (lm * dk + (1.0 - lm) * wb * dk1) / s
        yc = ((1.0 - lm) * y0 + lm * wb * (y0 + h)) / ((1.0 - lm) + lm * wb)
        return w, h, x0, y0, dk, dk1, lm, wb, wc, yc

    def forward(self, x):
        widths, xk, heights, yk, d, lam = self._params()
        bc_shape = jnp.broadcast_shapes(x.shape, self.w_un.shape[:-1])
        x = jnp.broadcast_to(x, bc_shape)
        K = widths.shape[-1]
        inside = (x > -self.bound) & (x < self.bound)
        xs = jnp.where(inside, x, 0.0)
        # bin location by broadcast compare (K is tiny; VPU-friendly, no sort)
        idx = jnp.clip(
            jnp.sum(xs[..., None] >= xk[..., :-1], axis=-1) - 1, 0, K - 1
        )
        w, h, x0, y0, dk, dk1, lm, wb, wc, yc = self._bin_quantities(
            idx, widths, xk, heights, yk, d, lam
        )
        phi = (xs - x0) / w
        lo = phi <= lm
        # segment 1: y = (ya(lam-phi) + wc yc phi)/((lam-phi) + wc phi)
        den1 = (lm - phi) + wc * phi
        y1 = (y0 * (lm - phi) + wc * yc * phi) / den1
        ld1 = jnp.log(lm * wc * (yc - y0)) - 2.0 * jnp.log(jnp.abs(den1)) - jnp.log(w)
        # segment 2: y = (wc yc (1-phi) + wb yb (phi-lam))/(wc(1-phi)+wb(phi-lam))
        yb = y0 + h
        den2 = wc * (1.0 - phi) + wb * (phi - lm)
        y2 = (wc * yc * (1.0 - phi) + wb * yb * (phi - lm)) / den2
        ld2 = (
            jnp.log(wb * wc * (1.0 - lm) * (yb - yc))
            - 2.0 * jnp.log(jnp.abs(den2))
            - jnp.log(w)
        )
        y = jnp.where(lo, y1, y2)
        ld = jnp.where(lo, ld1, ld2)
        y = jnp.where(inside, y, x)
        ld = jnp.where(inside, ld, 0.0)
        return y, ld

    def inverse(self, y):
        widths, xk, heights, yk, d, lam = self._params()
        bc_shape = jnp.broadcast_shapes(y.shape, self.w_un.shape[:-1])
        y = jnp.broadcast_to(y, bc_shape)
        K = widths.shape[-1]
        inside = (y > -self.bound) & (y < self.bound)
        ys = jnp.where(inside, y, 0.0)
        idx = jnp.clip(
            jnp.sum(ys[..., None] >= yk[..., :-1], axis=-1) - 1, 0, K - 1
        )
        w, h, x0, y0, dk, dk1, lm, wb, wc, yc = self._bin_quantities(
            idx, widths, xk, heights, yk, d, lam
        )
        yb = y0 + h
        lo = ys <= yc
        # segment 1 inverse: phi = lam (y-ya)/((y-ya) + wc(yc-y))
        den1 = (ys - y0) + wc * (yc - ys)
        phi1 = lm * (ys - y0) / den1
        # segment 2 inverse: r = wc(y-yc)/(wb(yb-y)); phi = (lam + r)/(1+r)
        r = wc * (ys - yc) / (wb * (yb - ys))
        phi2 = (lm + r) / (1.0 + r)
        phi = jnp.where(lo, phi1, phi2)
        x = x0 + phi * w
        # logdet of inverse = -logdet of forward at x
        d1 = (lm - phi) + wc * phi
        ld1 = -(jnp.log(lm * wc * (yc - y0)) - 2.0 * jnp.log(jnp.abs(d1)) - jnp.log(w))
        d2 = wc * (1.0 - phi) + wb * (phi - lm)
        ld2 = -(
            jnp.log(wb * wc * (1.0 - lm) * (yb - yc))
            - 2.0 * jnp.log(jnp.abs(d2))
            - jnp.log(w)
        )
        ld = jnp.where(lo, ld1, ld2)
        x = jnp.where(inside, x, y)
        ld = jnp.where(inside, ld, 0.0)
        return x, ld
