"""Pallas TPU kernels for the hot fused elementwise math.

BASELINE.json north-star targets: fused resblock sampling + Gaussian KL and
the DMoL log-prob as on-chip kernels (the reference relies on two
@torch.jit.script scalar fusions, vae.py:14-30). These kernels keep the whole
per-latent chain (noise generation -> reparameterized sample -> KL) or the
per-pixel mixture NLL in VMEM with one HBM round-trip.

All kernels are numerics-tested against the pure-jnp ops (tests/test_pallas.py
runs them in interpreter mode on CPU; on TPU they compile to Mosaic). Noise
is generated IN-KERNEL from the TPU PRNG (Box-Muller over prng_random_bits),
so the Pallas path has its own deterministic-but-different random stream from
jax.random.normal — sameness is per-path, as documented on use_pallas.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 256


def default_interpret():
    """Interpret mode for the current backend: Mosaic TPU interpreter on CPU
    (the plain HLO interpreter lacks prng_seed/prng_random_bits), compiled
    Mosaic on TPU. Hashable, so usable as a static pallas_call argument."""
    if jax.default_backend() == "cpu":
        return pltpu.InterpretParams()
    return False


def _pad_rows(x: Array, tile: int) -> Tuple[Array, int]:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, n


# ---------------------------------------------------------------------------
# Fused Gaussian sample + KL
# ---------------------------------------------------------------------------


def _sample_kl_kernel(seed_ref, q_loc, q_logscale, p_loc, p_logscale, z_out, kl_out):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    shape = q_loc.shape
    # two uniforms in (0,1) from 24 low bits -> Box-Muller standard normal.
    # Mask as int32 (Mosaic lacks uint32->f32 casts; the 24-bit AND keeps the
    # value non-negative so int32->f32 is exact)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    mask24 = jnp.int32(0x00FFFFFF)
    u1 = (b1 & mask24).astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = (b2 & mask24).astype(jnp.float32) * (1.0 / (1 << 24))
    eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * math.pi * u2)
    ql, qs, plc, ps = q_loc[:], q_logscale[:], p_loc[:], p_logscale[:]
    z_out[:] = ql + jnp.exp(qs) * eps
    # KL(q||p) per element (reference vae.py:14-25)
    kl_out[:] = (
        -0.5
        + ps
        - qs
        + 0.5 * (jnp.exp(qs) ** 2 + (ql - plc) ** 2) / jnp.exp(ps) ** 2
    )


def fused_sample_kl(
    seed: Array, q_loc: Array, q_logscale: Array, p_loc: Array, p_logscale: Array,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """z ~ N(q_loc, exp(q_logscale)), kl = KL(q||p), one fused VMEM pass.

    Inputs of any common shape; ``seed`` int32 scalar array. Differentiable:
    a custom VJP implements the reparameterization gradient (eps recovered
    from the saved sample) and the closed-form Gaussian-KL derivatives, so
    the kernel can sit in the training path.
    """
    return _fused_sample_kl_vjp(
        jnp.atleast_1d(seed).astype(jnp.int32),
        q_loc, q_logscale, p_loc, p_logscale, interpret,
    )


def _fused_sample_kl_impl(
    seed: Array, q_loc: Array, q_logscale: Array, p_loc: Array, p_logscale: Array,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    shape = q_loc.shape
    flat = lambda a: a.reshape(-1, shape[-1]) if a.ndim > 1 else a.reshape(1, -1)
    args = [flat(a.astype(jnp.float32)) for a in (q_loc, q_logscale, p_loc, p_logscale)]
    rows = args[0].shape[0]
    args = [(_pad_rows(a, TILE_ROWS))[0] for a in args]
    padded_rows = args[0].shape[0]
    cols = args[0].shape[1]
    grid = (padded_rows // TILE_ROWS,)
    spec = pl.BlockSpec(
        (TILE_ROWS, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    z, kl = pl.pallas_call(
        _sample_kl_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed, whole array
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((padded_rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((padded_rows, cols), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(seed).astype(jnp.int32), *args)
    return z[:rows].reshape(shape), kl[:rows].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_sample_kl_vjp(seed, q_loc, q_logscale, p_loc, p_logscale, interpret):
    return _fused_sample_kl_impl(seed, q_loc, q_logscale, p_loc, p_logscale, interpret)


def _fskl_fwd(seed, q_loc, q_logscale, p_loc, p_logscale, interpret):
    z, kl = _fused_sample_kl_impl(seed, q_loc, q_logscale, p_loc, p_logscale, interpret)
    return (z, kl), (q_loc, q_logscale, p_loc, p_logscale, z)


def _fskl_bwd(interpret, res, cts):
    q_loc, q_logscale, p_loc, p_logscale, z = res
    gz, gkl = cts
    s_q2 = jnp.exp(q_logscale) ** 2
    inv_p2 = jnp.exp(-p_logscale) ** 2
    diff = q_loc - p_loc
    # reparameterization: z = q_loc + exp(q_logscale)*eps with eps fixed
    d_qloc = gz + gkl * diff * inv_p2
    d_qlog = gz * (z - q_loc) + gkl * (s_q2 * inv_p2 - 1.0)
    d_ploc = -gkl * diff * inv_p2
    d_plog = gkl * (1.0 - (s_q2 + diff**2) * inv_p2)
    return (jnp.zeros((1,), jnp.int32), d_qloc, d_qlog, d_ploc, d_plog)


_fused_sample_kl_vjp.defvjp(_fskl_fwd, _fskl_bwd)


# ---------------------------------------------------------------------------
# DMoL per-pixel NLL
# ---------------------------------------------------------------------------


def _dmol_kernel(x_ref, l_ref, out_ref, *, nr_mix: int, low_bit: bool):
    """Per-pixel mixture log-prob. x: (T, 3); l: (T, 10K); out: (T, 1).

    Channel layout of l (matches ops/dmol._unpack): [:K] mixture logits, then
    per-channel contiguous blocks of 3K = [means_c, log_scales_c, coeffs_c].
    coeffs_0 shifts green by red, coeffs_1/coeffs_2 shift blue by red/green.
    """
    x = x_ref[:]
    l = l_ref[:]
    K = nr_mix
    logits = l[:, :K]
    half_bin = 1.0 / 31.0 if low_bit else 1.0 / 255.0
    tail = math.log(15.5) if low_bit else math.log(127.5)

    def ch(c, part):  # part: 0 means, 1 log_scales, 2 coeffs
        base = K + 3 * K * c + K * part
        return l[:, base : base + K]

    x0, x1, x2 = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    coeff0 = jnp.tanh(ch(0, 2))
    coeff1 = jnp.tanh(ch(1, 2))
    coeff2 = jnp.tanh(ch(2, 2))
    means = [
        ch(0, 0),
        ch(1, 0) + coeff0 * x0,
        ch(2, 0) + coeff1 * x0 + coeff2 * x1,
    ]
    xs = [x0, x1, x2]
    log_probs = jnp.zeros_like(logits)
    for c in range(3):
        log_scales = jnp.maximum(ch(c, 1), -7.0)
        centered = xs[c] - means[c]
        inv_stdv = jnp.exp(-log_scales)
        plus_in = inv_stdv * (centered + half_bin)
        min_in = inv_stdv * (centered - half_bin)
        cdf_delta = jax.nn.sigmoid(plus_in) - jax.nn.sigmoid(min_in)
        log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
        log_one_minus_cdf_min = -jax.nn.softplus(min_in)
        mid_in = inv_stdv * centered
        log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
        lp = jnp.where(
            xs[c] < -0.999,
            log_cdf_plus,
            jnp.where(
                xs[c] > 0.999,
                log_one_minus_cdf_min,
                jnp.where(
                    cdf_delta > 1e-5,
                    jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                    log_pdf_mid - tail,
                ),
            ),
        )
        log_probs = log_probs + lp
    m = jnp.max(logits, axis=-1, keepdims=True)
    log_softmax = logits - m - jnp.log(
        jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    )
    total = log_probs + log_softmax
    mx = jnp.max(total, axis=-1, keepdims=True)
    out_ref[:] = mx + jnp.log(jnp.sum(jnp.exp(total - mx), axis=-1, keepdims=True))


def _dmol_logprob_pixels(x: Array, l: Array, low_bit: bool, interpret: bool) -> Array:
    """(B,H,W,3), (B,H,W,10K) -> per-pixel mixture log-prob (B,H,W)."""
    nr_mix = l.shape[-1] // 10
    b, h, w, _ = x.shape
    xf = x.reshape(-1, 3).astype(jnp.float32)
    lf = l.reshape(-1, l.shape[-1]).astype(jnp.float32)
    xf, rows = _pad_rows(xf, TILE_ROWS)
    lf, _ = _pad_rows(lf, TILE_ROWS)
    grid = (xf.shape[0] // TILE_ROWS,)
    out = pl.pallas_call(
        functools.partial(_dmol_kernel, nr_mix=nr_mix, low_bit=low_bit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_ROWS, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_ROWS, lf.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(xf, lf)
    return out[:rows, 0].reshape(b, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dmol_loss_pallas(x: Array, l: Array, low_bit: bool = False,
                     interpret: bool = False) -> Array:
    """Per-image mean DMoL NLL with a Pallas forward and an exact autodiff
    backward through the pure-jnp reference op (recompute-in-bwd)."""
    lp = _dmol_logprob_pixels(x, l, low_bit, interpret)
    n_dims = math.prod(x.shape[1:])
    return -1.0 * jnp.sum(lp, axis=(1, 2)) / n_dims


def _dmol_fwd(x, l, low_bit, interpret):
    return dmol_loss_pallas(x, l, low_bit, interpret), (x, l)


def _dmol_bwd(low_bit, interpret, res, g):
    from causal_gen_tpu.ops.dmol import discretized_mix_logistic_loss

    x, l = res
    _, vjp = jax.vjp(
        lambda xx, ll: discretized_mix_logistic_loss(xx, ll, low_bit=low_bit), x, l
    )
    return vjp(g)


dmol_loss_pallas.defvjp(_dmol_fwd, _dmol_bwd)


# ---------------------------------------------------------------------------
# DMoL sampling (fused Gumbel-max mixture select + logistic inverse-CDF)
# ---------------------------------------------------------------------------


def _uniform_bits(shape, lo: float = 1e-5, hi: float = 1.0 - 1e-5):
    """In-kernel uniforms in [lo, hi) from the TPU PRNG (24-bit mantissa path,
    same int32 masking trick as _sample_kl_kernel)."""
    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    u01 = (b & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))
    return lo + (hi - lo) * u01


def _dmol_sample_kernel(seed_ref, l_ref, x_out, s_out, *, nr_mix: int,
                        log_t: float):
    """One VMEM pass: Gumbel-max over K mixture logits, per-channel
    (mean, log_scale, coeff) selection, logistic inverse-CDF sample, and the
    RGB autoregressive clip chain (reference dmol.py:121-161 semantics; RNG
    is the in-kernel TPU PRNG, so the stream is deterministic-but-different
    from jax.random — sameness is per-path, as for fused_sample_kl)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    l = l_ref[:]
    K = nr_mix
    logits = l[:, :K]
    # Gumbel-max mixture selection; ties are measure-zero but normalize the
    # one-hot anyway so they cannot double-count
    g = logits - jnp.log(-jnp.log(_uniform_bits(logits.shape)))
    sel = (g >= jnp.max(g, axis=-1, keepdims=True)).astype(jnp.float32)
    sel = sel / jnp.sum(sel, axis=-1, keepdims=True)

    def ch(c, part):  # same layout as _dmol_kernel
        base = K + 3 * K * c + K * part
        return l[:, base : base + K]

    def pick(c, part):
        return jnp.sum(ch(c, part) * sel, axis=-1, keepdims=True)

    xs = []
    scales = []
    for c in range(3):
        mean = pick(c, 0)
        log_scale = jnp.maximum(pick(c, 1), -7.0) + log_t
        u = _uniform_bits(mean.shape)
        xs.append(mean + jnp.exp(log_scale) * (jnp.log(u) - jnp.log(1.0 - u)))
        scales.append(jnp.exp(log_scale))
    # autoregressive clip chain (reference dmol.py:151-158)
    c0 = jnp.tanh(pick(0, 2))
    c1 = jnp.tanh(pick(1, 2))
    c2 = jnp.tanh(pick(2, 2))
    x0 = jnp.clip(xs[0], -1.0, 1.0)
    x1 = jnp.clip(xs[1] + c0 * x0, -1.0, 1.0)
    x2 = jnp.clip(xs[2] + c1 * x0 + c2 * x1, -1.0, 1.0)
    x_out[:] = jnp.concatenate([x0, x1, x2], axis=-1)
    s_out[:] = jnp.concatenate(scales, axis=-1)


def dmol_sample_pallas(
    seed: Array, l: Array, nr_mix: int, t: float = 1.0, interpret: bool = False
) -> Tuple[Array, Array]:
    """Fused DMoL sampler: (B,H,W,10K) logits -> ((B,H,W,3) sample in [-1,1],
    (B,H,W,3) scale), one HBM round-trip. ``seed`` int32 scalar array; ``t``
    static temperature (compile-time constant, as in the jnp op)."""
    b, h, w, _ = l.shape
    lf = l.reshape(-1, l.shape[-1]).astype(jnp.float32)
    lf, rows = _pad_rows(lf, TILE_ROWS)
    grid = (lf.shape[0] // TILE_ROWS,)
    out_spec = pl.BlockSpec((TILE_ROWS, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    x, s = pl.pallas_call(
        functools.partial(
            _dmol_sample_kernel, nr_mix=nr_mix,
            log_t=float(math.log(t if t is not None else 1.0)),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(
                (TILE_ROWS, lf.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((lf.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((lf.shape[0], 3), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(seed).astype(jnp.int32), lf)
    return x[:rows].reshape(b, h, w, 3), s[:rows].reshape(b, h, w, 3)
