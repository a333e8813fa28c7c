"""Hierarchical VAE image mechanism (Flax linen, NHWC, statically unrolled).

Port target: reference src/vae.py:137-523 (DecoderBlock/Decoder/HVAE) with the
four-method mechanism API {__call__, sample, abduct, forward_latents}
(SURVEY.md §1 "L3/L4 model API").

TPU-native redesign decisions:
- Parents flow as (B, context_dim) vectors; each consumption site broadcasts
  them to (B, res, res, ctx) with jnp.broadcast_to, which XLA fuses into the
  following conv (the reference materializes full-res parent maps and slices
  per block, vae.py:241).
- The decoder's per-block loop is a static Python unroll over a fixed,
  config-derived block list; latent plumbing uses fixed-length tuples with
  None holes so every call mode traces to one static XLA graph (replaces the
  reference's dict-keyed activations + try/except latent indexing,
  vae.py:281-285).
- Sampling keys come from the linen "sample" RNG stream: one fold per site, so
  identical seeds give identical counterfactuals (BASELINE.json requirement).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from causal_gen_tpu.config import Config
from causal_gen_tpu.models.blocks import Block, Encoder, scaled_init, upsample_nearest
from causal_gen_tpu.models.likelihoods import make_likelihood
from causal_gen_tpu.ops.distributions import gaussian_kl, sample_gaussian


def _bcast_pa(pa: Array, like: Array) -> Array:
    """(B, ctx) -> (B, *spatial, ctx) broadcast to ``like``'s spatial dims
    (free under XLA fusion); rank-agnostic so 3-D volumes work unchanged."""
    b, c = pa.shape
    nd = like.ndim - 2
    shape = (b,) + like.shape[1:-1] + (c,)
    return jnp.broadcast_to(pa.reshape((b,) + (1,) * nd + (c,)), shape)


def _cat(parts: Sequence[Array], dtype: Optional[Any]) -> Array:
    """Concatenate conv inputs in the block's COMPUTE dtype.

    Mixed f32/bf16 operands (f32 pa broadcasts, f32 latent samples, bf16
    hidden states) otherwise promote the whole concatenation to f32 — a
    materialized full-res f32 buffer that the following conv immediately
    re-converts to bf16. Pre-casting each operand is bit-identical to the
    conv's own input cast and halves the concat's HBM traffic."""
    if dtype is not None:
        parts = [p.astype(dtype) for p in parts]
    return jnp.concatenate(parts, axis=-1)


class DecoderBlock(nn.Module):
    """Top-down stochastic block (reference vae.py:137-192)."""

    in_width: int
    out_width: int
    resolution: int
    z_dim: int
    context_dim: int
    bottleneck_factor: int
    stochastic: bool
    cond_prior: bool
    q_correction: bool
    version: Optional[str]
    n_blocks: int  # total decoder depth, for 1/sqrt(L) weight scaling
    dtype: Optional[Any] = None  # conv compute dtype (bf16 -> MXU full rate)
    remat: bool = False  # rematerialize the conv bodies (jax.checkpoint)
    spatial_dims: int = 2
    posterior_scale: float = 1.0  # see Config.posterior_init_scale

    def setup(self):
        BlockCls = nn.remat(Block) if self.remat else Block
        bottleneck = self.in_width // self.bottleneck_factor
        k = 3 if self.resolution > 2 else 1
        nd = self.spatial_dims
        scale = float(np.sqrt(1.0 / self.n_blocks))
        self.prior = BlockCls(
            in_width=self.in_width + (self.context_dim if self.cond_prior else 0),
            bottleneck=bottleneck,
            out_width=2 * self.z_dim + self.in_width,
            kernel_size=k,
            residual=False,
            version=self.version,
            last_scale=0.0,  # zero-init prior head (reference vae.py:308)
            dtype=self.dtype,
            spatial_dims=nd,
        )
        if self.stochastic:
            self.posterior = BlockCls(
                in_width=2 * self.in_width + self.context_dim,
                bottleneck=bottleneck,
                out_width=2 * self.z_dim,
                kernel_size=k,
                residual=False,
                version=self.version,
                last_scale=self.posterior_scale,
                dtype=self.dtype,
                spatial_dims=nd,
            )
        self.z_proj = nn.Conv(self.in_width, (1,) * nd, kernel_init=scaled_init(scale),
                              dtype=self.dtype)
        if not self.q_correction:
            self.z_feat_proj = nn.Conv(self.out_width, (1,) * nd, dtype=self.dtype)
        self.conv = BlockCls(
            in_width=self.in_width,
            bottleneck=bottleneck,
            out_width=self.out_width,
            kernel_size=k,
            residual=True,
            version=self.version,
            last_scale=scale,
            dtype=self.dtype,
            spatial_dims=nd,
        )

    def forward_prior(
        self, z: Array, pa: Optional[Array] = None, t: Optional[float] = None
    ) -> Tuple[Array, Array, Array]:
        if self.cond_prior:
            z = _cat([z, _bcast_pa(pa, z)], self.dtype)
        z = self.prior(z)
        stats32 = z[..., : 2 * self.z_dim].astype(jnp.float32)
        p_loc = stats32[..., : self.z_dim]
        p_logscale = stats32[..., self.z_dim :]
        p_features = z[..., 2 * self.z_dim :]
        if t is not None:
            p_logscale = p_logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)
        return p_loc, p_logscale, p_features

    def forward_posterior(
        self, z: Array, x: Array, pa: Array, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        h = _cat([z, _bcast_pa(pa, z), x], self.dtype)
        out = self.posterior(h).astype(jnp.float32)
        q_loc, q_logscale = jnp.split(out, 2, axis=-1)
        if t is not None:
            q_logscale = q_logscale + jnp.log(t)  # jnp: t may be a tracer (one viz graph for all temps)
        return q_loc, q_logscale

    def __call__(self, *a, **k):  # linen requires __call__; dispatch unused
        raise NotImplementedError


def plan_decoder_blocks(cfg: Config) -> List[Tuple[int, int]]:
    """Flattened per-block (res, width) list of the decoder."""
    stages: List[Tuple[int, int]] = []
    rev_widths = tuple(reversed(cfg.model_widths))
    for i, st in enumerate(cfg.dec_stages):
        stages += [(st.res, rev_widths[i]) for _ in range(st.n_blocks)]
    return stages


def plan_decoder_layout(cfg: Config) -> List[Tuple]:
    """Group the decoder's block list into scan runs of same-shaped blocks.

    Returns layout elements ("single", i) | ("run", start, length). A block
    joins a run when it has no resolution boundary on entry (no upsample /
    bias add) and in_width == out_width, so every iteration of the scanned
    body is shape-identical. Boundary blocks stay unrolled under their
    original ``blocks_i`` parameter names. Runs of length 1 degrade to
    singles (a scan of one step only costs compile-time bookkeeping).
    """
    stages = plan_decoder_blocks(cfg)
    n = len(stages)
    uniform = []
    for i, (res, width) in enumerate(stages):
        next_width = stages[min(n - 1, i + 1)][1]
        uniform.append(
            i > 0 and stages[i - 1][0] == res and next_width == width
        )
    layout: List[Tuple] = []
    i = 0
    while i < n:
        if not uniform[i]:
            layout.append(("single", i))
            i += 1
            continue
        j = i
        while j < n and uniform[j]:
            j += 1
        if j - i >= 2:
            layout.append(("run", i, j - i))
        else:
            layout.append(("single", i))
        i = j
    return layout


class DecoderRunCell(nn.Module):
    """One iteration of a scanned run of same-shaped decoder blocks.

    nn.scan stacks this cell's params on a leading axis (one slice per
    block) and splits the "sample" RNG stream per iteration. With
    cfg.remat the cell is the rematerialization unit: activations are
    stored only at run boundaries (stage-level jax.checkpoint — the
    memory knob for 192^2+ configs).
    """

    width: int
    resolution: int
    z_dim: int
    context_dim: int
    bottleneck_factor: int
    stochastic: bool
    cond_prior: bool
    q_correction: bool
    version: Optional[str]
    n_blocks: int
    dtype: Optional[Any] = None
    spatial_dims: int = 2
    posterior_scale: float = 1.0

    def setup(self):
        self.block = DecoderBlock(
            in_width=self.width,
            out_width=self.width,
            resolution=self.resolution,
            z_dim=self.z_dim,
            context_dim=self.context_dim,
            bottleneck_factor=self.bottleneck_factor,
            stochastic=self.stochastic,
            cond_prior=self.cond_prior,
            q_correction=self.q_correction,
            version=self.version,
            n_blocks=self.n_blocks,
            dtype=self.dtype,
            spatial_dims=self.spatial_dims,
            posterior_scale=self.posterior_scale,
            name="block",
        )

    def __call__(self, carry, latent, lat_mask, pa_sto, pa, act, t, abduct):
        h, z = carry
        block = self.block
        p_input = h if self.q_correction else z
        p_loc, p_logscale, p_feat = block.forward_prior(p_input, pa_sto, t=t)
        stat: Dict[str, Any] = {}
        if self.stochastic:
            if act is not None:  # posterior mode (acts given)
                q_loc, q_logscale = block.forward_posterior(h, act, pa, t=t)
                z_s = sample_gaussian(self.make_rng("sample"), q_loc, q_logscale)
                # reduce KL over spatial dims AT THE SOURCE: the scan stacks
                # every per-iteration output, and stacking full-res KL maps
                # (e.g. f32[8,B,48,48,16]) costs a dynamic-update-slice +
                # re-slice round trip through HBM per run; the loss only ever
                # consumes spatial sums (HVAE.__call__)
                kl_map = gaussian_kl(q_loc, q_logscale, p_loc, p_logscale)
                stat["kl"] = jnp.sum(
                    kl_map, axis=tuple(range(1, 1 + self.spatial_dims))
                )
                if abduct:
                    if self.cond_prior:
                        stat["z"] = {"z": z_s, "q_loc": q_loc,
                                     "q_logscale": q_logscale}
                    else:
                        stat["z"] = z_s
            else:  # generate mode: given latent (masked) or prior sample
                z_p = sample_gaussian(self.make_rng("sample"), p_loc, p_logscale)
                z_s = jnp.where(lat_mask > 0.5, latent, z_p)
                if abduct and self.cond_prior:
                    stat["z"] = {"p_loc": p_loc, "p_logscale": p_logscale}
        else:
            z_s = p_loc
        h = h + p_feat
        h = h + block.z_proj(_cat([z_s, _bcast_pa(pa, z_s)], self.dtype))
        h = block.conv(h)
        # q_correction mode never reads the z carry (p_input is h); cast it
        # to the carry's stable dtype so the scan carry stays type-uniform
        z_out = z_s.astype(z.dtype)
        if not self.q_correction:
            # z independent of pa for the next prior (vae.py:297-300); on the
            # model's final block this is dead compute the unrolled path
            # skips, but uniformity is what makes the run scannable
            z_out = block.z_feat_proj(_cat([z_s, p_feat], self.dtype))
        return (h, z_out), stat


class Decoder(nn.Module):
    """Top-down decoder (reference vae.py:195-319)."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        stages = plan_decoder_blocks(cfg)
        n = len(stages)
        rev_widths = tuple(reversed(cfg.model_widths))
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        nd = cfg.spatial_dims

        def make_block(i: int, name: Optional[str] = None) -> DecoderBlock:
            res, width = stages[i]
            return DecoderBlock(
                in_width=width,
                out_width=stages[min(n - 1, i + 1)][1],
                resolution=res,
                z_dim=cfg.z_dim,
                context_dim=cfg.context_dim,
                bottleneck_factor=cfg.bottleneck,
                stochastic=res <= cfg.z_max_res,
                cond_prior=cfg.cond_prior,
                q_correction=cfg.q_correction,
                version=cfg.block_version,
                n_blocks=n,
                dtype=dtype,
                remat=(cfg.remat and not cfg.stage_scan
                       and res >= cfg.remat_min_res),
                spatial_dims=nd,
                posterior_scale=cfg.posterior_init_scale,
                name=name,
            )

        if cfg.stage_scan:
            self._layout = tuple(plan_decoder_layout(cfg))
            mods = []
            for elem in self._layout:
                if elem[0] == "single":
                    mods.append(make_block(elem[1], name=f"blocks_{elem[1]}"))
                else:
                    start, length = elem[1], elem[2]
                    res, width = stages[start]
                    Cell = DecoderRunCell
                    if cfg.remat and res >= cfg.remat_min_res:
                        # t/abduct are static python values (indices count
                        # self as arg 0 under flax's remat wrapping)
                        Cell = nn.remat(Cell, static_argnums=(7, 8))
                    ScanRun = nn.scan(
                        Cell,
                        variable_axes={"params": 0},
                        split_rngs={"params": True, "sample": True},
                        in_axes=(0, 0, nn.broadcast, nn.broadcast,
                                 nn.broadcast, nn.broadcast, nn.broadcast),
                        length=length,
                    )
                    mods.append(ScanRun(
                        width=width,
                        resolution=res,
                        z_dim=cfg.z_dim,
                        context_dim=cfg.context_dim,
                        bottleneck_factor=cfg.bottleneck,
                        stochastic=res <= cfg.z_max_res,
                        cond_prior=cfg.cond_prior,
                        q_correction=cfg.q_correction,
                        version=cfg.block_version,
                        n_blocks=n,
                        dtype=dtype,
                        spatial_dims=nd,
                        posterior_scale=cfg.posterior_init_scale,
                        name=f"run_{start}",
                    ))
            self.elems = mods
        else:
            self._layout = tuple(("single", i) for i in range(n))
            self.blocks = [make_block(i) for i in range(n)]
        self._stages = tuple(stages)
        self._dtype = dtype  # compute dtype of the residual stream (None=f32)
        # per-resolution learned biases (reference vae.py:211-218)
        all_res = sorted(set(r for r, _ in stages))
        self._bias_res = tuple(r for i, r in enumerate(all_res) if r <= cfg.bias_max_res)
        self.bias = [
            self.param(f"bias_{r}", nn.initializers.zeros,
                       (1,) + (r,) * nd + (rev_widths[i],))
            for i, r in enumerate(all_res)
            if r <= cfg.bias_max_res
        ]

    def _bias_at(self, res: int) -> Optional[Array]:
        for r, b in zip(self._bias_res, self.bias):
            if r == res:
                # bias params are f32 masters; hand them out in the compute
                # dtype so `bias + upsample(h)` does not promote the whole
                # bf16 residual stream back to f32 (2x HBM traffic at 192^2)
                return b if self._dtype is None else b.astype(self._dtype)
        return None

    def _drop_cond(self) -> Tuple[Array, Array]:
        """Random conditioning-path dropout (reference vae.py:310-319)."""
        key = self.make_rng("sample")
        opt = jax.random.randint(key, (), 0, 3)
        p_sto = jnp.where(opt == 0, 0.0, 1.0)
        p_det = jnp.where(opt == 1, 0.0, 1.0)
        return p_sto, p_det

    def _single_step(
        self,
        block: DecoderBlock,
        i: int,
        h: Array,
        z: Array,
        pa: Array,
        pa_sto: Array,
        acts: Optional[Dict[int, Array]],
        latent: Optional[Array],
        t: Optional[float],
        abduct: bool,
        stats: List[Dict[str, Any]],
    ) -> Tuple[Array, Array]:
        """One unrolled decoder block (reference vae.py:241-300)."""
        cfg = self.cfg
        res = block.resolution

        if h.shape[1] < res:  # upsample previous layer output
            b = self._bias_at(res)
            up = upsample_nearest(h, res)
            h = up if b is None else b + up

        if block.q_correction:
            p_input = h
        else:  # prior depends on previous prior latent only
            if z.shape[1] < res:
                b = self._bias_at(res)
                up = upsample_nearest(z, res)
                p_input = up if b is None else b + up
            else:
                p_input = z
        p_loc, p_logscale, p_feat = block.forward_prior(p_input, pa_sto, t=t)

        if block.stochastic:
            if acts is not None:  # z_i ~ q(z_i | z_<i, x, pa)
                q_loc, q_logscale = block.forward_posterior(h, acts[res], pa, t=t)
                if cfg.use_pallas:
                    # fused sample+KL in one VMEM pass (in-kernel TPU
                    # PRNG: deterministic per-path, stream differs from
                    # jax.random — see ops/pallas_kernels.py)
                    from causal_gen_tpu.ops.pallas_kernels import (
                        default_interpret, fused_sample_kl,
                    )

                    seed = jax.random.randint(
                        self.make_rng("sample"), (), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                    )
                    z, kl = fused_sample_kl(
                        seed, q_loc, q_logscale, p_loc, p_logscale,
                        interpret=default_interpret(),
                    )
                else:
                    z = sample_gaussian(self.make_rng("sample"), q_loc, q_logscale)
                    kl = gaussian_kl(q_loc, q_logscale, p_loc, p_logscale)
                # spatial-sum at the source (see DecoderRunCell.__call__)
                kl = jnp.sum(kl, axis=tuple(range(1, 1 + cfg.spatial_dims)))
                stat: Dict[str, Any] = dict(kl=kl)
                if abduct:
                    if block.cond_prior:  # z* needs q stats (vae.py:271-276)
                        stat["z"] = {"z": z, "q_loc": q_loc, "q_logscale": q_logscale}
                    else:
                        stat["z"] = z
                stats.append(stat)
            else:
                if latent is not None:
                    z = latent
                else:
                    z = sample_gaussian(self.make_rng("sample"), p_loc, p_logscale)
                    if abduct and block.cond_prior:  # record p for abducting z*
                        stats.append(
                            dict(z={"p_loc": p_loc, "p_logscale": p_logscale})
                        )
        else:  # deterministic block
            z = p_loc

        h = h + p_feat
        h = h + block.z_proj(_cat([z, _bcast_pa(pa, z)], block.dtype))
        h = block.conv(h)

        if not block.q_correction and (i + 1) < len(self._stages):
            # z independent of pa for the next prior (vae.py:297-300)
            z = block.z_feat_proj(_cat([z, p_feat], block.dtype))
        return h, z

    def __call__(
        self,
        parents: Array,  # (B, context_dim)
        acts: Optional[Dict[int, Array]] = None,
        t: Optional[float] = None,
        abduct: bool = False,
        latents: Optional[Sequence[Optional[Array]]] = None,
        train: bool = False,
    ) -> Tuple[Array, List[Dict[str, Any]]]:
        cfg = self.cfg
        bs = parents.shape[0]
        n = len(self._stages)
        h = z = jnp.tile(self._bias_at(1), (bs,) + (1,) * (cfg.spatial_dims + 1))
        if train and cfg.cond_prior:
            p_sto, p_det = self._drop_cond()
        else:
            p_sto, p_det = 1.0, 1.0

        if latents is None:
            latents = [None] * n
        else:
            latents = list(latents) + [None] * (n - len(latents))

        pa = parents  # (B, ctx); spatially constant so no per-res slicing
        if cfg.cond_drop_from is not None:
            d = cfg.cond_drop_from
            pa_sto = pa.at[:, d:].multiply(p_sto)
            pa_det = pa.at[:, d:].multiply(p_det)
        else:
            pa_sto = pa_det = pa
        del pa_det  # parity note: reference computes but never uses pa_det
        # in the HVAE path (vae.py:245-249); posterior uses raw pa.

        mods = self.elems if cfg.stage_scan else self.blocks
        stats: List[Dict[str, Any]] = []
        for elem, mod in zip(self._layout, mods):
            if elem[0] == "single":
                i = elem[1]
                h, z = self._single_step(
                    mod, i, h, z, pa, pa_sto, acts, latents[i], t, abduct, stats
                )
                continue
            # scanned run: shape-uniform blocks, no res/width boundary inside
            start, length = elem[1], elem[2]
            res, width = self._stages[start]
            run_lats = latents[start: start + length]
            if acts is not None or all(lat is None for lat in run_lats):
                # latents unused (posterior mode) or absent: dummy xs only
                lat_stack = jnp.zeros(
                    (length, 1) + (1,) * (cfg.spatial_dims + 1), jnp.float32
                )
                lat_mask = jnp.zeros((length,), jnp.float32)
            else:
                lat_stack = jnp.stack([
                    lat if lat is not None
                    else jnp.zeros(
                        (bs,) + (res,) * cfg.spatial_dims + (cfg.z_dim,),
                        jnp.float32,
                    )
                    for lat in run_lats
                ])
                lat_mask = jnp.asarray(
                    [0.0 if lat is None else 1.0 for lat in run_lats],
                    jnp.float32,
                )
            act = None if acts is None else acts[res]
            (h, z), ys = mod(
                (h, z), lat_stack, lat_mask, pa_sto, pa, act, t, abduct
            )
            if ys:
                stats.extend(
                    jax.tree.map(lambda v: v[j], ys) for j in range(length)
                )
        return h, stats


def migrate_decoder_params(cfg: Config, params: Dict[str, Any]) -> Dict[str, Any]:
    """Restack an unrolled-decoder checkpoint for ``stage_scan=True``.

    The scan layout stores each run's per-block params stacked on a leading
    axis under ``decoder/run_<start>/block``; boundary blocks keep their
    original ``decoder/blocks_<i>`` names. The inverse direction (scan ->
    unrolled) is ``unstack``ing the same trees; old checkpoints
    (checkpoints/final_*) load unchanged because stage_scan defaults off.
    """
    layout = plan_decoder_layout(cfg)
    dec = dict(params["decoder"])
    for elem in layout:
        if elem[0] != "run":
            continue
        start, length = elem[1], elem[2]
        members = [dec.pop(f"blocks_{start + j}") for j in range(length)]
        dec[f"run_{start}"] = {
            "block": jax.tree.map(lambda *xs: jnp.stack(xs), *members)
        }
    out = dict(params)
    out["decoder"] = dec
    return out


class HVAE(nn.Module):
    """Conditional hierarchical VAE (reference vae.py:425-523)."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(
            stages=cfg.enc_stages,
            widths=cfg.model_widths,
            bottleneck=cfg.bottleneck,
            input_channels=cfg.input_channels,
            version=cfg.block_version,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else None,
            remat=cfg.remat,
            remat_min_res=cfg.remat_min_res,
            spatial_dims=cfg.spatial_dims,
        )
        self.decoder = Decoder(cfg=cfg)
        self.likelihood = make_likelihood(
            cfg.input_channels, cfg.model_widths[0], cfg.x_like, cfg.std_init,
            use_pallas=cfg.use_pallas, spatial_dims=cfg.spatial_dims,
        )
        self.cond_prior = cfg.cond_prior
        self.free_bits = cfg.kl_free_bits

    def __call__(
        self, x: Array, parents: Array, beta: float = 1.0, train: bool = True
    ) -> Dict[str, Array]:
        acts = self.encoder(x)
        h, stats = self.decoder(parents=parents, acts=acts, train=train)
        nll_pp = self.likelihood.nll(h.astype(jnp.float32), x)
        # per-block KL arrives spatially pre-summed as (B, z_dim) — reduced at
        # the sampling site so scan runs never stack full-res KL maps
        if self.free_bits > 0:
            kl_pp = 0.0
            for stat in stats:
                kl_pp += jnp.sum(
                    jnp.maximum(self.free_bits, jnp.mean(stat["kl"], axis=0))
                )
        else:
            kl_pp = jnp.zeros_like(nll_pp)
            for stat in stats:
                kl_pp += jnp.sum(stat["kl"], axis=1)
        kl_pp = kl_pp / math.prod(x.shape[1:])  # per pixel
        kl_pp = jnp.mean(kl_pp)
        nll_pp = jnp.mean(nll_pp)
        nelbo = nll_pp + beta * kl_pp
        return dict(elbo=nelbo, nll=nll_pp, kl=kl_pp)

    def sample(
        self, parents: Array, return_loc: bool = True, t: Optional[float] = None
    ) -> Tuple[Array, Array]:
        h, _ = self.decoder(parents=parents, t=t)
        return self.likelihood.sample(h, return_loc, t=t)

    def abduct(
        self,
        x: Array,
        parents: Array,
        cf_parents: Optional[Array] = None,
        alpha: float = 0.5,
        t: Optional[float] = None,
    ) -> List[Any]:
        """Infer latents z ~ q(z|x,pa); with cond_prior + cf_parents, return
        mixture-abducted z* (reference vae.py:466-516)."""
        acts = self.encoder(x)
        _, q_stats = self.decoder(parents=parents, acts=acts, abduct=True, t=t)
        q_stats = [s["z"] for s in q_stats]

        if self.cond_prior and cf_parents is not None:
            _, p_stats = self.decoder(parents=cf_parents, abduct=True, t=t)
            p_stats = [s["z"] for s in p_stats]
            cf_zs = []
            for q, p in zip(q_stats, p_stats):
                q_loc, q_scale = q["q_loc"], jnp.exp(q["q_logscale"])
                u = (q["z"] - q_loc) / q_scale  # exogenous noise u ~ N(0, I)
                p_loc, p_var = p["p_loc"], jnp.exp(p["p_logscale"]) ** 2
                # mixture r(z) = a*q + (1-a)*p, independence assumption
                # (vae.py:495-500; note a^2 weights, unlike simple_vae)
                r_loc = alpha * q_loc + (1 - alpha) * p_loc
                r_var = alpha**2 * q_scale**2 + (1 - alpha) ** 2 * p_var
                r_scale = jnp.sqrt(r_var)
                if t is not None:
                    r_scale = r_scale * t
                cf_zs.append(r_loc + r_scale * u)
            return cf_zs
        return q_stats

    def forward_latents(
        self,
        latents: Sequence[Optional[Array]],
        parents: Array,
        t: Optional[float] = None,
    ) -> Tuple[Array, Array]:
        h, _ = self.decoder(latents=latents, parents=parents, t=t)
        return self.likelihood.sample(h, t=t)
