"""Training-time visualization grids.

Port target: reference src/utils.py:231-419 (write_images): reconstructions
from abducted latents, unconditional samples at 10 temperatures, and
per-sample single-attribute pseudo-counterfactual rows with dataset-specific
intervention formatting (ukbb: invert mri_seq/sex + random volumes;
morphomnist: random thickness/intensity + all 10 digits; cmnist: digit+colour
eyes), tiled into one PNG.

TPU-native notes: all decoder passes are batched jitted applies on device;
only the final uint8 grid crosses to the host. The cond_prior direct/
indirect/total-effect rows (utils.py:242-286) are produced when the model has
a conditional prior.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.config import Config

TEMPS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]


def _postprocess(x: jnp.ndarray) -> np.ndarray:
    """[-1,1] NHWC -> uint8 [0,255] on host. 3-D volumes (NDHWC) are
    rendered as their middle-depth slice."""
    arr = np.asarray(x)
    if arr.ndim == 5:
        arr = arr[:, arr.shape[1] // 2]
    return ((arr + 1.0) * 127.5).astype(np.uint8)


def make_cf_parents(cfg: Config, pa: np.ndarray, shuffled_pa: np.ndarray) -> np.ndarray:
    """Per-attribute intervention rows for one sample
    (reference utils.py:339-371). pa: (ctx,), shuffled_pa: (ctx,) from a
    random other sample. Returns (context_dim, ctx)."""
    d = cfg.context_dim
    cf_pa = np.tile(pa[None], (d, 1)).astype(np.float32)
    if "ukbb" in cfg.name:
        cf_pa[0, 0] = 1 - cf_pa[0, 0]  # invert mri_seq
        cf_pa[1, 1] = shuffled_pa[1]  # random brain volume
        cf_pa[2, 2] = shuffled_pa[2]  # random ventricle volume
        if d == 4:
            cf_pa[3, 3] = 1 - cf_pa[3, 3]  # invert sex
    elif "morphomnist" in cfg.name:
        assert d == 12
        cf_pa[0, 0] = shuffled_pa[0]  # random thickness
        cf_pa[1, 1] = shuffled_pa[1]  # random intensity
        cf_pa[2:, 2:] = np.eye(10)  # each digit
    elif "cmnist" in cfg.name:
        assert d == 20
        cf_pa[:10, :10] = np.eye(10)  # each digit
        cf_pa[10:, 10:] = np.eye(10)  # each colour
    elif "vol3d" in cfg.name:
        cf_pa[0, 0] = shuffled_pa[0]  # random radius
        cf_pa[1, 1] = shuffled_pa[1]  # random intensity
    else:
        raise NotImplementedError(cfg.name)
    return cf_pa


# Jitted viz programs, cached per model instance. The previous eager path
# issued hundreds of unjitted applies per grid (one per sample per row);
# through a tunneled backend at ~0.3s/dispatch one grid cost ~19 minutes.
# The cache holds (model, jitted_fn) so the model reference pins the id.
_JIT_CACHE: Dict[tuple, tuple] = {}


def _jitted(model, tag: str, make_fn):
    key = (id(model), tag)
    hit = _JIT_CACHE.get(key)
    if hit is None or hit[0] is not model:
        _JIT_CACHE[key] = (model, jax.jit(make_fn(model)))
    return _JIT_CACHE[(id(model), tag)][1]


def _tile_latents(zs, reps: int):
    """Repeat each latent row ``reps`` times (sample-major order)."""
    return [
        jax.tree.map(lambda v: jnp.repeat(v, reps, axis=0), z) for z in zs
    ]


def write_images(
    cfg: Config,
    model,
    params,
    batch: Dict[str, np.ndarray],
    save_path: str,
    rng: Optional[jax.Array] = None,
    alpha: float = 0.6,
    t: float = 0.5,
    n_latents_viz: int = 0,
) -> np.ndarray:
    """Build + save the viz grid; returns the uint8 image array.

    ``n_latents_viz`` > 0 adds the reference's partial-abduction sweep
    (utils.py:293-305, 394-398): reconstructions and counterfactual panels
    computed from only the first ``l`` abducted latents at each of the
    ``l_points`` cut levels (remaining latents drawn from the prior), showing
    the information content of each level of the hierarchy. 0 keeps the
    reference default (full abduction only)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.asarray(batch["x"], jnp.float32)
    if x.dtype == jnp.float32 and float(jnp.max(jnp.abs(x))) > 1.5:
        x = (x - 127.5) / 127.5
    pa = jnp.asarray(batch["pa"], jnp.float32)
    bs, c = x.shape[0], x.shape[-1]
    h, w = x.shape[-3], x.shape[-2]  # display dims (3-D: mid-depth slice)

    abduct = _jitted(model, "abduct", lambda m: lambda p, k, x_, pa_: m.apply(
        {"params": p}, x_, pa_, method=m.abduct, rngs={"sample": k}))
    fwd = _jitted(model, "fwd", lambda m: lambda p, k, zs, pa_, t_: m.apply(
        {"params": p}, zs, pa_, t=t_, method=m.forward_latents,
        rngs={"sample": k}))
    smp = _jitted(model, "sample", lambda m: lambda p, k, pa_, t_: m.apply(
        {"params": p}, pa_, True, t=t_, method=m.sample, rngs={"sample": k}))

    def fwd_tiled(zs, pa_flat, key):
        """forward_latents with each latent row tiled to match pa_flat."""
        reps = pa_flat.shape[0] // zs[0].shape[0] if zs else 1
        return fwd(params, key, _tile_latents(zs, reps), pa_flat, t)

    orig = _postprocess(x)
    rows: List[np.ndarray] = [orig]

    # reconstructions from the first l abducted latents at each cut level
    # (utils.py:289-305); n_latents_viz=0 -> l_points=[len(zs)] (full recon)
    zs = abduct(params, rng, x, pa)
    z_plain = [z["z"] if isinstance(z, dict) else z for z in zs]
    l_points = np.floor(
        np.linspace(0, 1, n_latents_viz + 2) * len(zs)
    ).astype(int)[1:]
    for l in l_points:
        x_rec, _ = fwd(params, rng, z_plain[: int(l)], pa, 0.1)
        rows.append(_postprocess(x_rec))
    rows.append(np.zeros_like(orig))

    # unconditional samples at 10 temperatures (utils.py:307-311); t is a
    # traced arg, so all ten reuse one compiled program
    for i, temp in enumerate(TEMPS):
        xs, _ = smp(params, jax.random.fold_in(rng, i), pa, temp)
        rows.append(_postprocess(xs))
    rows.append(np.zeros_like(orig))

    # pseudo counterfactual panel: for each sample, intervene on each
    # attribute with the same abducted z (utils.py:313-404). All samples'
    # intervention rows are batched into single (bs*d) device programs.
    host_rng = np.random.RandomState(1)
    idx = np.arange(bs)
    host_rng.shuffle(idx)
    pa_np = np.asarray(pa)
    d = cfg.context_dim
    pad = np.zeros((max(0, bs - d), h, w, c), np.uint8)

    def _row(img: np.ndarray) -> np.ndarray:
        return np.concatenate([img[:bs], pad], axis=0) if d < bs else img[:bs]

    cf_pa_all = np.stack(
        [make_cf_parents(cfg, pa_np[ii], pa_np[idx[ii]]) for ii in range(bs)]
    )  # (bs, d, ctx)
    cf_pa_flat = jnp.asarray(cf_pa_all.reshape(bs * d, -1))
    pa_rep_flat = jnp.asarray(np.repeat(pa_np, d, axis=0))

    def _grid(loc) -> np.ndarray:
        return _postprocess(loc).reshape(bs, d, h, w, c)

    for l in l_points:
        zl = z_plain[: int(l)]
        rec = _grid(fwd_tiled(zl, pa_rep_flat, rng)[0]).astype(np.int16)
        # direct-effect cf: x* = g(pa*, z)
        de = _grid(fwd_tiled(zl, cf_pa_flat, rng)[0])
        effects = []
        # cfg drives the branch: setup-time module attrs (model.cond_prior)
        # are not visible on the unbound linen module
        if cfg.cond_prior:
            abduct_cf = _jitted(
                model, "abduct_cf",
                lambda m: lambda p, k, x_, pa_, cfpa_, a_, t_: m.apply(
                    {"params": p}, jnp.repeat(x_, pa_.shape[0] // x_.shape[0],
                                              axis=0),
                    pa_, cf_parents=cfpa_, alpha=a_, t=t_,
                    method=m.abduct, rngs={"sample": k}))
            # cf_z stays full-length (the reference truncates only the
            # direct-effect z at l, utils.py:274 vs 395-398); indirect
            # effect x* = g(pa, z*) then total x* = g(pa*, z*)
            # (utils.py:274-286), each with its diff-vs-recon row
            cf_z = abduct_cf(params, rng, x, pa_rep_flat, cf_pa_flat, alpha, t)
            for pa_fwd in (pa_rep_flat, cf_pa_flat):
                eff_loc, _ = fwd(params, rng, cf_z, pa_fwd, t)
                effects.append(_grid(eff_loc))
        for ii in range(bs):
            rows.append(_row(de[ii]))
            rows.append(_row((de[ii].astype(np.int16) - rec[ii]).astype(np.uint8)))
            for eff in effects:
                rows.append(_row(eff[ii]))
                rows.append(
                    _row((eff[ii].astype(np.int16) - rec[ii]).astype(np.uint8))
                )
        rows.append(np.zeros_like(orig))

    # tile rows into one image (utils.py:405-419)
    rows = [r if r.shape[0] == bs else np.concatenate(
        [r, np.zeros((bs - r.shape[0], h, w, c), np.uint8)], axis=0
    ) for r in rows]
    n_rows = len(rows)
    im = (
        np.concatenate(rows, axis=0)
        .reshape((n_rows, bs, h, w, c))
        .transpose([0, 2, 1, 3, 4])
        .reshape([n_rows * h, bs * w, c])
    )
    if save_path:
        from PIL import Image

        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        arr = im[..., 0] if c == 1 else im
        Image.fromarray(arr).save(save_path)
    return im
