#!/usr/bin/env python
"""Volumetric counterfactual demo: do(radius) sweeps on the 3-D HVAE.

The 3-D analog of the Morpho-MNIST do(thickness) panels (no reference
counterpart — the reference is 2-D only). Loads the trained vol3d32
mechanism, abducts latents z ~ q(z | x, pa) from held-out volumes, then
decodes under counterfactual parents. Interventions are SCM-consistent:
do(radius) propagates to intensity through the dataset's known mechanism
intensity = 255 - 300*(radius - 0.15) (data/datasets.py::make_vol3d), the
volumetric analog of thickness -> intensity.

Renders, per example volume: [observation | reconstruction | cf at each
swept radius], as axial mid-slices (top block) and sagittal mid-slices
(bottom block) so the 3-D consistency of the edit is visible.

Usage:
  python examples/vol3d_demo.py --vae_path checkpoints/vol3d/checkpoint \
      --out vol3d_cf.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from causal_gen_tpu.data.datasets import VOL3D_MIN_MAX, make_vol3d
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.train.checkpoint import load_checkpoint
    from causal_gen_tpu.train.vae_trainer import preprocess_x
    from causal_gen_tpu.utils.normalization import normalize

    p = argparse.ArgumentParser()
    p.add_argument("--vae_path", required=True)
    p.add_argument("--n", type=int, default=4, help="example volumes")
    p.add_argument("--radii", nargs="+", type=float,
                   default=[0.18, 0.24, 0.30, 0.36])
    p.add_argument("--t", type=float, default=0.1, help="abduction temp")
    p.add_argument("--seed", type=int, default=17)
    p.add_argument("--out", default="vol3d_cf.png")
    args = p.parse_args()

    cfg, state, _ = load_checkpoint(args.vae_path)
    model = HVAE(cfg=cfg)
    params = state.ema_params

    # held-out volumes (valid-split seed per data/datasets.py::vol3d)
    vols, raw = make_vol3d(args.n, cfg.input_res, seed=cfg.seed + 1)
    pa_cols = []
    for k in cfg.parents_x:
        lo, hi = VOL3D_MIN_MAX[k]
        pa_cols.append(normalize(raw[k], x_min=lo, x_max=hi))
    pa = jnp.asarray(np.stack(pa_cols, axis=1), jnp.float32)
    x = preprocess_x(jnp.asarray(vols))

    rng = jax.random.PRNGKey(args.seed)
    zs = jax.jit(
        lambda p_, x_, pa_: model.apply(
            {"params": p_}, x_, pa_, t=args.t, method=model.abduct,
            rngs={"sample": rng},
        )
    )(params, x, pa)

    fwd = jax.jit(
        lambda p_, zs_, pa_: model.apply(
            {"params": p_}, zs_, pa_, t=args.t,
            method=model.forward_latents, rngs={"sample": rng},
        )[0]
    )

    def to_u8(v):  # [-1,1] -> uint8
        return np.asarray(
            jnp.clip((v + 1.0) * 127.5, 0, 255)).astype(np.uint8)

    recon = to_u8(fwd(params, zs, pa))
    panels = [to_u8(x), recon]
    r_lo, r_hi = VOL3D_MIN_MAX["radius"]
    i_lo, i_hi = VOL3D_MIN_MAX["intensity"]
    for r in args.radii:
        # SCM-consistent intervention: intensity responds to do(radius)
        inten = float(np.clip(255.0 - 300.0 * (r - r_lo), i_lo, i_hi))
        cf_pa = jnp.stack([
            jnp.full((args.n,), normalize(np.float32(r), r_lo, r_hi)),
            jnp.full((args.n,), normalize(np.float32(inten), i_lo, i_hi)),
        ], axis=1)
        panels.append(to_u8(fwd(params, zs, cf_pa)))

    res = cfg.input_res
    mid = res // 2
    blocks = []
    for sl in (lambda v: v[:, mid, :, :, 0],      # axial mid-slice
               lambda v: v[:, :, :, mid, 0]):     # sagittal mid-slice
        # rows = examples, cols = [obs, recon, cf...]
        rows = [np.concatenate([sl(p_)[i] for p_ in panels], axis=1)
                for i in range(args.n)]
        blocks.append(np.concatenate(rows, axis=0))
    im = np.concatenate(
        [blocks[0], np.full((8, blocks[0].shape[1]), 64, np.uint8), blocks[1]],
        axis=0,
    )

    from PIL import Image

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray(im).save(args.out)
    print(f"wrote {args.out}  (cols: obs | recon | do(radius)="
          f"{args.radii}; top=axial, bottom=sagittal)")


if __name__ == "__main__":
    main()
