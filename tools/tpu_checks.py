#!/usr/bin/env python
"""Real-TPU validation of the Pallas kernels (run manually on a chip).

Interpreter mode zeroes pltpu.prng_random_bits, so the in-kernel RNG's
distributional statistics can only be asserted here. Also compares the
compiled kernels' outputs against the pure-jnp ops.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from causal_gen_tpu.ops.distributions import gaussian_kl
    from causal_gen_tpu.ops.dmol import discretized_mix_logistic_loss
    from causal_gen_tpu.ops.pallas_kernels import dmol_loss_pallas, fused_sample_kl

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    shape = (256, 8, 8, 16)
    q_loc = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    q_logscale = jnp.asarray(rng.normal(0, 0.3, shape), jnp.float32)
    p_loc = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    p_logscale = jnp.asarray(rng.normal(0, 0.3, shape), jnp.float32)
    z, kl = fused_sample_kl(jnp.int32(7), q_loc, q_logscale, p_loc, p_logscale)
    ref_kl = gaussian_kl(q_loc, q_logscale, p_loc, p_logscale)
    kl_err = float(jnp.abs(kl - ref_kl).max())
    eps = (np.asarray(z) - np.asarray(q_loc)) / np.exp(np.asarray(q_logscale))
    print(f"sample_kl: kl_err={kl_err:.2e} eps_mean={eps.mean():+.4f} "
          f"eps_std={eps.std():.4f} eps_skew={np.mean(eps**3):+.4f}", flush=True)
    assert kl_err < 1e-5
    assert abs(eps.mean()) < 0.01 and abs(eps.std() - 1.0) < 0.01

    x = jnp.asarray(
        np.round(rng.uniform(-1, 1, (8, 16, 16, 3)) * 127.5) / 127.5, jnp.float32
    )
    l = jnp.asarray(rng.normal(0, 1, (8, 16, 16, 100)), jnp.float32)
    got = dmol_loss_pallas(x, l)
    want = discretized_mix_logistic_loss(x, l)
    err = float(jnp.abs(got - want).max())
    print(f"dmol: max_err={err:.2e}", flush=True)
    assert err < 1e-4

    # DMoL sampler: same mixture params at every pixel -> compare sample
    # statistics against the jnp sampler over many pixels
    from causal_gen_tpu.ops.dmol import sample_from_discretized_mix_logistic
    from causal_gen_tpu.ops.pallas_kernels import dmol_sample_pallas

    l_one = rng.normal(0, 1, (100,)).astype(np.float32)
    l_rep = jnp.asarray(np.tile(l_one, (4, 64, 64, 1)))
    xs_p, sc_p = dmol_sample_pallas(jnp.int32(3), l_rep, 10, t=0.9)
    xs_j, sc_j = sample_from_discretized_mix_logistic(
        jax.random.PRNGKey(3), l_rep, 10, t=0.9
    )
    mp, mj = np.asarray(xs_p).mean(axis=(0, 1, 2)), np.asarray(xs_j).mean(axis=(0, 1, 2))
    sp_, sj = np.asarray(xs_p).std(axis=(0, 1, 2)), np.asarray(xs_j).std(axis=(0, 1, 2))
    print(f"dmol_sample: mean pallas={mp} jnp={mj}", flush=True)
    print(f"dmol_sample: std  pallas={sp_} jnp={sj}", flush=True)
    assert np.allclose(mp, mj, atol=0.02), (mp, mj)
    assert np.allclose(sp_, sj, atol=0.02), (sp_, sj)
    assert (np.asarray(sc_p) > 0).all()
    # determinism per seed
    xs_p2, _ = dmol_sample_pallas(jnp.int32(3), l_rep, 10, t=0.9)
    assert np.array_equal(np.asarray(xs_p), np.asarray(xs_p2))
    print("TPU CHECKS OK", flush=True)


if __name__ == "__main__":
    main()
