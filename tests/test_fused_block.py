"""Fused light-block Pallas kernel: exactness vs the XLA body.

The kernel (ops/fused_block.py) is the VMEM cross-conv fusion probe
(RESULTS.md 'space-to-depth pay-or-retire' follow-up): one pallas_call
computing y = x + conv2(relu(conv1(relu(x)))) with rolling-DMA rows.
Interpret mode on CPU checks every boundary case the rolling window has:
top row (virtual zero x(-1)/mid(-1)), bottom rows (virtual zero rows below
the image), and the W zero-pad columns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causal_gen_tpu.ops.fused_block import (
    flat_to_nhwc,
    fused_light_block,
    nhwc_to_flat,
    pack_weights,
)


def _plain_body(x, w1, w2):
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    conv = lambda v, w: jax.lax.conv_general_dilated(
        v, w, (1, 1), "SAME", dimension_numbers=dn)
    return x + conv(jax.nn.relu(conv(jax.nn.relu(x), w1)), w2)


@pytest.mark.parametrize("shape", [
    (4, 8, 8, 6, 3, 4),    # B,H,W,C,CB,WC
    (2, 5, 12, 8, 2, 4),   # odd H exercises the bottom-boundary zero rows
    (3, 16, 8, 4, 4, 8),   # CB == WC == full-W chunk
])
def test_fused_matches_plain(shape):
    B, H, W, C, CB, WC = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, CB)) / np.sqrt(9 * C),
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, CB, C)) / np.sqrt(9 * CB),
                     jnp.float32)
    ref = _plain_body(x, w1, w2)
    t1, t2 = pack_weights(w1, w2)
    y = flat_to_nhwc(
        fused_light_block(nhwc_to_flat(x), t1, t2, B=B, WC=WC,
                          interpret=True), B)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_layout_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 6)), jnp.float32)
    assert jnp.array_equal(flat_to_nhwc(nhwc_to_flat(x), 4), x)
