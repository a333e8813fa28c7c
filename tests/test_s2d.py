"""Space-to-depth conv reparameterization (ops/s2d.py): exactness tests.

The reparameterization was measured on the v5e and RETIRED from the model
path (stage-packed light blocks lose 2-2.5x because the plain blocks already
run at the HBM traffic floor — see tools/s2d_probe.py and RESULTS.md
"space-to-depth pay-or-retire"). These tests pin the mathematical claims the
probe relies on: packing is a permutation, and the packed conv equals the
plain conv exactly (up to f32 reassociation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.ops.s2d import (
    pack_kernel_1x1,
    pack_kernel_3x3,
    pack_space_to_depth,
    s2d_conv,
    unpack_depth_to_space,
)


def _conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        assert jnp.array_equal(unpack_depth_to_space(pack_space_to_depth(x)), x)

    def test_pack_is_phase_major(self):
        # packed channel index must be (phase*C + c), phase = 2*(y%2) + (x%2)
        x = jnp.zeros((1, 4, 4, 2)).at[0, 1, 0, 1].set(7.0)  # y=1,x=0 -> phase 2
        p = pack_space_to_depth(x)
        assert p.shape == (1, 2, 2, 8)
        assert float(p[0, 0, 0, 2 * 2 + 1]) == 7.0
        assert float(jnp.sum(jnp.abs(p))) == 7.0

    def test_kernel_fill_fraction(self):
        # each original tap fills exactly one packed slot: 36/144 = 1/4
        w = jnp.ones((3, 3, 5, 4))
        wp = pack_kernel_3x3(w)
        assert wp.shape == (3, 3, 20, 16)
        assert float(jnp.sum(wp)) == float(jnp.sum(w)) * 4  # 4 output phases
        assert float(jnp.mean(wp != 0)) == pytest.approx(0.25)


class TestConvEquivalence:
    @pytest.mark.parametrize("ci,co,h", [(3, 5, 8), (8, 32, 12), (32, 8, 6)])
    def test_conv3x3_exact(self, ci, co, h):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, h, h, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
        y0 = _conv(x, w)
        y1 = s2d_conv(x, w)
        np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)

    def test_conv1x1_exact_and_bias(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, 1, 6, 10)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((10,)), jnp.float32)
        y0 = _conv(x, w) + b
        y1 = s2d_conv(x, w, bias=b)
        np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)

    def test_padding_edges_exact(self):
        # SAME zero-padding must agree exactly at the borders (the packed
        # kernel's qy=-1 slots reach packed row -1 phase 1, never row -2)
        x = jnp.ones((1, 6, 6, 2))
        w = jnp.ones((3, 3, 2, 3))
        np.testing.assert_allclose(_conv(x, w), s2d_conv(x, w), rtol=1e-6)

    def test_gradients_exact(self):
        # the compact kernel is the parameter; grads must match the plain conv
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
        g0 = jax.grad(lambda w: jnp.sum(_conv(x, w) ** 2))(w)
        g1 = jax.grad(lambda w: jnp.sum(s2d_conv(x, w) ** 2))(w)
        np.testing.assert_allclose(g0, g1, rtol=1e-4, atol=1e-4)

    def test_packed_in_out_layouts(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)), jnp.float32)
        p = pack_space_to_depth(x)
        y = s2d_conv(p, w, packed_in=True, packed_out=True)
        np.testing.assert_allclose(
            unpack_depth_to_space(y), _conv(x, w), rtol=1e-5, atol=1e-5
        )
