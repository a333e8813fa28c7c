"""Differentiable morphometry surrogate tests (ops/soft_morph.py).

The surrogate must track the *measured* tools (eval/morphometrics.py) —
monotone in stroke width, well-calibrated after the affine fit, and
differentiable (nonzero pixel gradients) so it can act as a training signal
in the CF Lagrangian.
"""

import jax
import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.ops.soft_morph import (
    calibrate_soft_thickness,
    fit_calibration,
    soft_intensity,
    soft_thickness,
    soft_thickness_raw,
)


def bar(width: int, value: float = 1.0, res: int = 32) -> np.ndarray:
    img = np.zeros((res, res), np.float32)
    img[res // 2 - width // 2: res // 2 - width // 2 + width, 4: res - 4] = value
    return img


class TestSoftThickness:
    def test_monotone_in_stroke_width(self):
        x = jnp.asarray(np.stack([bar(w) for w in (1, 2, 3, 4, 5)]))
        raw = np.asarray(soft_thickness_raw(x))
        assert np.all(np.diff(raw) > 0), raw

    def test_calibration_tracks_measured_on_bars(self):
        from causal_gen_tpu.eval.morphometrics import measure_thickness

        x = np.stack([bar(w) for w in (1, 2, 3, 4, 5)])
        raw = np.asarray(soft_thickness_raw(jnp.asarray(x)))
        measured = measure_thickness(x * 255.0)
        a, b = fit_calibration(raw, measured)
        est = np.asarray(soft_thickness(jnp.asarray(x), calib=(a, b)))
        assert np.abs(est - measured).mean() < 0.25, (est, measured)

    def test_calibrate_helper_small_fit_error(self):
        rng = np.random.default_rng(0)
        # random-width bars with noise-free interiors
        x = np.stack([bar(int(w)) for w in rng.integers(1, 6, 16)])
        (a, b), fit_mae = calibrate_soft_thickness(x)
        assert fit_mae < 0.3, fit_mae

    def test_gradient_flows(self):
        x = jnp.asarray(np.stack([bar(3)]))
        g = jax.grad(lambda v: soft_thickness_raw(v).sum())(x)
        assert float(jnp.abs(g).sum()) > 0.0

    def test_invariant_to_background_size(self):
        # same stroke in a larger canvas: raw estimate must barely move
        a = soft_thickness_raw(jnp.asarray(np.stack([bar(3, res=32)])))
        b = soft_thickness_raw(jnp.asarray(np.stack([bar(3, res=48)])))
        assert abs(float(a[0]) - float(b[0])) < 0.3, (a, b)


class TestSoftIntensity:
    def test_tracks_foreground_brightness(self):
        x = np.stack([bar(3, value=v) for v in (0.4, 0.7, 1.0)]) * 255.0
        est = np.asarray(soft_intensity(jnp.asarray(x)))
        assert np.all(np.diff(est) > 20), est
        assert abs(est[-1] - 255.0) < 30, est
