"""Eval harness, morphometrics, viz, and semi-supervised training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.config import get_config


class TestMorphometrics:
    def test_intensity_median_of_bright_pixels(self):
        from causal_gen_tpu.eval.morphometrics import get_intensity

        x = np.zeros((2, 28, 28))
        x[0, 10:18, 10:18] = 200.0
        x[1, 5:10, 5:20] = 120.0
        out = get_intensity(x)
        assert np.allclose(out, [200.0, 120.0])

    def test_thickness_of_bars(self):
        from causal_gen_tpu.eval.morphometrics import measure_thickness

        imgs = []
        for k in (3, 5):
            img = np.zeros((28, 28))
            img[14 - k // 2 : 14 - k // 2 + k, 4:24] = 255.0
            imgs.append(img)
        t = measure_thickness(np.stack(imgs))
        # EDT-based thickness of a k-pixel bar is ~k (within a pixel)
        assert abs(t[0] - 3) < 1.2, t
        assert abs(t[1] - 5) < 1.2, t
        assert t[1] > t[0]

    def test_thickness_on_real_mnist(self):
        import os

        root = "/root/reference/datasets/morphomnist"
        if not os.path.exists(os.path.join(root, "t10k-images-idx3-ubyte.gz")):
            pytest.skip("no data")
        import pandas as pd

        from causal_gen_tpu.data.idx import load_idx
        from causal_gen_tpu.eval.morphometrics import (
            get_intensity,
            measure_thickness,
        )

        images = load_idx(os.path.join(root, "t10k-images-idx3-ubyte.gz"))[:32]
        df = pd.read_csv(os.path.join(root, "t10k-morpho.csv")).iloc[:32]
        t = measure_thickness(images.astype(np.float64))
        i = get_intensity(images.astype(np.float64))
        # measured morphometrics should correlate strongly with the CSV's
        t_err = np.abs(t - df["thickness"].to_numpy())
        i_err = np.abs(i - df["intensity"].to_numpy())
        assert np.median(t_err) < 0.5, (np.median(t_err), t[:5], df["thickness"].values[:5])
        assert np.median(i_err) < 15.0, np.median(i_err)


class TestSoftmaxCentered:
    def test_roundtrip(self):
        from causal_gen_tpu.pgm.transforms import SoftmaxCentered

        t = SoftmaxCentered()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
        y, ld = t.forward(x)
        assert y.shape == (8, 3)
        assert np.allclose(np.asarray(y).sum(-1), 1.0, atol=1e-6)
        x2, ld_inv = t.inverse(y)
        assert np.allclose(x, x2, atol=1e-4)
        assert np.allclose(ld, -ld_inv, atol=1e-4)


class TestSemiSup:
    def test_semi_sup_step_runs(self):
        from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
        from causal_gen_tpu.pgm.train_pgm import (
            PGMConfig,
            PGMTrainState,
            make_pgm_optimizer,
            make_semi_sup_train_step,
            preprocess_pgm_batch,
            split_labelled_unlabelled,
        )
        from tests.test_dscm import synth_morpho_dataset

        cfg = PGMConfig(dataset="morphomnist", setup="semi_sup", bs=16,
                        lr=1e-3, input_res=32, alpha=1e-3)
        ds = synth_morpho_dataset(n=64)
        ds_l, ds_u = split_labelled_unlabelled(ds, sup_frac=0.5)
        assert len(ds_l) == 32 and len(ds_u) == 32
        model = MorphoMNISTPGM(setup_predictors=True, input_res=32)
        from causal_gen_tpu.data.loader import Loader

        loader_l = Loader(ds_l, 16, seed=0, concat_pa=False)
        loader_u = Loader(ds_u, 16, seed=1, concat_pa=False)
        batch_l = preprocess_pgm_batch(cfg, next(iter(loader_l)))
        batch_u = preprocess_pgm_batch(cfg, next(iter(loader_u)))
        rng = jax.random.PRNGKey(0)
        obs = {k: v for k, v in batch_l.items() if k in model.dag_variables}
        params = model.init(
            {"params": rng, "sample": rng}, batch_l["x"], obs,
            method=model.init_all,
        )["params"]
        state = PGMTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=make_pgm_optimizer(cfg).init(params),
        )
        step = make_semi_sup_train_step(cfg, model, n_labelled=32, donate=False)
        losses = []
        for i in range(4):
            state, m = step(state, batch_l, batch_u, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestViz:
    def test_write_images_grid(self, tmp_path):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.vae_trainer import init_model_params
        from causal_gen_tpu.utils.viz import write_images
        from tests.test_train import tiny_cfg

        cfg = tiny_cfg(bs=4)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        batch = {
            "x": rng.integers(0, 256, (4, 16, 16, 1)).astype(np.uint8),
            "pa": rng.uniform(-1, 1, (4, 12)).astype(np.float32),
        }
        path = str(tmp_path / "viz.png")
        im = write_images(cfg, model, params, batch, path)
        assert im.ndim == 3 and im.shape[1] == 4 * 16
        import os

        assert os.path.exists(path)

    def test_partial_abduction_sweep(self, tmp_path):
        """n_latents_viz>0 adds per-cut-level recon + cf panels
        (reference utils.py:293-305, 394-398)."""
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.vae_trainer import init_model_params
        from causal_gen_tpu.utils.viz import write_images
        from tests.test_train import tiny_cfg

        cfg = tiny_cfg(bs=4)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        batch = {
            "x": rng.integers(0, 256, (4, 16, 16, 1)).astype(np.uint8),
            "pa": rng.uniform(-1, 1, (4, 12)).astype(np.float32),
        }
        im0 = write_images(cfg, model, params, batch,
                           str(tmp_path / "v0.png"), n_latents_viz=0)
        im1 = write_images(cfg, model, params, batch,
                           str(tmp_path / "v1.png"), n_latents_viz=1)
        # one extra recon row + one extra full cf panel per extra cut level
        assert im1.shape[0] > im0.shape[0]


class TestCFEval:
    def test_eval_counterfactuals_morpho(self):
        from causal_gen_tpu.data.loader import Loader
        from causal_gen_tpu.eval.cf_eval import eval_counterfactuals
        from tests.test_dscm import build_dscm, synth_morpho_dataset

        dscm, vae_params, frozen, cfg = build_dscm(res=16)
        ds = synth_morpho_dataset(n=16, res=16)
        loader = Loader(ds, 8, shuffle=False, seed=0, concat_pa=False)
        train_attrs = {k: np.asarray(v) for k, v in ds.attrs.items()}
        stats = eval_counterfactuals(
            cfg, dscm.vae, vae_params, dscm.pgm, frozen["pgm"],
            dscm.predictor, frozen["predictor"], loader, train_attrs,
            seed=0, measure=True,
        )
        assert "digit_acc" in stats
        assert "thickness_mae" in stats
        assert "thickness_measured_mae" in stats
        for v in stats.values():
            assert np.isfinite(v)


class TestEffectivenessUnits:
    """Pin the PHYSICAL units of the effectiveness surface: cf_eval routes
    per-variable metrics through cf_get_metrics (reference
    train_cf.py:63-108), so ukbb volumes come back in ml (/1000 convention),
    ukbb/mimic ages in years, and binaries as ROC-AUC/acc, never prob-MAE."""

    def test_ukbb_volume_mae_in_ml(self):
        from causal_gen_tpu.pgm.train_cf import cf_get_metrics
        from causal_gen_tpu.utils.normalization import get_attr_max_min

        n = 8
        delta = 0.1  # offset in the [-1,1] PGM parent space
        T = {"brain_volume": np.zeros((n, 1), np.float32),
             "age": np.zeros((n, 1), np.float32),
             "sex": np.array([[0.0], [1.0]] * (n // 2), np.float32)}
        P = {"brain_volume": T["brain_volume"] + delta,
             "age": T["age"] + delta,
             "sex": T["sex"] * 0.8 + 0.1}
        stats = cf_get_metrics("ukbb192", P, T)
        bmax, bmin = get_attr_max_min("brain_volume")
        expected_ml = delta / 2 * (bmax - bmin) / 1000.0
        assert np.isclose(stats["brain_volume_mae"], expected_ml, rtol=1e-5)
        amax, amin = get_attr_max_min("age")
        expected_years = delta / 2 * (amax - amin)
        assert np.isclose(stats["age_mae"], expected_years, rtol=1e-5)
        # binaries are scored as classifiers, not prob-MAE regressions
        assert "sex_rocauc" in stats and "sex_acc" in stats
        assert "sex_mae" not in stats

    def test_mimic_age_mae_in_years(self):
        from causal_gen_tpu.pgm.train_cf import cf_get_metrics

        n = 6
        T = {"age": np.full((n, 1), -0.5, np.float32)}
        P = {"age": np.full((n, 1), -0.3, np.float32)}
        stats = cf_get_metrics("mimic192", P, T)
        # [-1,1] maps to [0,100] years: 0.2 -> 10 years
        assert np.isclose(stats["age_mae"], 10.0, rtol=1e-5)

    def test_eval_counterfactuals_uses_cf_get_metrics(self):
        """The eval harness and the CF-training eval must share one metric
        surface — guard against the two drifting apart again."""
        import inspect

        from causal_gen_tpu.eval import cf_eval

        src = inspect.getsource(cf_eval.eval_counterfactuals)
        assert "cf_get_metrics" in src


class TestVizCondPrior:
    def test_total_effect_rows_present(self, tmp_path):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.vae_trainer import init_model_params
        from causal_gen_tpu.utils.viz import write_images
        from tests.test_train import tiny_cfg

        cfg = tiny_cfg(bs=4, cond_prior=True)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        batch = {
            "x": rng.integers(0, 256, (4, 16, 16, 1)).astype(np.uint8),
            "pa": rng.uniform(-1, 1, (4, 12)).astype(np.float32),
        }
        im = write_images(cfg, model, params, batch, str(tmp_path / "v.png"))
        # cond_prior adds one total-effect row per sample vs the exogenous
        # grid: rows = 13 header + 4*(2+1)... verify it exceeds the base grid
        cfg2 = tiny_cfg(bs=4)
        im2 = write_images(cfg2, model.__class__(cfg=cfg2),
                           init_model_params(cfg2, model.__class__(cfg=cfg2),
                                             jax.random.PRNGKey(0)),
                           batch, str(tmp_path / "v2.png"))
        assert im.shape[0] > im2.shape[0]
