"""Guide sampling (all PGMs), semi-sup epoch driver, CF eval epoch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.pgm.flow_pgm import ChestPGM, ColourMNISTPGM, FlowPGM


def _apply(model, params, method, *a, **kw):
    return model.apply(
        {"params": params}, *a, method=method,
        rngs={"sample": kw.pop("rng", jax.random.PRNGKey(0))}, **kw,
    )


class TestGuideSamples:
    def test_ukbb_guide_fills_all(self):
        n = 4
        obs = {
            "sex": None, "mri_seq": None, "age": None,
            "brain_volume": None, "ventricle_volume": None,
        }
        model = FlowPGM(setup_predictors=True, input_res=32)
        x = jnp.zeros((n, 32, 32, 1))
        full = {
            "sex": jnp.zeros((n, 1)), "mri_seq": jnp.zeros((n, 1)),
            "age": jnp.zeros((n, 1)), "brain_volume": jnp.zeros((n, 1)),
            "ventricle_volume": jnp.zeros((n, 1)),
        }
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng, "sample": rng}, x, full, method=model.init_all
        )["params"]
        values, logq = _apply(model, params, model.guide_sample, x, obs)
        for k in obs:
            assert values[k].shape == (n, 1), k
            assert k in logq
        assert set(values["sex"].ravel().tolist()) <= {0.0, 1.0}

    def test_cmnist_guide(self):
        n = 4
        model = ColourMNISTPGM(setup_predictors=True, input_res=32)
        x = jnp.zeros((n, 32, 32, 3))
        full = {"digit": jnp.ones((n, 10)) / 10, "colour": jnp.ones((n, 10)) / 10}
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng, "sample": rng}, x, full, method=model.init_all
        )["params"]
        values, logq = _apply(
            model, params, model.guide_sample, x, {"digit": None, "colour": None}
        )
        assert values["digit"].shape == (n, 10)
        assert np.allclose(np.asarray(values["digit"]).sum(-1), 1.0)

    def test_chest_guide(self):
        n = 2
        model = ChestPGM(setup_predictors=True, input_res=64)
        x = jnp.zeros((n, 64, 64, 1))
        full = {
            "race": jnp.ones((n, 3)) / 3, "sex": jnp.zeros((n, 1)),
            "finding": jnp.zeros((n, 1)), "age": jnp.zeros((n, 1)),
        }
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng, "sample": rng, "dropout": rng}, x, full,
            method=model.init_all,
        )["params"]
        values, logq = _apply(
            model, params, model.guide_sample, x,
            {"race": None, "sex": None, "finding": None, "age": None},
        )
        assert values["race"].shape == (n, 3)
        assert values["age"].shape == (n, 1)
        assert set(logq) == {"race", "sex", "finding", "age"}


class TestSemiSupEpoch:
    def test_epoch_driver(self):
        from causal_gen_tpu.data.loader import Loader
        from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
        from causal_gen_tpu.pgm.train_pgm import (
            PGMConfig,
            PGMTrainState,
            make_pgm_optimizer,
            make_semi_sup_train_step,
            preprocess_pgm_batch,
            split_labelled_unlabelled,
            ss_train_epoch,
        )
        from tests.test_dscm import synth_morpho_dataset

        cfg = PGMConfig(dataset="morphomnist", setup="semi_sup", bs=8,
                        lr=1e-3, input_res=32)
        ds = synth_morpho_dataset(n=48)
        ds_l, ds_u = split_labelled_unlabelled(ds, sup_frac=0.25)
        loader_l = Loader(ds_l, 8, seed=0, concat_pa=False)
        loader_u = Loader(ds_u, 8, seed=1, concat_pa=False)
        model = MorphoMNISTPGM(setup_predictors=True, input_res=32)
        first = preprocess_pgm_batch(cfg, next(iter(loader_l)))
        obs = {k: v for k, v in first.items() if k in model.dag_variables}
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng, "sample": rng}, first["x"], obs,
            method=model.init_all,
        )["params"]
        state = PGMTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=make_pgm_optimizer(cfg).init(params),
        )
        step = make_semi_sup_train_step(cfg, model, n_labelled=len(ds_l),
                                        donate=False)
        state, stats = ss_train_epoch(
            cfg, model, state, loader_l, loader_u, step,
            jax.random.PRNGKey(1), epoch=1,
        )
        assert np.isfinite(stats["loss"])
        assert int(state.step) == len(loader_u)  # outer = unlabelled (larger)


class TestCFEvalEpoch:
    def test_eval_epoch_metrics(self):
        from causal_gen_tpu.data.loader import Loader
        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            cf_eval_epoch,
            init_cf_state,
            make_cf_eval_step,
        )
        from causal_gen_tpu.pgm.train_pgm import PGMConfig
        from tests.test_dscm import build_dscm, synth_morpho_dataset

        dscm, vae_params, frozen, cfg = build_dscm(res=16)
        cf_cfg = CFConfig(bs=8, elbo_constraint=1.8)
        pgm_cfg = PGMConfig(dataset="morphomnist", bs=8, input_res=16)
        ds = synth_morpho_dataset(n=16, res=16)
        loaders = {
            "train": Loader(ds, 8, seed=0, concat_pa=False),
            "valid": Loader(ds, 8, shuffle=False, seed=1, concat_pa=False),
        }
        state = init_cf_state(cf_cfg, dscm, vae_params)
        eval_step = make_cf_eval_step(cf_cfg, dscm, frozen)
        stats, metrics = cf_eval_epoch(
            cf_cfg, pgm_cfg, dscm, state, frozen, loaders, eval_step,
            jax.random.PRNGKey(0), do_pa="thickness",
        )
        assert np.isfinite(stats["loss"])
        assert "thickness_mae" in metrics and "digit_acc" in metrics


class TestCFCheckpoint:
    def test_cf_checkpoint_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            init_cf_state,
            load_cf_checkpoint,
            save_cf_checkpoint,
        )
        from tests.test_dscm import build_dscm

        dscm, vae_params, frozen, cfg = build_dscm(res=16)
        cf_cfg = CFConfig(lmbda_init=0.5, elbo_constraint=1.8)
        state = init_cf_state(cf_cfg, dscm, vae_params)
        path = str(tmp_path / "cf_ckpt")
        save_cf_checkpoint(path, cf_cfg, state, extra={"epoch": 7})
        cfg2, state2, extra = load_cf_checkpoint(path)
        assert extra["epoch"] == 7
        assert cfg2.elbo_constraint == 1.8
        same = jax.tree.map(
            lambda a, b: bool(np.allclose(a, b)),
            state.trainable, state2.trainable,
        )
        assert all(jax.tree.leaves(same))
        assert float(state2.trainable["lmbda"][0]) == 0.5

    def test_resume_restores_optimizer_structure(self, tmp_path):
        # regression: restoring WITHOUT a template gives raw dicts for the
        # two optax states and opt.update crashes on the first resumed step
        # (fixed by load_cf_checkpoint(template_state=...), the pattern the
        # HVAE resume already used)
        from causal_gen_tpu.data.loader import Loader
        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            cf_train_epoch,
            init_cf_state,
            load_cf_checkpoint,
            load_cf_meta,
            make_cf_train_step,
            save_cf_checkpoint,
        )
        from causal_gen_tpu.pgm.train_pgm import PGMConfig
        from tests.test_dscm import build_dscm, synth_morpho_dataset

        dscm, vae_params, frozen, _ = build_dscm(res=16)
        cf_cfg = CFConfig(bs=8, epochs=1, elbo_constraint=1.8)
        pgm_cfg = PGMConfig(dataset="morphomnist", bs=8, input_res=16)
        ds = synth_morpho_dataset(n=16, res=16)
        loader = Loader(ds, 8, seed=0, concat_pa=False)

        state = init_cf_state(cf_cfg, dscm, vae_params)
        step = make_cf_train_step(cf_cfg, dscm, frozen, donate=False)
        host_rng = np.random.default_rng(0)
        state, _ = cf_train_epoch(
            cf_cfg, pgm_cfg, dscm, state, frozen, loader, step,
            jax.random.PRNGKey(0), 1, host_rng,
        )
        path = str(tmp_path / "cf_ckpt")
        save_cf_checkpoint(path, cf_cfg, state, extra={"epoch": 1})

        # sidecar-only read (what the CLI uses before the template exists)
        meta_cfg, extra = load_cf_meta(path)
        assert extra["epoch"] == 1 and meta_cfg.elbo_constraint == 1.8

        template = init_cf_state(cf_cfg, dscm, vae_params)
        _, restored, _ = load_cf_checkpoint(path, template_state=template)
        # optax NamedTuple structure preserved -> a further step must run
        assert (jax.tree_util.tree_structure(restored.opt_state)
                == jax.tree_util.tree_structure(template.opt_state))
        restored, stats = cf_train_epoch(
            cf_cfg, pgm_cfg, dscm, restored, frozen, loader, step,
            jax.random.PRNGKey(1), 2, host_rng,
        )
        assert np.isfinite(stats["loss"])
        # every batch was attempted post-resume (the tiny synthetic model may
        # grad-skip, so count step + skipped rather than step alone)
        assert (int(restored.step) + int(restored.skipped)
                == int(state.step) + int(state.skipped) + len(loader))
