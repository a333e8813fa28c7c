"""DSCM merge + counterfactual training tests.

Covers: PGM SVI steps decrease loss; predictor MLE steps decrease loss and
eval metrics beat chance; the merged DSCM forward produces counterfactuals
with the right invariances (null intervention ~ reconstruction path); the CF
train step updates lambda by ascent and respects the >= 0 clamp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.config import get_config
from causal_gen_tpu.data.datasets import ArrayDataset, one_hot_np
from causal_gen_tpu.data.loader import Loader
from causal_gen_tpu.pgm.flow_pgm import MorphoMNISTPGM
from causal_gen_tpu.pgm.train_pgm import (
    PGMConfig,
    init_pgm_state,
    make_pgm_train_step,
    pgm_eval_metrics,
    preprocess_pgm_batch,
)


def synth_morpho_dataset(n=64, res=32, seed=0):
    """Synthetic morpho-like dataset: image intensity correlates with attrs."""
    rng = np.random.default_rng(seed)
    digit = rng.integers(0, 10, n)
    thickness = rng.uniform(-0.8, 0.8, n).astype(np.float32)
    intensity = np.clip(0.7 * thickness + 0.3 * rng.normal(size=n), -1, 1).astype(
        np.float32
    )
    base = ((intensity + 1) / 2 * 200 + 20)[:, None, None, None]
    images = (base + rng.uniform(0, 30, (n, res, res, 1))).astype(np.uint8)
    return ArrayDataset(
        images=images,
        attrs={
            "thickness": thickness,
            "intensity": intensity,
            "digit": one_hot_np(digit, 10),
        },
        columns=("thickness", "intensity", "digit"),
    )


class TestPGMTraining:
    def test_sup_pgm_loss_decreases(self):
        cfg = PGMConfig(dataset="morphomnist", setup="sup_pgm", bs=32, lr=5e-3)
        ds = synth_morpho_dataset()
        loader = Loader(ds, cfg.bs, seed=0, concat_pa=False)
        model = MorphoMNISTPGM(setup_predictors=False)
        first = preprocess_pgm_batch(cfg, next(iter(loader)))
        obs = {k: v for k, v in first.items() if k in model.dag_variables}
        state = init_pgm_state(cfg, model, obs)
        step = make_pgm_train_step(cfg, model, donate=False)
        losses = []
        for e in range(6):
            for i, raw in enumerate(loader):
                batch = preprocess_pgm_batch(cfg, raw)
                state, m = step(state, batch, jax.random.PRNGKey(e * 100 + i))
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_sup_aux_loss_decreases_and_metrics(self):
        cfg = PGMConfig(
            dataset="morphomnist", setup="sup_aux", bs=32, lr=1e-3, input_res=32
        )
        ds = synth_morpho_dataset(n=64)
        loader = Loader(ds, cfg.bs, seed=0, concat_pa=False)
        model = MorphoMNISTPGM(setup_predictors=True, input_res=32)
        first = preprocess_pgm_batch(cfg, next(iter(loader)))
        obs = {k: v for k, v in first.items() if k in model.dag_variables}
        # init needs predictor params too -> init via anticausal
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng, "sample": rng}, first["x"],
            method=model.anticausal_logprob, **obs,
        )["params"]
        import optax
        from causal_gen_tpu.pgm.train_pgm import PGMTrainState, make_pgm_optimizer

        state = PGMTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=make_pgm_optimizer(cfg).init(params),
        )
        step = make_pgm_train_step(cfg, model, donate=False)
        losses = []
        for e in range(4):
            for i, raw in enumerate(loader):
                batch = preprocess_pgm_batch(cfg, raw)
                state, m = step(state, batch, jax.random.PRNGKey(e * 100 + i))
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        metrics = pgm_eval_metrics(cfg, model, state.params, loader)
        assert "digit_acc" in metrics and "thickness_mae" in metrics
        assert np.isfinite(metrics["thickness_mae"])


def build_dscm(res=16, **cfg_overrides):
    """Tiny merged DSCM on synthetic data."""
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.pgm.dscm import DSCM
    from causal_gen_tpu.train.vae_trainer import init_model_params

    cfg = get_config(
        "morphomnist",
        bs=8,
        input_res=res,
        enc_arch=f"{res}b1d2,{res//2}b1d2,{res//4}b1d4,1b1",
        dec_arch=f"1b1,{res//4}b1,{res//2}b1,{res}b1",
        widths=(8, 8, 16, 16),
        z_dim=4,
        bias_max_res=res,
        **cfg_overrides,
    )
    vae = HVAE(cfg=cfg)
    vae_params = init_model_params(cfg, vae, jax.random.PRNGKey(0))

    pgm = MorphoMNISTPGM(setup_predictors=False)
    predictor = MorphoMNISTPGM(setup_predictors=True, input_res=res)
    rng = jax.random.PRNGKey(1)
    obs_attrs = {
        "thickness": jnp.zeros((8, 1)),
        "intensity": jnp.zeros((8, 1)),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[np.zeros(8, np.int64)]),
    }
    pgm_params = pgm.init({"params": rng, "sample": rng}, obs_attrs)["params"]
    x = jnp.zeros((8, res, res, 1))
    pred_params = predictor.init(
        {"params": rng, "sample": rng}, x,
        method=predictor.anticausal_logprob, **obs_attrs,
    )["params"]
    dscm = DSCM(
        cfg=cfg, pgm=pgm, predictor=predictor, vae=vae,
        elbo_constraint=1.8, lmbda_init=0.0, damping=100.0,
    )
    frozen = {"pgm": pgm_params, "predictor": pred_params}
    return dscm, vae_params, frozen, cfg


def synth_batch(res=16, n=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.uniform(-1, 1, (n, res, res, 1)), jnp.float32),
        "thickness": jnp.asarray(rng.uniform(-0.8, 0.8, (n, 1)), jnp.float32),
        "intensity": jnp.asarray(rng.uniform(-0.8, 0.8, (n, 1)), jnp.float32),
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]),
    }


class TestDSCM:
    def test_forward_outputs(self):
        dscm, vae_params, frozen, cfg = build_dscm()
        trainable = dscm.init_trainable(vae_params)
        batch = synth_batch()
        do = {"thickness": jnp.full((8, 1), 0.5)}
        out = dscm.forward(trainable, frozen, batch, do, jax.random.PRNGKey(0))
        assert np.isfinite(float(out["loss"]))
        assert out["cfs"]["x"].shape == batch["x"].shape
        assert np.allclose(out["cfs"]["thickness"], 0.5)
        assert np.all(np.abs(np.asarray(out["cfs"]["x"])) <= 1.0)

    def test_multi_particle_variance(self):
        dscm, vae_params, frozen, cfg = build_dscm()
        trainable = dscm.init_trainable(vae_params)
        batch = synth_batch()
        out = dscm.forward(
            trainable, frozen, batch, {}, jax.random.PRNGKey(0), cf_particles=3
        )
        assert out["var_cf_x"] is not None
        assert np.all(np.asarray(out["var_cf_x"]) >= -1e-6)

    def test_null_intervention_counterfactual_close_to_reconstruction(self):
        dscm, vae_params, frozen, cfg = build_dscm()
        trainable = dscm.init_trainable(vae_params)
        batch = synth_batch()
        out = dscm.forward(trainable, frozen, batch, {}, jax.random.PRNGKey(0))
        # with do={}, cf parents == factual parents (exact flow inversion), so
        # cf_loc == rec_loc and cf_x = rec_loc + rec_scale*u = x (up to clamp)
        assert np.allclose(
            np.asarray(out["cfs"]["x"]), np.asarray(batch["x"]), atol=1e-4
        )

    def test_cf_train_step_lambda_ascent(self):
        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            init_cf_state,
            make_cf_train_step,
        )

        dscm, vae_params, frozen, cfg = build_dscm()
        batch = synth_batch()
        do = {"intensity": jnp.full((8, 1), 0.2)}
        # eps huge -> constraint eps - elbo > 0 satisfied -> dual ascent pushes
        # lambda DOWN -> the >= 0 clamp holds it at 0
        dscm.elbo_constraint = 100.0
        from causal_gen_tpu.pgm.train_cf import dense_intervention

        dag_vars = tuple(dscm.pgm.dag_variables.keys())
        attrs = {k: batch[k] for k in dag_vars}
        dov, dom = dense_intervention(dag_vars, attrs, do)
        cf_cfg = CFConfig(lr=1e-4, lr_lagrange=1e-1, grad_skip=1e9, elbo_constraint=100.0)
        state = init_cf_state(cf_cfg, dscm, vae_params)
        step = make_cf_train_step(cf_cfg, dscm, frozen, donate=False)
        state, m = step(state, batch, dov, dom, jax.random.PRNGKey(0))
        assert float(state.trainable["lmbda"][0]) == 0.0  # clamp holds
        # eps tiny -> constraint violated (eps - elbo < 0) -> lambda grows
        dscm.elbo_constraint = -10.0
        cf_cfg2 = CFConfig(lr=1e-4, lr_lagrange=1e-1, grad_skip=1e9, elbo_constraint=-10.0)
        state2 = init_cf_state(cf_cfg2, dscm, vae_params)
        step2 = make_cf_train_step(cf_cfg2, dscm, frozen, donate=False)
        prev = float(state2.trainable["lmbda"][0])
        for i in range(3):
            state2, m2 = step2(state2, batch, dov, dom, jax.random.PRNGKey(i))
        assert float(state2.trainable["lmbda"][0]) > prev
        assert int(state2.step) == 3

    def test_cf_epoch_runs(self):
        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            cf_train_epoch,
            init_cf_state,
            make_cf_train_step,
        )

        dscm, vae_params, frozen, cfg = build_dscm()
        cf_cfg = CFConfig(bs=8, grad_skip=1e9, elbo_constraint=1.8)
        pgm_cfg = PGMConfig(dataset="morphomnist", bs=8, input_res=16)
        ds = synth_morpho_dataset(n=16, res=16)
        loader = Loader(ds, 8, seed=0, concat_pa=False)
        state = init_cf_state(cf_cfg, dscm, vae_params)
        step = make_cf_train_step(cf_cfg, dscm, frozen, donate=False)
        state, stats = cf_train_epoch(
            cf_cfg, pgm_cfg, dscm, state, frozen, loader, step,
            jax.random.PRNGKey(0), epoch=1,
            host_rng=np.random.default_rng(0),
        )
        assert np.isfinite(stats["loss"])
        assert np.isfinite(stats["aux_loss"])


class TestDSCMCondPrior:
    def test_forward_with_cond_prior_vae(self):
        """DSCM forward must unwrap the cond_prior abduct dicts
        (vae.py:271-276) before forwarding latents."""
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.pgm.dscm import DSCM
        from causal_gen_tpu.train.vae_trainer import init_model_params

        res = 16
        cfg = get_config(
            "morphomnist", bs=8, input_res=res,
            enc_arch=f"{res}b1d2,{res//2}b1d2,{res//4}b1d4,1b1",
            dec_arch=f"1b1,{res//4}b1,{res//2}b1,{res}b1",
            widths=(8, 8, 16, 16), z_dim=4, bias_max_res=res,
            cond_prior=True,
        )
        vae = HVAE(cfg=cfg)
        vae_params = init_model_params(cfg, vae, jax.random.PRNGKey(0))
        dscm0, _, frozen, _ = build_dscm(res=res)
        dscm = DSCM(cfg=cfg, pgm=dscm0.pgm, predictor=dscm0.predictor,
                    vae=vae, elbo_constraint=1.8)
        trainable = dscm.init_trainable(vae_params)
        batch = synth_batch()
        do = {"thickness": jnp.full((8, 1), 0.5)}
        out = dscm.forward(trainable, frozen, batch, do, jax.random.PRNGKey(0))
        assert np.isfinite(float(out["loss"]))
        assert out["cfs"]["x"].shape == batch["x"].shape


class TestDenseInterventionNoRetrace:
    def test_one_compile_for_all_do_patterns(self):
        """dense_intervention's one-XLA-program claim, pinned: compile the CF
        train step once, then sweep EVERY do-pattern (each DAG variable,
        multi-variable, and the null intervention) and assert the jit cache
        never grows. Guards against a shape/static-arg leak silently
        reintroducing the reference's compile-per-pattern hazard
        (train_cf.py:145-153)."""
        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            dense_intervention,
            init_cf_state,
            make_cf_train_step,
        )

        dscm, vae_params, frozen, cfg = build_dscm()
        batch = synth_batch()
        dag_vars = tuple(dscm.pgm.dag_variables.keys())
        attrs = {k: batch[k] for k in dag_vars}
        cf_cfg = CFConfig(lr=1e-4, grad_skip=1e9, elbo_constraint=1.8)
        state = init_cf_state(cf_cfg, dscm, vae_params)
        # donate=False so the input state stays alive across patterns
        step = make_cf_train_step(cf_cfg, dscm, frozen, donate=False)

        rng = np.random.default_rng(0)
        patterns = [{k: attrs[k][rng.permutation(8)]} for k in dag_vars]
        patterns.append(
            {k: attrs[k][rng.permutation(8)] for k in dag_vars[:2]}
        )
        patterns.append({})  # null intervention
        for i, do in enumerate(patterns):
            dov, dom = dense_intervention(dag_vars, attrs, do)
            state, m = step(state, batch, dov, dom, jax.random.PRNGKey(i))
            assert np.isfinite(float(m["loss"]))
        assert step._cache_size() == 1, (
            f"CF step retraced: {step._cache_size()} compiled variants for "
            f"{len(patterns)} do-patterns"
        )


@pytest.mark.slow
class TestCFBatchWallKnobs:
    """The 192^2 CF batch-wall levers (VERDICT r3 item 3): steps_per_call
    must be numerically IDENTICAL to the single-step path, cf_remat must be
    numerically identical to the plain backward, and accu_steps must train
    with one optimizer update per effective batch."""

    def _epoch_args(self, accu=1, spc=1, n=32, bs=8):
        from causal_gen_tpu.pgm.train_cf import CFConfig

        dscm, vae_params, frozen, cfg = build_dscm()
        cf_cfg = CFConfig(bs=bs, grad_skip=1e9, elbo_constraint=1.8,
                          accu_steps=accu, steps_per_call=spc)
        pgm_cfg = PGMConfig(dataset="morphomnist", bs=bs, input_res=16)
        ds = synth_morpho_dataset(n=n, res=16)
        loader = Loader(ds, bs, seed=0, concat_pa=False)
        return dscm, vae_params, frozen, cf_cfg, pgm_cfg, loader

    def _run_epoch(self, accu=1, spc=1):
        from causal_gen_tpu.pgm.train_cf import (
            cf_train_epoch,
            init_cf_state,
            make_cf_multi_step,
            make_cf_train_step,
        )

        dscm, vae_params, frozen, cf_cfg, pgm_cfg, loader = self._epoch_args(
            accu=accu, spc=spc
        )
        state = init_cf_state(cf_cfg, dscm, vae_params)
        step = make_cf_train_step(cf_cfg, dscm, frozen, donate=False)
        multi = (
            make_cf_multi_step(cf_cfg, dscm, frozen, donate=False)
            if spc > 1 else None
        )
        state, stats = cf_train_epoch(
            cf_cfg, pgm_cfg, dscm, state, frozen, loader, step,
            jax.random.PRNGKey(0), epoch=1,
            host_rng=np.random.default_rng(0), multi_step=multi,
        )
        return state, stats

    def test_steps_per_call_matches_single_step(self):
        s1, st1 = self._run_epoch(spc=1)
        s2, st2 = self._run_epoch(spc=2)
        assert int(s1.step) == int(s2.step) == 4
        for k in st1:
            assert np.isclose(st1[k], st2[k], rtol=1e-5, atol=1e-6), (
                k, st1[k], st2[k]
            )
        a = jax.tree.leaves(s1.trainable)
        b = jax.tree.leaves(s2.trainable)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6
            )

    def test_steps_per_call_tail_chunk(self):
        # 4 batches with spc=3 -> one scanned chunk of 3 + a single-step tail
        s, stats = self._run_epoch(spc=3)
        assert int(s.step) == 4
        assert np.isfinite(stats["loss"])

    def test_accu_steps_trains(self):
        s, stats = self._run_epoch(accu=2)
        assert int(s.step) == 4  # one update per effective batch
        assert np.isfinite(stats["loss"]) and np.isfinite(stats["aux_loss"])

    def test_cf_remat_matches_plain(self):
        import dataclasses

        from causal_gen_tpu.pgm.train_cf import (
            CFConfig,
            dense_intervention,
            init_cf_state,
            make_cf_train_step,
        )

        dscm, vae_params, frozen, cfg = build_dscm()
        batch = synth_batch()
        dag_vars = tuple(dscm.pgm.dag_variables.keys())
        attrs = {k: batch[k] for k in dag_vars}
        dov, dom = dense_intervention(
            dag_vars, attrs, {"thickness": jnp.full((8, 1), 0.3)}
        )
        cf_cfg = CFConfig(grad_skip=1e9, elbo_constraint=1.8)
        outs = []
        for remat in (False, True):
            d = dataclasses.replace(dscm, remat=remat)
            state = init_cf_state(cf_cfg, d, vae_params)
            step = make_cf_train_step(cf_cfg, d, frozen, donate=False)
            state, m = step(state, batch, dov, dom, jax.random.PRNGKey(0))
            outs.append((state, m))
        (sp, mp), (sr, mr) = outs
        assert np.isclose(float(mp["loss"]), float(mr["loss"]), rtol=1e-6)
        assert np.isclose(
            float(mp["grad_norm"]), float(mr["grad_norm"]), rtol=1e-5
        )
        for x, y in zip(jax.tree.leaves(sp.trainable),
                        jax.tree.leaves(sr.trainable)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
            )
