"""Trainer, EMA, schedules, data-pipeline, and sharding tests.

Reference has no test suite (SURVEY.md §4); these cover the semantics we
committed to preserve: EMA warmup schedule (utils.py:167-228), linear warmup
(utils.py:32-40), grad-skip gating (trainer.py:74-85), data contract
(datasets.py:66-86), and the multi-device DP/TP step on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit compiles; quick pass: -m 'not slow'

from causal_gen_tpu.config import get_config
from causal_gen_tpu.utils.ema import ema_decay, ema_update
from causal_gen_tpu.utils.schedules import beta_anneal, linear_warmup


class TestEMA:
    def test_decay_zero_during_warmup(self):
        # reference: epoch = step - update_after_step - 1 <= 0 -> decay 0
        for s in [1, 50, 100, 101]:
            assert float(ema_decay(s, update_after_step=100)) == 0.0

    def test_decay_schedule_values(self):
        # epoch = s - 101; value = 1 - (1 + epoch)^-1 (inv_gamma=1, power=1)
        s = 103
        expected = 1 - 1 / (1 + (s - 101))
        assert np.isclose(float(ema_decay(s, beta=0.999)), expected)
        # clamps at beta for large steps
        assert float(ema_decay(10**7, beta=0.999)) == pytest.approx(0.999)

    def test_update_copies_then_averages(self):
        ema = {"w": jnp.zeros(3)}
        p = {"w": jnp.ones(3)}
        out = ema_update(ema, p, update_count=50)  # decay 0 -> copy
        assert np.allclose(out["w"], 1.0)
        out = ema_update(ema, p, update_count=103, beta=0.999)
        d = 1 - 1 / 3
        assert np.allclose(out["w"], (1 - d) * 1.0)


class TestSchedules:
    def test_linear_warmup(self):
        assert float(linear_warmup(0, 100)) == 0.0
        assert float(linear_warmup(50, 100)) == 0.5
        assert float(linear_warmup(100, 100)) == 1.0
        assert float(linear_warmup(101, 100)) == 1.0
        assert float(linear_warmup(5, 0)) == 1.0

    def test_beta_anneal(self):
        assert float(beta_anneal(5.0, 10, 100)) == pytest.approx(0.01)
        assert float(beta_anneal(5.0, 10**6, 100)) == 5.0


def tiny_cfg(**kw):
    base = dict(
        bs=8,
        input_res=16,
        enc_arch="16b1d2,8b1d2,4b1d4,1b1",
        dec_arch="1b1,4b1,8b1,16b1",
        widths=(8, 8, 16, 16),
        z_dim=4,
        context_dim=12,
        accu_steps=1,
        bias_max_res=16,
        lr=1e-3,
        lr_warmup_steps=10,
    )
    base.update(kw)
    return get_config("morphomnist", **base)


def make_batch(cfg, accu=1, seed=0):
    rng = np.random.default_rng(seed)
    micro = cfg.bs // accu
    return {
        "x": rng.integers(0, 256, (accu, micro, cfg.input_res, cfg.input_res, 1)).astype(
            np.uint8
        ),
        "pa": rng.uniform(-1, 1, (accu, micro, cfg.context_dim)).astype(np.float32),
    }


class TestTrainStep:
    def test_step_updates_and_metrics(self):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

        cfg = tiny_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, donate=False)
        new_state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["elbo"]))
        assert int(new_state.step) == 1
        assert float(m["skipped"]) == 0.0
        # first update has lr=0 (reference LambdaLR: f(0)=0); second moves params
        new_state2, _ = step(new_state, make_batch(cfg, seed=1), jax.random.PRNGKey(2))
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state2.params
        )
        assert max(jax.tree.leaves(diff)) > 0

    def test_grad_skip_blocks_update(self):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

        cfg = tiny_cfg(grad_skip=1e-12)  # everything skipped
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, donate=False)
        new_state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
        assert float(m["skipped"]) == 1.0
        assert int(new_state.step) == 0
        assert int(new_state.skipped) == 1
        same = jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), state.params, new_state.params
        )
        assert all(jax.tree.leaves(same))

    def test_grad_accumulation_matches_full_batch_elbo(self):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

        cfg = tiny_cfg(accu_steps=2)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, donate=False)
        batch = make_batch(cfg, accu=2)
        _, m = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["elbo"]))

    def test_multi_step_matches_single_step(self):
        """steps_per_call scan == the single-step path bit-for-bit: same
        update sequence AND same per-batch RNG keys (fold_in(rng, offset+j))."""
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import (
            init_model_params,
            make_multi_train_step,
            make_train_step,
        )

        cfg = tiny_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(3)
        offset = 42  # arbitrary epoch*100000 + chunk-start index
        batches = [make_batch(cfg, seed=s) for s in range(4)]

        step = make_train_step(cfg, model, donate=False)
        st_a = init_train_state(cfg, params)
        singles = []
        for j, b in enumerate(batches):
            st_a, m = step(st_a, b, jax.random.fold_in(rng, offset + j))
            singles.append(m)

        multi = make_multi_train_step(cfg, model, donate=False)
        chunk = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        st_b, ms = multi(
            init_train_state(cfg, params), chunk, rng,
            jnp.asarray(offset, jnp.int32),
        )

        np.testing.assert_array_equal(
            np.asarray([float(m["elbo"]) for m in singles]),
            np.asarray(ms["elbo"]),
        )
        assert int(st_a.step) == int(st_b.step)
        for pa, pb in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_determinism(self):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

        cfg = tiny_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, donate=False)
        batch = make_batch(cfg)
        m1 = step(init_train_state(cfg, params), batch, jax.random.PRNGKey(7))[1]
        m2 = step(init_train_state(cfg, params), batch, jax.random.PRNGKey(7))[1]
        assert float(m1["elbo"]) == float(m2["elbo"])


class TestData:
    def test_array_dataset_contract(self):
        from causal_gen_tpu.data.datasets import ArrayDataset, one_hot_np

        n = 20
        ds = ArrayDataset(
            images=np.zeros((n, 28, 28, 1), np.uint8),
            attrs={
                "thickness": np.linspace(-1, 1, n).astype(np.float32),
                "intensity": np.linspace(-1, 1, n).astype(np.float32),
                "digit": one_hot_np(np.arange(n) % 10, 10),
            },
            columns=("thickness", "intensity", "digit"),
        )
        b = ds.batch(np.arange(4))
        assert b["x"].shape == (4, 28, 28, 1)
        assert b["pa"].shape == (4, 12)  # 1 + 1 + 10
        b2 = ds.batch(np.arange(4), concat_pa=False)
        assert b2["thickness"].shape == (4, 1)
        assert b2["digit"].shape == (4, 10)

    def test_random_crop_shapes_and_determinism(self):
        from causal_gen_tpu.data.augment import center_pad, random_crop

        x = np.arange(2 * 28 * 28).reshape(2, 28, 28, 1).astype(np.uint8)
        out = random_crop(np.random.default_rng(0), x, (32, 32), (4, 4))
        assert out.shape == (2, 32, 32, 1)
        out2 = random_crop(np.random.default_rng(0), x, (32, 32), (4, 4))
        assert np.array_equal(out, out2)
        assert center_pad(x, 2).shape == (2, 32, 32, 1)

    def test_loader_epochs(self):
        from causal_gen_tpu.data.datasets import ArrayDataset
        from causal_gen_tpu.data.loader import Loader

        n = 37
        ds = ArrayDataset(
            images=np.zeros((n, 8, 8, 1), np.uint8),
            attrs={"a": np.arange(n, dtype=np.float32)},
            columns=("a",),
        )
        loader = Loader(ds, batch_size=8, seed=0)
        batches = list(loader)
        assert len(batches) == 4  # drop_last
        assert all(b["x"].shape[0] == 8 for b in batches)

    def test_morphomnist_loads_reference_data(self):
        import os

        root = "/root/reference/datasets/morphomnist"
        if not os.path.exists(os.path.join(root, "t10k-images-idx3-ubyte.gz")):
            pytest.skip("reference morphomnist data not present")
        from causal_gen_tpu.data.datasets import morphomnist

        cfg = get_config("morphomnist")
        dsets = morphomnist(cfg, data_dir=root)
        assert len(dsets["valid"]) == 10000
        b = dsets["valid"].batch(np.arange(8), np.random.default_rng(0))
        assert b["x"].shape == (8, 32, 32, 1)  # eval: pad 2
        assert b["pa"].shape == (8, 12)
        # normalized morphometrics within [-1, 1] (up to range clipping)
        assert np.abs(b["pa"][:, :2]).max() <= 1.0 + 1e-5
        tr = dsets["train"].batch(np.arange(8), np.random.default_rng(0))
        assert tr["x"].shape == (8, 32, 32, 1)  # train: pad 4 + random crop


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params

        cfg = tiny_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, cfg, state, extra={"epoch": 3})
        cfg2, state2, extra = load_checkpoint(path)
        assert cfg2.enc_arch == cfg.enc_arch
        assert extra["epoch"] == 3
        same = jax.tree.map(
            lambda a, b: bool(np.allclose(a, b)), state.params, state2.params
        )
        assert all(jax.tree.leaves(same))

    def test_async_writer_rotation_and_best(self, tmp_path):
        """Async writer rotates beyond max_to_keep, never GCs the best
        checkpoint, and keeps the 'checkpoint' symlink loadable."""
        import os

        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.checkpoint import (
            AsyncCheckpointWriter, load_checkpoint, state_payload,
        )
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params

        cfg = tiny_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        w = AsyncCheckpointWriter(str(tmp_path), max_to_keep=2)
        # best metric lands at step 2; later saves are worse
        metrics = {1: 5.0, 2: 1.0, 3: 4.0, 4: 3.0, 5: 2.0}
        for step, metric in metrics.items():
            w.save(
                state_payload(state),
                {"config": cfg.to_dict(), "extra": {"epoch": step}},
                step=step, metric=metric,
            )
        w.close()
        kept = sorted(
            d for d in os.listdir(tmp_path) if d.startswith("step_")
            and not d.endswith(".meta.json")
        )
        # newest (step 5) + best (step 2); older ones GC'd
        assert kept == ["step_0000000002", "step_0000000005"]
        # the symlink tracks the best checkpoint and loads through the
        # standard API (DSCM merge compatibility)
        link = str(tmp_path / "checkpoint")
        assert os.path.islink(link)
        cfg2, state2, extra = load_checkpoint(link)
        assert extra["epoch"] == 2
        assert cfg2.enc_arch == cfg.enc_arch
        same = jax.tree.map(
            lambda a, b: bool(np.allclose(a, b)), state.params, state2.params
        )
        assert all(jax.tree.leaves(same))

        # crash recovery: force the link onto a stale target (the writer
        # refreshes it only on the NEXT save, so an abrupt kill leaves it one
        # save behind) and repair from index.json
        from causal_gen_tpu.train.checkpoint import repair_link

        stale = str(tmp_path / "step_0000000005")
        os.remove(link)
        os.symlink(stale, link)
        target = repair_link(str(tmp_path))
        assert target.endswith("step_0000000002")  # best metric wins
        _, _, extra = load_checkpoint(link)
        assert extra["epoch"] == 2

    def test_update_metric_after_save(self, tmp_path):
        """Deferred-metric retention: the CF trainer saves BEFORE the valid
        sweeps (crash-safety) and feeds the valid loss back via
        update_metric; the best pointer must then track best-valid like the
        reference's save-on-best (train_cf.py:510-517)."""
        import os

        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.train.checkpoint import (
            AsyncCheckpointWriter, load_checkpoint,
        )
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params
        from causal_gen_tpu.train.checkpoint import state_payload

        cfg = tiny_cfg()
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        state = init_train_state(cfg, params)
        w = AsyncCheckpointWriter(str(tmp_path), max_to_keep=2)
        # metric arrives only AFTER each save, as in the CF eval sweeps
        for step, metric in {1: 1.0, 2: 6.0, 3: 4.0}.items():
            p = w.save(
                state_payload(state),
                {"config": cfg.to_dict(), "extra": {"epoch": step}},
                step=step,
            )
            w.update_metric(metric, path=p)
        # best (step 1, metric 1.0) survives rotation and owns the symlink
        w.close()
        kept = sorted(
            d for d in os.listdir(tmp_path) if d.startswith("step_")
            and not d.endswith(".meta.json")
        )
        assert "step_0000000001" in kept
        _, _, extra = load_checkpoint(str(tmp_path / "checkpoint"))
        assert extra["epoch"] == 1


class TestParallel:
    def test_dp_tp_train_step_on_mesh(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out["elbo"]))

    def test_dp_matches_single_device(self):
        """DP-sharded step computes the same loss as unsharded."""
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

        cfg = tiny_cfg(bs=16)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        step = make_train_step(cfg, model, donate=False)
        m_single = step(init_train_state(cfg, params), batch, jax.random.PRNGKey(3))[1]

        mesh = make_mesh((8,), ("data",))
        with mesh:
            state = replicate(init_train_state(cfg, params), mesh)
            sharded = shard_batch(mesh, batch, batch_dim=1)
            m_dp = step(state, sharded, jax.random.PRNGKey(3))[1]
        assert np.isclose(float(m_single["elbo"]), float(m_dp["elbo"]), rtol=1e-5)

    def test_multihost_recipe_smoke(self, monkeypatch):
        """examples/multihost_train.py --smoke: per-host shard loading +
        global-batch assembly + sharded step on the 8-device mesh
        (single-process degenerate case of the pod-slice launch)."""
        import importlib
        import sys

        sys.path.insert(0, "examples")
        mod = importlib.import_module("multihost_train")
        monkeypatch.setattr(sys, "argv", ["multihost_train.py", "--smoke"])
        mod.main()

    def test_spatial_sharding_matches_single_device(self):
        """Conv activations sharded over a 'space' mesh axis (the long-context
        analog, SURVEY.md §5): GSPMD inserts the 3x3-conv halo exchanges and
        the train step computes the same loss as unsharded."""
        from causal_gen_tpu.models.hvae import HVAE
        from causal_gen_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch_spatial,
        )
        from causal_gen_tpu.train.state import init_train_state
        from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

        cfg = tiny_cfg(bs=8)
        model = HVAE(cfg=cfg)
        params = init_model_params(cfg, model, jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        step = make_train_step(cfg, model, donate=False)
        m_single = step(init_train_state(cfg, params), batch, jax.random.PRNGKey(3))[1]

        mesh = make_mesh((2, 4), ("data", "space"))
        with mesh:
            state = replicate(init_train_state(cfg, params), mesh)
            sharded = shard_batch_spatial(mesh, batch, batch_dim=1)
            m_sp = step(state, sharded, jax.random.PRNGKey(3))[1]
        # rtol 1e-3, not 1e-5: the discretized-Gaussian NLL logs near-
        # cancelling CDF differences, so ulp-level f32 reassociation from the
        # different per-shard conv tilings amplifies ~1e-4 at random init.
        # The deterministic path (sampled z, below) matches to ulp.
        assert np.isclose(float(m_single["elbo"]), float(m_sp["elbo"]), rtol=1e-3)

        from causal_gen_tpu.parallel.mesh import spatial_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jnp.asarray(batch["x"][0])
        pa = jnp.asarray(batch["pa"][0])

        def zs_fn(p, x, pa):
            from causal_gen_tpu.train.vae_trainer import preprocess_x

            zs = model.apply({"params": p}, preprocess_x(x), pa,
                             method="abduct", rngs={"sample": jax.random.PRNGKey(7)})
            return [z["z"] if isinstance(z, dict) else z for z in zs]

        z_single = jax.jit(zs_fn)(params, x, pa)
        with mesh:
            xs = jax.device_put(x, spatial_sharding(mesh))
            pas = jax.device_put(pa, NamedSharding(mesh, P("data")))
            z_sp = jax.jit(zs_fn)(replicate(params, mesh), xs, pas)
        for a, b in zip(z_single, z_sp):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5
