"""Aux subsystem tests: profiling, distributed helpers, metric writer,
normalization inverses, plots."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


class TestProfiling:
    def test_trace_and_timer(self, tmp_path):
        from causal_gen_tpu.utils import profiling

        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((128, 128))
        f(x).block_until_ready()
        timer = profiling.StepTimer(skip_first=1)
        with profiling.trace(str(tmp_path)):
            for i in range(3):
                timer.start()
                with profiling.annotate(f"step_{i}"):
                    out = f(x)
                timer.stop(out)
        files = [p for p in tmp_path.rglob("*") if p.is_file()]
        assert files, "no trace artifacts written"
        assert timer.mean_ms > 0
        assert timer.throughput(128) > 0


class TestDistributedHelpers:
    def test_host_shard_indices_single_process(self):
        from causal_gen_tpu.parallel.distributed import host_shard_indices

        idx = np.arange(64)
        out = host_shard_indices(idx)
        assert len(out) == 64 // jax.process_count()

    def test_make_global_batch(self):
        from causal_gen_tpu.parallel.distributed import make_global_batch
        from causal_gen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((8,), ("data",))
        batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
        out = make_global_batch(mesh, batch)
        assert out["x"].shape == (16, 1)
        assert np.allclose(np.asarray(out["x"]).ravel(), np.arange(16))


class TestMetricWriter:
    def test_jsonl_stream(self, tmp_path):
        from causal_gen_tpu.train.experiment import MetricWriter

        w = MetricWriter(str(tmp_path), tensorboard=False)
        w.add_scalar("train/loss", 1.5, 1)
        w.add_scalars({"a": 1.0, "b": 2.0}, 2, prefix="eval/")
        w.add_hparams({"lr": 1e-3})
        w.close()
        lines = open(tmp_path / "metrics.jsonl").read().splitlines()
        assert len(lines) == 3
        rec = json.loads(lines[0])
        assert rec["tag"] == "train/loss" and rec["value"] == 1.5
        assert json.load(open(tmp_path / "hparams.json"))["lr"] == 1e-3


class TestNormalizationInverse:
    def test_normalize_unnormalize_roundtrip(self):
        from causal_gen_tpu.utils.normalization import normalize, unnormalize

        x = np.linspace(10.0, 20.0, 7)
        y = normalize(x, x_min=10, x_max=20)
        assert np.allclose(unnormalize(y, 10, 20), x)
        y01 = normalize(x, x_min=10, x_max=20, zero_one=True)
        assert np.allclose(unnormalize(y01, 10, 20, zero_one=True), x)


class TestPlots:
    def test_plot_cf_and_joint(self, tmp_path):
        from causal_gen_tpu.utils.plots import plot_cf, plot_joint

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (4, 16, 16, 1))
        cf = rng.uniform(-1, 1, (4, 16, 16, 1))
        var = rng.uniform(0, 0.1, (4, 16, 16, 1))
        p1 = tmp_path / "cf.png"
        plot_cf(x, cf, var_cf_x=var, num_images=4, save_path=str(p1))
        assert p1.exists()
        p2 = tmp_path / "joint.png"
        plot_joint(rng.normal(size=100), rng.normal(size=100), "t", str(p2))
        assert p2.exists()
