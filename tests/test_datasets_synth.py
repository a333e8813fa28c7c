"""UKBB / MIMIC dataset-builder tests on synthetic directory trees
(CSV + PNG fixtures mirroring the reference layouts, datasets.py:22-135,
392-531)."""

import os

import numpy as np
import pytest

from causal_gen_tpu.config import get_config


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def ukbb_tree(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(0)
    root = tmp_path / "ukbb"
    (root / "brain_csv").mkdir(parents=True)
    (root / "thumbs_192x192").mkdir()
    n = 12
    eids = np.arange(1000, 1000 + n)
    mri_seq = rng.integers(0, 2, n).astype(float)
    df = pd.DataFrame({
        "eid": eids,
        "mri_seq": mri_seq,
        "age": rng.uniform(44, 73, n),
        "brain_volume": rng.uniform(9e5, 1.6e6, n),
        "ventricle_volume": rng.uniform(8e3, 1.5e5, n),
        "sex": rng.integers(0, 2, n).astype(float),
    })
    for split in ["train", "valid", "test"]:
        df.to_csv(root / "brain_csv" / f"{split}.csv", index=False)
    for eid, m in zip(eids, mri_seq):
        name = f"{int(eid)}_{'T1' if m == 0.0 else 'T2_FLAIR'}_unbiased_brain_rigid_to_mni.png"
        _write_png(
            str(root / "thumbs_192x192" / name),
            rng.integers(0, 256, (192, 192), dtype=np.uint8),
        )
    return str(root)


class TestUKBBBuilder:
    def test_builds_and_normalizes(self, ukbb_tree):
        from causal_gen_tpu.data.datasets import ukbb

        cfg = get_config("ukbb64", input_res=64)
        dsets = ukbb(cfg, data_dir=ukbb_tree)
        assert len(dsets["train"]) == 12
        b = dsets["train"].batch(np.arange(4), np.random.default_rng(0))
        assert b["x"].shape == (4, 64, 64, 1)
        assert b["pa"].shape == (4, 4)  # mri_seq, bvol, vvol, sex
        # log_standard: roughly standardized continuous attrs
        assert abs(float(dsets["train"].attrs["brain_volume"].mean())) < 1.0
        ev = dsets["valid"].batch(np.arange(4))
        assert ev["x"].shape == (4, 64, 64, 1)

    def test_neg11_norm(self, ukbb_tree):
        from causal_gen_tpu.data.datasets import ukbb

        cfg = get_config(
            "ukbb64", input_res=64, context_norm="[-1,1]",
            parents_x=("mri_seq", "age", "brain_volume", "ventricle_volume", "sex"),
            context_dim=5,
        )
        dsets = ukbb(cfg, data_dir=ukbb_tree)
        for k in ("age", "brain_volume", "ventricle_volume"):
            v = dsets["train"].attrs[k]
            assert np.abs(v).max() <= 1.0 + 1e-5


@pytest.fixture
def mimic_tree(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(1)
    root = tmp_path / "mimic"
    (root / "meta").mkdir(parents=True)
    (root / "data").mkdir()
    n = 10
    rows = []
    for i in range(n):
        fname = f"img_{i}.png"
        _write_png(
            str(root / "data" / fname),
            rng.integers(0, 256, (64, 64), dtype=np.uint8),
        )
        rows.append({
            "path_preproc": fname,
            "disease": "Pleural Effusion" if i % 3 == 0 else (
                "No Finding" if i % 3 == 1 else "Other"
            ),
            "age": float(rng.uniform(20, 90)),
            "sex_label": int(rng.integers(0, 2)),
            "race_label": int(rng.integers(0, 3)),
        })
    df = pd.DataFrame(rows)
    for split in ["train", "valid", "test"]:
        df.to_csv(root / "meta" / f"{split}.csv", index=False)
    return str(root)


class TestMIMICBuilder:
    def test_builds_filters_and_encodes(self, mimic_tree):
        from causal_gen_tpu.data.datasets import mimic

        cfg = get_config(
            "mimic192", input_res=64,
            parents_x=("age", "race", "sex", "finding"), context_dim=6,
        )
        dsets = mimic(cfg, data_dir=mimic_tree)
        # 'Other' rows filtered out (reference datasets.py:449-453)
        assert len(dsets["train"]) == 7
        b = dsets["train"].batch(np.arange(4), concat_pa=False)
        assert b["x"].shape == (4, 64, 64, 1)
        assert b["race"].shape == (4, 3)  # one-hot
        assert np.abs(b["age"]).max() <= 1.0  # age -> [-1,1]
        assert set(np.unique(b["finding"])) <= {0.0, 1.0}
        b2 = dsets["train"].batch(np.arange(4))
        assert b2["pa"].shape == (4, 6)  # 1 + 3 + 1 + 1


@pytest.fixture
def cmnist_tree(tmp_path):
    rng = np.random.default_rng(2)
    root = tmp_path / "cmnist"
    n = 40
    for split in ["train", "test"]:
        sub = root / split
        sub.mkdir(parents=True)
        np.save(sub / "images.npy",
                rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8))
        np.save(sub / "parents.npy", np.array(
            {"digit": rng.integers(0, 10, n), "colour": rng.integers(0, 10, n)},
            dtype=object,
        ))
    return str(root)


class TestCmnistCorruption:
    def test_corrupt_p_flips_train_labels_only(self, cmnist_tree):
        """corrupt_p flips exactly that fraction of train digit AND colour
        labels to a DIFFERENT class; eval splits stay clean (reference
        datasets.py:325-343)."""
        from causal_gen_tpu.data.datasets import cmnist

        cfg = get_config("cmnist", input_res=32)
        clean = cmnist(cfg, data_dir=cmnist_tree, corrupt_p=0.0)
        noisy = cmnist(cfg, data_dir=cmnist_tree, corrupt_p=0.5)
        d0 = np.argmax(clean["train"].attrs["digit"], -1)
        d1 = np.argmax(noisy["train"].attrs["digit"], -1)
        c0 = np.argmax(clean["train"].attrs["colour"], -1)
        c1 = np.argmax(noisy["train"].attrs["colour"], -1)
        n = len(d0)
        assert (d0 != d1).sum() == n // 2  # exactly the fraction, never same
        assert (c0 != c1).sum() == n // 2
        # deterministic given the seed
        again = cmnist(cfg, data_dir=cmnist_tree, corrupt_p=0.5)
        assert np.array_equal(noisy["train"].attrs["digit"],
                              again["train"].attrs["digit"])
        # test split untouched
        assert np.array_equal(clean["test"].attrs["digit"],
                              noisy["test"].attrs["digit"])
