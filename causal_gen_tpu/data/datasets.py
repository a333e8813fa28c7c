"""Datasets: Morpho-MNIST, Colour-MNIST, UK Biobank, MIMIC-CXR.

Port target: reference src/datasets.py (UKBBDataset 22-86, MorphoMNIST
202-273, ColourMNIST 307-360, MIMIC 435-493, builders 101-135, 276-304,
363-389, 507-531).

TPU-native redesign: each dataset is materialized once as a dict of contiguous
numpy arrays (images uint8 NHWC + per-attribute parent arrays), and batching /
augmentation operate on whole batches (data/augment.py) instead of per-sample
transforms in DataLoader worker processes. Batches cross to the device as
uint8 and are normalized to [-1,1] on-device inside the jitted step (the
reference normalizes on host, trainer.py:17).

The data contract matches the reference (SURVEY.md §1 L1): each batch is
{"x": uint8 (B,H,W,C), "pa": float32 (B,context_dim)} when concat_pa, else
{"x", <parent_name>: value, ...}; parent concat order == cfg.parents_x order
(digit/colour as one-hot).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from causal_gen_tpu.config import Config
from causal_gen_tpu.data import augment
from causal_gen_tpu.data.idx import load_idx
from causal_gen_tpu.utils.normalization import (
    MORPHOMNIST_MIN_MAX,
    get_attr_max_min,
    log_standardize,
    normalize,
)


def one_hot_np(x: np.ndarray, num_classes: int) -> np.ndarray:
    return np.eye(num_classes, dtype=np.float32)[np.asarray(x, np.int64)]


@dataclass
class ArrayDataset:
    """In-memory dataset: images + named parent attributes.

    ``attrs`` values are float32 with shape (N,) for scalars/binaries or
    (N, K) for one-hots; ``columns`` fixes the pa concatenation order.
    """

    images: np.ndarray  # (N, H, W, C) uint8
    attrs: Dict[str, np.ndarray]
    columns: Tuple[str, ...]
    transform: Optional[Callable] = None  # (rng, x_batch) -> x_batch
    # declarative augmentation spec; when set it takes precedence over
    # ``transform`` and dispatches to the fused native C++ path
    # (data/native.py) with a numpy fallback:
    #   ("random_crop_flip", (out_h, out_w), (pad_h, pad_w), hflip_p)
    #   ("center_pad", pad)
    aug: Optional[Tuple] = None

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def pa(self) -> np.ndarray:
        """(N, context_dim) concatenated parents in ``columns`` order."""
        cols = []
        for k in self.columns:
            v = self.attrs[k]
            cols.append(v[:, None] if v.ndim == 1 else v)
        return np.concatenate(cols, axis=1).astype(np.float32)

    def batch(
        self, idx: np.ndarray, rng: Optional[np.random.Generator] = None,
        concat_pa: bool = True,
    ) -> Dict[str, np.ndarray]:
        rng = rng if rng is not None else np.random.default_rng(0)
        if self.aug is not None and self.aug[0] == "random_crop_flip":
            from causal_gen_tpu.data import native

            _, size, padding, hflip_p = self.aug
            x = native.gather_crop_flip(
                self.images, np.asarray(idx), rng, size, padding, hflip_p
            )
            if x is None:  # numpy fallback
                x = self.images[idx]
                x = augment.random_crop(rng, x, size, padding)
                x = augment.random_hflip(rng, x, hflip_p)
        elif self.aug is not None and self.aug[0] == "center_pad":
            x = augment.center_pad(self.images[idx], self.aug[1])
        else:
            x = self.images[idx]
            if self.transform is not None:
                x = self.transform(rng, x)
        out: Dict[str, np.ndarray] = {"x": x}
        if concat_pa:
            out["pa"] = self.pa[idx]
        else:
            for k in self.columns:
                v = self.attrs[k][idx]
                out[k] = v[:, None].astype(np.float32) if v.ndim == 1 else v.astype(np.float32)
        return out


# ---------------------------------------------------------------------------
# Morpho-MNIST (reference datasets.py:202-304)
# ---------------------------------------------------------------------------


def _morphomnist_paths(root: str, train: bool) -> Tuple[str, str, str]:
    prefix = "train" if train else "t10k"
    return (
        os.path.join(root, f"{prefix}-images-idx3-ubyte.gz"),
        os.path.join(root, f"{prefix}-labels-idx1-ubyte.gz"),
        os.path.join(root, f"{prefix}-morpho.csv"),
    )


def load_morphomnist(
    root: str, train: bool, columns: List[str]
) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
    import pandas as pd

    img_p, lab_p, met_p = _morphomnist_paths(root, train)
    images = load_idx(img_p)
    labels = load_idx(lab_p)
    df = pd.read_csv(met_p, usecols=["index"] + columns, index_col="index")
    metrics = {k: df[k].to_numpy(np.float32) for k in columns}
    return images, labels, metrics


def morphomnist(cfg: Config, data_dir: Optional[str] = None) -> Dict[str, ArrayDataset]:
    """Builds train/valid/test (test == valid, reference datasets.py:297)."""
    root = data_dir or cfg.data_dir
    cols_not_digit = [c for c in cfg.parents_x if c != "digit"]

    def build(train: bool, transform) -> ArrayDataset:
        images, labels, metrics = load_morphomnist(root, train, cols_not_digit)
        attrs: Dict[str, np.ndarray] = {}
        for k, v in metrics.items():
            lo, hi = MORPHOMNIST_MIN_MAX[k]
            if cfg.context_norm == "[-1,1]":
                v = normalize(v, x_min=lo, x_max=hi)
            elif cfg.context_norm == "[0,1]":
                v = normalize(v, x_min=lo, x_max=hi, zero_one=True)
            attrs[k] = v.astype(np.float32)
        attrs["digit"] = one_hot_np(labels, 10)
        return ArrayDataset(
            images=images[..., None],  # (N,28,28,1)
            attrs=attrs,
            columns=tuple(cfg.parents_x),
            transform=transform,
        )

    res = (cfg.input_res, cfg.input_res)
    have_train = os.path.exists(_morphomnist_paths(root, True)[0])
    train_ds = build(True, None) if have_train else build(False, None)
    train_ds.aug = ("random_crop_flip", res, (cfg.pad, cfg.pad), 0.0)
    eval_ds = build(False, None)
    eval_ds.aug = ("center_pad", 2)
    return {"train": train_ds, "valid": eval_ds, "test": eval_ds}


# ---------------------------------------------------------------------------
# Colour-MNIST (reference datasets.py:307-389)
# ---------------------------------------------------------------------------


def cmnist(
    cfg: Config, data_dir: Optional[str] = None, corrupt_p: Optional[float] = None,
    seed: int = 0,
) -> Dict[str, ArrayDataset]:
    root = data_dir or cfg.data_dir
    corrupt_p = cfg.corrupt_p if corrupt_p is None else corrupt_p

    def build(train: bool, transform) -> ArrayDataset:
        sub = os.path.join(root, "train" if train else "test")
        images = np.load(os.path.join(sub, "images.npy"))
        parents = np.load(os.path.join(sub, "parents.npy"), allow_pickle=True).item()
        digit = np.asarray(parents["digit"], np.int64)
        colour = np.asarray(parents["colour"], np.int64)
        if train and corrupt_p > 0:
            # corrupt first corrupt_p fraction of labels to a different class
            # (reference datasets.py:325-343)
            rng = np.random.default_rng(seed)
            n_c = int(corrupt_p * len(images))
            idx = rng.permutation(len(images))[:n_c]
            for arr in (digit, colour):
                shift = rng.integers(1, 10, size=n_c)  # never 0 => always changed
                arr[idx] = (arr[idx] + shift) % 10
        attrs = {"digit": one_hot_np(digit, 10), "colour": one_hot_np(colour, 10)}
        if images.ndim == 3:
            images = images[..., None]
        if images.shape[-1] not in (1, 3):  # NCHW on disk -> NHWC
            images = np.transpose(images, (0, 2, 3, 1))
        return ArrayDataset(
            images=images.astype(np.uint8),
            attrs=attrs,
            columns=tuple(cfg.parents_x),
            transform=transform,
        )

    res = (cfg.input_res, cfg.input_res)
    train_ds = build(True, None)
    train_ds.aug = ("random_crop_flip", res, (cfg.pad, cfg.pad), 0.0)
    eval_ds = build(False, None)
    eval_ds.aug = ("center_pad", 2)
    return {"train": train_ds, "valid": eval_ds, "test": eval_ds}


# ---------------------------------------------------------------------------
# UK Biobank brain MRI (reference datasets.py:22-135)
# ---------------------------------------------------------------------------


def _load_png_batch(paths: List[str], res: int) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(paths), res, res), np.uint8)
    for i, p in enumerate(paths):
        img = Image.open(p)
        if img.size != (res, res):
            img = img.resize((res, res), Image.BILINEAR)
        out[i] = np.asarray(img, np.uint8)
    return out


def ukbb(cfg: Config, data_dir: Optional[str] = None) -> Dict[str, ArrayDataset]:
    import pandas as pd

    root = data_dir or cfg.data_dir
    csv_dir = os.path.join(root, "brain_csv")
    res = cfg.input_res

    def build(split: str, train: bool) -> ArrayDataset:
        df = pd.read_csv(os.path.join(csv_dir, split + ".csv"))
        columns = list(cfg.parents_x)
        attrs: Dict[str, np.ndarray] = {}
        for k in columns:
            v = df[k].to_numpy(np.float32)
            if k in ("age", "brain_volume", "ventricle_volume"):
                hi, lo = get_attr_max_min(k)
                if cfg.context_norm == "[-1,1]":
                    v = normalize(v, x_min=lo, x_max=hi)
                elif cfg.context_norm == "[0,1]":
                    v = normalize(v, x_min=lo, x_max=hi, zero_one=True)
                elif cfg.context_norm == "log_standard":
                    v = log_standardize(v)
            attrs[k] = v.astype(np.float32)
        mri_seq = df["mri_seq"].to_numpy()
        paths = [
            os.path.join(
                root,
                "thumbs_192x192",
                f"{int(eid)}_{'T1' if m == 0.0 else 'T2_FLAIR'}"
                "_unbiased_brain_rigid_to_mni.png",
            )
            for eid, m in zip(df["eid"], mri_seq)
        ]
        images = _load_png_batch(paths, res)[..., None]
        ds = ArrayDataset(images=images, attrs=attrs, columns=tuple(columns))
        if train:
            # torchvision RandomCrop padding=[2*pad, pad]: left/right by 2*pad,
            # top/bottom by pad (reference datasets.py:106-109)
            ds.aug = ("random_crop_flip", (res, res), (cfg.pad, 2 * cfg.pad), cfg.hflip)
        return ds

    return {s: build(s, s == "train") for s in ["train", "valid", "test"]}


# ---------------------------------------------------------------------------
# MIMIC-CXR (reference datasets.py:392-531)
# ---------------------------------------------------------------------------


def mimic(cfg: Config, data_dir: Optional[str] = None) -> Dict[str, ArrayDataset]:
    import pandas as pd
    from PIL import Image

    root = data_dir or cfg.data_dir
    res = cfg.input_res

    def build(split: str) -> ArrayDataset:
        df = pd.read_csv(os.path.join(root, "meta", f"{split}.csv"))
        df = df[
            (df["disease"] == "No Finding") | (df["disease"] == "Pleural Effusion")
        ].reset_index(drop=True)
        images = np.empty((len(df), res, res), np.uint8)
        for i in range(len(df)):
            img = Image.open(os.path.join(root, "data", df.iloc[i]["path_preproc"]))
            if img.size != (res, res):
                img = img.resize((res, res), Image.BILINEAR)
            images[i] = np.asarray(img, np.uint8)
        finding = (df["disease"] == "Pleural Effusion").to_numpy(np.float32)
        # preprocess_mimic (reference datasets.py:496-504): age -> [-1,1],
        # race -> one-hot(3)
        attrs = {
            "age": (df["age"].to_numpy(np.float32) / 100 * 2 - 1),
            "sex": df["sex_label"].to_numpy(np.float32),
            "race": one_hot_np(df["race_label"].to_numpy(np.int64), 3),
            "finding": finding,
        }
        return ArrayDataset(
            images=images[..., None],
            attrs=attrs,
            columns=tuple(cfg.parents_x),
            transform=None,
        )

    return {s: build(s) for s in ["train", "valid", "test"]}


# ---------------------------------------------------------------------------
# Synthetic 3-D volumes (no reference counterpart: the reference is 2-D only)
# ---------------------------------------------------------------------------

VOL3D_MIN_MAX = {"radius": (0.15, 0.40), "intensity": (96.0, 255.0)}


def make_vol3d(
    n: int, res: int, seed: int = 0
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Deterministic synthetic spheres with a causal parent pair.

    SCM (the volumetric analog of Morpho-MNIST's thickness -> intensity,
    reference datasets.py:202-304): radius ~ U(0.15, 0.40) (fraction of the
    half-side), intensity = 255 - 300*(radius-0.15) + N(0, 8) clipped to
    [96, 255] — larger structures image dimmer, so do(radius) has a visible
    downstream effect on brightness. Voxels: intensity * sigmoid((r - d)/s)
    with a jittered center, quantized to uint8.
    """
    rng = np.random.default_rng(seed)
    radius = rng.uniform(*VOL3D_MIN_MAX["radius"], size=n).astype(np.float32)
    intensity = 255.0 - 300.0 * (radius - 0.15) + rng.normal(0.0, 8.0, size=n)
    intensity = np.clip(intensity, *VOL3D_MIN_MAX["intensity"]).astype(np.float32)
    center = rng.uniform(-0.1, 0.1, size=(n, 3)).astype(np.float32)

    ax = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    grid = np.stack([gx, gy, gz])  # (3, res, res, res)
    sharp = 2.0 / res  # ~1 voxel soft edge
    vols = np.empty((n, res, res, res, 1), np.uint8)
    for i in range(n):
        d = np.sqrt(((grid - center[i][:, None, None, None]) ** 2).sum(0))
        soft = 1.0 / (1.0 + np.exp(-(radius[i] - d) / sharp))
        vols[i, ..., 0] = np.clip(intensity[i] * soft, 0, 255).astype(np.uint8)
    return vols, {"radius": radius, "intensity": intensity}


def vol3d(cfg: Config, data_dir: Optional[str] = None) -> Dict[str, ArrayDataset]:
    """Synthetic volumetric dataset builder (generated, no files needed)."""

    def build(n: int, seed: int) -> ArrayDataset:
        vols, raw = make_vol3d(n, cfg.input_res, seed=seed)
        attrs = {}
        for k, v in raw.items():
            lo, hi = VOL3D_MIN_MAX[k]
            attrs[k] = normalize(v, x_min=lo, x_max=hi).astype(np.float32)
        return ArrayDataset(
            images=vols, attrs=attrs, columns=tuple(cfg.parents_x),
        )

    return {
        "train": build(512, cfg.seed),
        "valid": build(128, cfg.seed + 1),
        "test": build(128, cfg.seed + 2),
    }


BUILDERS = {
    "morphomnist": morphomnist,
    "cmnist": cmnist,
    "ukbb": ukbb,
    "mimic": mimic,
    "vol3d": vol3d,
}


def setup_datasets(cfg: Config, data_dir: Optional[str] = None) -> Dict[str, ArrayDataset]:
    """Dataset dispatch keyed on config name prefix (reference
    train_setup.py:16-28)."""
    for prefix, builder in BUILDERS.items():
        if cfg.name.startswith(prefix) or (
            prefix == "mimic" and cfg.name.startswith("mimic")
        ):
            return builder(cfg, data_dir)
    raise KeyError(f"no dataset builder for config '{cfg.name}'")
