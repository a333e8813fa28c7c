from causal_gen_tpu.data.datasets import (
    ArrayDataset,
    cmnist,
    mimic,
    morphomnist,
    setup_datasets,
    ukbb,
)
from causal_gen_tpu.data.loader import Loader, setup_loaders

__all__ = [
    "ArrayDataset",
    "Loader",
    "setup_loaders",
    "setup_datasets",
    "morphomnist",
    "cmnist",
    "ukbb",
    "mimic",
]
