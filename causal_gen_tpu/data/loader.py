"""Host-side batch loader.

Replaces torch DataLoader + worker processes (reference train_setup.py:16-39,
train_pgm.py:252-310). Batching is a shuffled index permutation per epoch and
whole-batch numpy augmentation; the arrays are handed to JAX as uint8 and
normalized on-device. Deterministic given ``seed`` (one np.random.Generator
per loader, advanced per epoch), replacing torch's global-RNG worker seeding
(utils.py:26-29).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from causal_gen_tpu.data.datasets import ArrayDataset


class Loader:
    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        concat_pa: bool = True,
        max_batches: Optional[int] = None,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.concat_pa = concat_pa
        self.max_batches = max_batches  # cap for smoke/profiling runs
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.ds)
        n_b = n // self.bs if self.drop_last else -(-n // self.bs)
        return min(n_b, self.max_batches) if self.max_batches else n_b

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.bs) * self.bs if self.drop_last else n
        for k, i in enumerate(range(0, stop, self.bs)):
            if self.max_batches is not None and k >= self.max_batches:
                return
            idx = order[i : i + self.bs]
            yield self.ds.batch(idx, rng=self._rng, concat_pa=self.concat_pa)


def setup_loaders(
    datasets: Dict[str, ArrayDataset],
    batch_size: int,
    seed: int = 0,
    concat_pa: bool = True,
    max_batches: Optional[int] = None,
) -> Dict[str, Loader]:
    return {
        split: Loader(
            ds,
            batch_size,
            shuffle=(split == "train"),
            drop_last=(split == "train"),
            seed=seed + i,
            concat_pa=concat_pa,
            max_batches=max_batches,
        )
        for i, (split, ds) in enumerate(datasets.items())
    }
