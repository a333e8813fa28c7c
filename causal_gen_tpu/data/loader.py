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


class PrefetchLoader:
    """Double-buffered background prefetch over a Loader.

    While the device runs step N, a worker thread assembles batch N+1 (the
    numpy fancy-indexing + native augment path releases the GIL), hiding
    host batch-assembly latency behind device compute — the role of the
    reference's torch DataLoader worker processes (train_setup.py:16-39),
    without multiprocess serialization. Iteration order and RNG consumption
    are identical to the wrapped loader's.
    """

    def __init__(self, loader: Loader, depth: int = 2):
        self.loader = loader
        self.depth = depth
        self.ds = loader.ds  # passthrough used by eval helpers

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()

        def worker():
            try:
                for batch in self.loader:
                    q.put(batch)
                q.put(_END)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()


def setup_loaders(
    datasets: Dict[str, ArrayDataset],
    batch_size: int,
    seed: int = 0,
    concat_pa: bool = True,
    max_batches: Optional[int] = None,
    prefetch: bool = True,
) -> Dict[str, Loader]:
    def build(split, ds, i):
        loader = Loader(
            ds,
            batch_size,
            shuffle=(split == "train"),
            drop_last=(split == "train"),
            seed=seed + i,
            concat_pa=concat_pa,
            max_batches=max_batches,
        )
        # overlap train batch assembly with device compute
        return PrefetchLoader(loader) if prefetch and split == "train" else loader

    return {
        split: build(split, ds, i)
        for i, (split, ds) in enumerate(datasets.items())
    }
