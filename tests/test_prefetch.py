"""PrefetchLoader must be a transparent wrapper: identical batches in
identical order, error propagation, and passthrough of the dataset handle."""

import numpy as np
import pytest

from causal_gen_tpu.data.datasets import ArrayDataset
from causal_gen_tpu.data.loader import Loader, PrefetchLoader


def make_ds(n=40):
    return ArrayDataset(
        images=np.arange(n * 4 * 4 * 1, dtype=np.uint8).reshape(n, 4, 4, 1),
        attrs={"a": np.arange(n, dtype=np.float32)},
        columns=("a",),
    )


class TestPrefetchLoader:
    def test_identical_batches_and_order(self):
        ds = make_ds()
        direct = list(Loader(ds, 8, seed=3))
        wrapped = list(PrefetchLoader(Loader(ds, 8, seed=3)))
        assert len(direct) == len(wrapped) == 5
        for d, w in zip(direct, wrapped):
            for k in d:
                np.testing.assert_array_equal(d[k], w[k])

    def test_len_and_ds_passthrough(self):
        ds = make_ds()
        pf = PrefetchLoader(Loader(ds, 8, max_batches=2))
        assert len(pf) == 2
        assert pf.ds is ds
        assert len(list(pf)) == 2

    def test_worker_error_propagates(self):
        class Boom:
            ds = None

            def __iter__(self):
                yield {"x": np.zeros(1)}
                raise RuntimeError("boom")

            def __len__(self):
                return 1

        pf = PrefetchLoader.__new__(PrefetchLoader)
        pf.loader = Boom()
        pf.depth = 2
        pf.ds = None
        it = iter(pf)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)
