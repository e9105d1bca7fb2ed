"""Composable wrapper datasets."""

import numpy as np

from fbk_fairseq_st_tpu.data import (
    AppendTokenDataset,
    PrependTokenDataset,
    ResamplingDataset,
    SortDataset,
    StripTokenDataset,
    TruncateDataset,
)


class _Toks:
    def __init__(self, items):
        self.items = [np.asarray(i) for i in items]
        self.sizes = np.array([len(i) for i in items])

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def num_tokens(self, i):
        return len(self.items[i])

    def size(self, i):
        return len(self.items[i])

    def ordered_indices(self):
        return np.arange(len(self))


def test_prepend_append_truncate_strip():
    ds = _Toks([[4, 5, 2], [6, 2]])
    p = PrependTokenDataset(ds, 0)
    np.testing.assert_array_equal(p[0], [0, 4, 5, 2])
    assert p.size(0) == 4
    a = AppendTokenDataset(ds, 7)
    np.testing.assert_array_equal(a[1], [6, 2, 7])
    t = TruncateDataset(ds, 2)
    np.testing.assert_array_equal(t[0], [4, 5])
    np.testing.assert_array_equal(t.sizes, [2, 2])
    s = StripTokenDataset(ds, 2)
    np.testing.assert_array_equal(s[0], [4, 5])


def test_resampling_deterministic_per_epoch():
    ds = _Toks([[i] for i in range(10)])
    r1 = ResamplingDataset(ds, size_ratio=0.5, seed=3, epoch=1)
    r2 = ResamplingDataset(ds, size_ratio=0.5, seed=3, epoch=1)
    assert len(r1) == 5
    np.testing.assert_array_equal(r1._indices, r2._indices)
    r1.set_epoch(2)
    assert not np.array_equal(r1._indices, r2._indices)


def test_sort_dataset():
    ds = _Toks([[1], [2], [3]])
    order = SortDataset(ds, [np.array([3, 1, 2])]).ordered_indices()
    np.testing.assert_array_equal(order, [1, 2, 0])
