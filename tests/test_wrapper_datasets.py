"""Composable wrapper datasets."""

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# round-2 wrappers (reference lru_cache/replace/roll/subsample/colorize/
# pad/prepend/list/num_samples/numel/transform_eos/multi_corpus_sampled)
# ---------------------------------------------------------------------------


def test_replace_dataset():
    from fbk_fairseq_st_tpu.data.wrappers import ReplaceDataset

    base = _Toks([[5, 6, 5, 7], [6, 6, 6]])
    ds = ReplaceDataset(base, {6: 9}, offsets=[1])
    # offset 1: replacements start at index 1
    assert ds[0].tolist() == [5, 9, 5, 7]
    assert ds[1].tolist() == [6, 9, 9]


def test_roll_dataset():
    from fbk_fairseq_st_tpu.data.wrappers import RollDataset

    base = _Toks([[1, 2, 3, 4]])
    assert RollDataset(base, 1)[0].tolist() == [4, 1, 2, 3]


def test_subsample_dataset():
    from fbk_fairseq_st_tpu.data.wrappers import SubsampleDataset

    base = _Toks([[i] * (i + 1) for i in range(10)])
    ds = SubsampleDataset(base, 0.5, seed=1)
    assert len(ds) == 5
    assert len(ds.sizes) == 5
    order = ds.ordered_indices()
    assert sorted(order.tolist()) == list(range(5))


def test_pad_and_numel_and_num_samples():
    import numpy as np

    from fbk_fairseq_st_tpu.data.wrappers import (
        NumelDataset,
        NumSamplesDataset,
        RightPadDataset,
    )

    base = _Toks([[4, 5], [6]])
    padded = RightPadDataset(base, pad_idx=1).collater([base[0], base[1]])
    assert padded.shape == (2, 2)
    assert padded[1].tolist() == [6, 1]
    numel = NumelDataset(base, reduce=True)
    assert numel.collater([numel[0], numel[1]]) == 3
    ns = NumSamplesDataset()
    assert ns.collater([ns[0], ns[1], ns[2]]) == 3


def test_lru_cache_and_list_dataset():
    from fbk_fairseq_st_tpu.data.wrappers import LRUCacheDataset, ListDataset

    calls = []

    class Counting(_Toks):
        def __getitem__(self, i):
            calls.append(i)
            return super().__getitem__(i)

    ds = LRUCacheDataset(Counting([[1], [2]]))
    ds[0], ds[0], ds[1]
    assert calls == [0, 1]

    ld = ListDataset(["a", "b"], sizes=[1, 1])
    assert list(ld) == ["a", "b"]
    assert ld.collater(["a"]) == ["a"]
    assert ld.size(0) == 1


def test_prepend_dataset_injects_token():
    from fbk_fairseq_st_tpu.data.wrappers import PrependDataset

    base = _Toks([[2, 5, 6]])
    ds = PrependDataset(
        base, lambda d, i: 7, ensure_first_token_is=2
    )
    assert ds[0].tolist() == [7, 5, 6]
    assert base[0][0] == 2  # original untouched


def test_transform_eos_dataset():
    import numpy as np

    from fbk_fairseq_st_tpu.data.wrappers import TransformEosDataset

    eos = 2

    class PairDataset:
        def __init__(self):
            self.items = [
                {"id": 0,
                 "source": np.array([4, 5, eos]),
                 "target": np.array([6, eos])},
            ]

        def __getitem__(self, i):
            return self.items[i]

        def __len__(self):
            return 1

        def collater(self, samples, **kw):
            return samples

        def size(self, i):
            return (3, 2)

        def num_tokens(self, i):
            return 3

        def ordered_indices(self):
            return np.arange(1)

        @property
        def sizes(self):
            return np.array([3])

    ds = TransformEosDataset(
        PairDataset(), eos,
        remove_eos_from_src=True, append_eos_to_tgt=False,
    )
    out = ds.collater([ds[0]])
    assert out[0]["source"].tolist() == [4, 5]
    assert ds.size(0) == (2, 2)

    with pytest.raises(ValueError):
        TransformEosDataset(
            PairDataset(), eos,
            append_eos_to_src=True, remove_eos_from_src=True,
        )


def test_multi_corpus_sampled_dataset():
    from collections import OrderedDict

    from fbk_fairseq_st_tpu.data.wrappers import MultiCorpusSampledDataset

    class _Collatable(_Toks):
        def collater(self, samples, **kw):
            return samples

    a = _Collatable([[1, 1], [2, 2, 2]])
    b = _Collatable([[3]])
    ds = MultiCorpusSampledDataset(
        OrderedDict([("a", a), ("b", b)]),
        sampling_func=lambda keys: "b",
    )
    assert len(ds) == 3
    ds.ordered_indices()
    item = ds[2]  # index wraps modulo each corpus length
    assert set(item.keys()) == {"a", "b"}
    batch = ds.collater([ds[0], ds[1]])
    assert all(x.tolist() == [3] for x in batch)
    assert ds.num_tokens(0) >= 1


def test_colorize_dataset():
    import numpy as np

    from fbk_fairseq_st_tpu.data.wrappers import ColorizeDataset

    class Inner(_Toks):
        def collater(self, samples, **kw):
            return {"net_input": {}, "id": [s["id"] for s in samples]}

    inner = Inner([[1], [2]])
    ds = ColorizeDataset(inner, lambda d, i: int(i) * 10)
    batch = ds.collater([{"id": 0}, {"id": 1}])
    assert batch["net_input"]["colors"].tolist() == [0, 10]
