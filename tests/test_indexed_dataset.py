"""Indexed dataset IO tests: round-trips plus byte-level format checks
against the reference TNT / MMap specs (fairseq/data/indexed_dataset.py)."""

import struct

import numpy as np

from fbk_fairseq_st_tpu.data import (
    AudioIndexedDatasetBuilder,
    FilterBanksDataset,
    IndexedDataset,
    IndexedDatasetBuilder,
    MMapIndexedDataset,
    MMapIndexedDatasetBuilder,
    infer_dataset_impl,
    load_indexed_dataset,
)


def _write_tnt_tokens(prefix, items):
    b = IndexedDatasetBuilder(str(prefix) + ".bin")
    for it in items:
        b.add_item(np.asarray(it, dtype=np.int64))
    b.finalize(str(prefix) + ".idx")


def test_tnt_token_roundtrip(tmp_path):
    items = [[5, 6, 7, 2], [9, 2], [4, 4, 4, 4, 4, 2]]
    prefix = tmp_path / "train.en"
    _write_tnt_tokens(prefix, items)
    ds = IndexedDataset(str(prefix), fix_lua_indexing=True)
    assert len(ds) == 3
    for i, it in enumerate(items):
        np.testing.assert_array_equal(ds[i], np.asarray(it))
        assert ds.size(i) == len(it)


def test_tnt_header_bytes(tmp_path):
    """The .idx header must match the reference byte layout exactly."""
    prefix = tmp_path / "x"
    _write_tnt_tokens(prefix, [[1, 2, 3]])
    raw = open(str(prefix) + ".idx", "rb").read()
    assert raw[:8] == b"TNTIDX\x00\x00"
    assert struct.unpack("<Q", raw[8:16]) == (1,)
    code, esize = struct.unpack("<QQ", raw[16:32])
    assert code == 4 and esize == 4  # int32 tokens
    n, s = struct.unpack("<QQ", raw[32:48])
    assert n == 1 and s == 1
    dim_offsets = np.frombuffer(raw[48:64], dtype=np.int64)
    np.testing.assert_array_equal(dim_offsets, [0, 1])
    # data stored with the +1 Lua shift
    data = np.fromfile(str(prefix) + ".bin", dtype=np.int32)
    np.testing.assert_array_equal(data, [2, 3, 4])


def test_audio_fbank_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    items = [rng.randn(t, 40).astype(np.float32) for t in (17, 31, 5)]
    prefix = tmp_path / "train.npz"
    b = AudioIndexedDatasetBuilder(str(prefix) + ".bin")
    for it in items:
        b.add_item(it)
    b.finalize(str(prefix) + ".idx")

    ds = FilterBanksDataset(str(prefix))
    assert len(ds) == 3
    assert ds.n_features == 40
    for i, it in enumerate(items):
        np.testing.assert_array_equal(ds[i], it)  # byte-exact, no Lua shift
        assert ds.size(i) == it.shape[0]
        assert ds.num_tokens(i) == it.shape[0]


def test_mmap_roundtrip_and_header(tmp_path):
    items = [[10, 20, 30], [40, 2]]
    prefix = tmp_path / "train.de"
    b = MMapIndexedDatasetBuilder(str(prefix) + ".bin", dtype=np.int32)
    for it in items:
        b.add_item(np.asarray(it))
    b.finalize(str(prefix) + ".idx")

    raw = open(str(prefix) + ".idx", "rb").read()
    assert raw[:9] == b"MMIDIDX\x00\x00"
    assert struct.unpack("<Q", raw[9:17]) == (1,)
    assert raw[17] == 4  # int32 code
    (n,) = struct.unpack("<Q", raw[18:26])
    assert n == 2
    sizes = np.frombuffer(raw[26:34], dtype=np.int32)
    np.testing.assert_array_equal(sizes, [3, 2])
    pointers = np.frombuffer(raw[34:50], dtype=np.int64)
    np.testing.assert_array_equal(pointers, [0, 12])

    ds = MMapIndexedDataset(str(prefix))
    for i, it in enumerate(items):
        np.testing.assert_array_equal(ds[i], np.asarray(it))  # no Lua shift


def test_infer_impl_and_loader(tmp_path):
    prefix = tmp_path / "valid.en"
    _write_tnt_tokens(prefix, [[7, 8, 2]])
    assert infer_dataset_impl(str(prefix)) == "cached"
    ds = load_indexed_dataset(str(prefix))
    np.testing.assert_array_equal(ds[0], [7, 8, 2])

    prefix2 = tmp_path / "valid.de"
    b = MMapIndexedDatasetBuilder(str(prefix2) + ".bin")
    b.add_item(np.array([1, 2, 3]))
    b.finalize(str(prefix2) + ".idx")
    assert infer_dataset_impl(str(prefix2)) == "mmap"
    ds2 = load_indexed_dataset(str(prefix2))
    np.testing.assert_array_equal(ds2[0], [1, 2, 3])


def test_merge_file(tmp_path):
    p1, p2 = tmp_path / "a", tmp_path / "b"
    _write_tnt_tokens(p1, [[1, 2]])
    _write_tnt_tokens(p2, [[3, 4, 5]])
    b = IndexedDatasetBuilder(str(tmp_path / "m") + ".bin")
    b.add_item(np.array([9]))
    b.merge_file_(str(p1))
    b.finalize(str(tmp_path / "m") + ".idx")
    ds = IndexedDataset(str(tmp_path / "m"), fix_lua_indexing=True)
    np.testing.assert_array_equal(ds[0], [9])
    np.testing.assert_array_equal(ds[1], [1, 2])


def test_cached_getitem_returns_fresh_copies(tmp_path):
    """In-place mutation of a returned item must not corrupt the cache
    (reference IndexedCachedDataset copies per access)."""
    import numpy as np

    from fbk_fairseq_st_tpu.data.indexed_dataset import (
        IndexedDataset,
        IndexedDatasetBuilder,
    )

    prefix = str(tmp_path / "data")
    b = IndexedDatasetBuilder(prefix + ".bin")
    b.add_item(np.array([5, 6, 7], np.int64))
    b.finalize(prefix + ".idx")
    ds = IndexedDataset(prefix)
    before = ds[0].copy()
    item = ds[0]
    item -= 5  # consumer mutates its copy
    again = ds[0]
    assert again.tolist() == before.tolist()
