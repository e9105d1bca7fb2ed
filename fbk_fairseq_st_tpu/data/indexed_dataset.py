"""Binary indexed dataset IO, byte-compatible with the reference formats.

The reference persists preprocessed corpora as ``<prefix>.bin`` +
``<prefix>.idx`` pairs in two formats (fairseq/data/indexed_dataset.py):

TNT ("lazy"/"cached") format — indexed_dataset.py:110-165, builder :285-345:
    idx:  b'TNTIDX\\x00\\x00' | <Q version=1 | <QQ dtype_code,element_size
          | <QQ n_items, n_sizes | int64[n+1] dim_offsets
          | int64[n+1] data_offsets (in elements) | int64[n_sizes] sizes
    bin:  raw C-order element stream.
    Items may be multi-dimensional: ``sizes[dim_offsets[i]:dim_offsets[i+1]]``
    is item i's shape — this is how 2-D float32 filterbank tensors are stored
    (examples/speech_recognition/preprocess_audio.py:44-59,
    data/fbank_dataset.py:97-152).
    NOTE the reference's *token* builder adds +1 to every value for Lua
    compatibility (indexed_dataset.py:305) and readers never subtract unless
    fix_lua_indexing — we reproduce the on-disk convention exactly so files
    interchange byte-for-byte. The audio builder does NOT add 1
    (preprocess_audio.py:48-59).

MMap format — indexed_dataset.py:352-520:
    idx:  b'MMIDIDX\\x00\\x00' | <Q version=1 | <B dtype_code | <Q n
          | int32[n] sizes | int64[n] pointers (byte offsets)
    bin:  raw C-order element stream.

Everything here is host-side NumPy (no torch): items are returned as
np.ndarray, feeding the bucketized batcher.
"""

from __future__ import annotations

import os
import shutil
import struct
import itertools
from functools import lru_cache
from typing import Optional

import numpy as np

from .dictionary import Dictionary

_TNT_MAGIC = b"TNTIDX\x00\x00"
_MMAP_MAGIC = b"MMIDIDX\x00\x00"

# dtype codes shared by both formats (reference indexed_dataset.py:83-92).
DTYPES = {
    1: np.uint8,
    2: np.int8,
    3: np.int16,
    4: np.int32,
    5: np.int64,
    6: np.float64,  # np.float in the reference (== float64 alias)
    7: np.float64,
    8: np.float32,
}

_ELEMENT_SIZES = {
    np.uint8: 1,
    np.int8: 1,
    np.int16: 2,
    np.int32: 4,
    np.int64: 8,
    np.float64: 8,
    np.float32: 4,
}


def dtype_code(dtype) -> int:
    for k, v in DTYPES.items():
        if v == dtype:
            return k
    raise ValueError(dtype)


def best_fitting_dtype(vocab_size: Optional[int] = None):
    # the reference picks uint16 for small vocabs (indexed_dataset.py:17-21)
    # but uint16 has no code in its own dtype table, so any such file would
    # be unreadable; int32 keeps files valid under the shared code table
    return np.int32


def index_file_path(prefix_path: str) -> str:
    return prefix_path + ".idx"


def data_file_path(prefix_path: str) -> str:
    return prefix_path + ".bin"


def infer_dataset_impl(path: str) -> Optional[str]:
    if IndexedRawTextDataset.exists(path):
        return "raw"
    if IndexedDataset.exists(path):
        with open(index_file_path(path), "rb") as f:
            magic = f.read(8)
            if magic == _TNT_MAGIC:
                return "cached"
            if magic == _MMAP_MAGIC[:8]:
                return "mmap"
            return None
    return None


def get_available_dataset_impl():
    return ["raw", "lazy", "cached", "mmap"]


def make_builder(out_file: str, impl: str, vocab_size: Optional[int] = None):
    if impl == "mmap":
        return MMapIndexedDatasetBuilder(
            out_file, dtype=best_fitting_dtype(vocab_size)
        )
    return IndexedDatasetBuilder(out_file)


def make_dataset(
    path: str,
    impl: str,
    fix_lua_indexing: bool = False,
    dictionary: Optional[Dictionary] = None,
):
    if impl == "raw" and IndexedRawTextDataset.exists(path):
        assert dictionary is not None
        return IndexedRawTextDataset(path, dictionary)
    elif impl in ("lazy", "cached") and IndexedDataset.exists(path):
        return IndexedDataset(path, fix_lua_indexing=fix_lua_indexing)
    elif impl == "mmap" and MMapIndexedDataset.exists(path):
        return MMapIndexedDataset(path)
    return None


def load_indexed_dataset(
    path: str, dictionary=None, dataset_impl=None, combine=False, default="cached"
):
    """Load (and optionally combine train, train1, ... shards of) a dataset.

    Token TNT datasets are read with ``fix_lua_indexing=True``, matching the
    reference load path (fairseq/data/data_utils.py:51-96).
    """
    datasets = []
    for k in itertools.count():  # unbounded, like the reference
        path_k = path + (str(k) if k > 0 else "")
        impl = dataset_impl or infer_dataset_impl(path_k) or default
        ds = make_dataset(
            path_k, impl, fix_lua_indexing=True, dictionary=dictionary
        )
        if ds is None:
            if k > 0:
                break
            return None
        datasets.append(ds)
        if not combine:
            break
    if len(datasets) == 1:
        return datasets[0]
    from .datasets import ConcatDataset

    return ConcatDataset(datasets)


def dataset_exists(path: str, impl: str) -> bool:
    if impl == "raw":
        return IndexedRawTextDataset.exists(path)
    if impl == "mmap":
        return MMapIndexedDataset.exists(path)
    if impl is None:  # infer: any known on-disk format
        return (
            IndexedDataset.exists(path)
            or MMapIndexedDataset.exists(path)
            or IndexedRawTextDataset.exists(path)
        )
    return IndexedDataset.exists(path)


class IndexedDataset:
    """Reader for the TNT format (token datasets return int64 arrays)."""

    def __init__(self, path: str, fix_lua_indexing: bool = False):
        self.path = path
        self.fix_lua_indexing = fix_lua_indexing
        self._mmap = None
        self.read_index(path)

    def read_index(self, path: str) -> None:
        with open(index_file_path(path), "rb") as f:
            magic = f.read(8)
            assert magic == _TNT_MAGIC, (
                "Index file doesn't match expected format (TNTIDX)."
            )
            version = struct.unpack("<Q", f.read(8))
            assert version == (1,)
            code, self.element_size = struct.unpack("<QQ", f.read(16))
            self.dtype = DTYPES[code]
            self._len, self.s = struct.unpack("<QQ", f.read(16))
            self.dim_offsets = np.fromfile(f, dtype=np.int64, count=self._len + 1)
            self.data_offsets = np.fromfile(f, dtype=np.int64, count=self._len + 1)
            self.sizes = np.fromfile(f, dtype=np.int64, count=self.s)

    def _data(self) -> np.memmap:
        if self._mmap is None:
            self._mmap = np.memmap(data_file_path(self.path), mode="r", dtype=self.dtype)
        return self._mmap

    def check_index(self, i: int) -> None:
        if i < 0 or i >= self._len:
            raise IndexError("index out of range")

    def __getitem__(self, i: int) -> np.ndarray:
        # copy out of the lru cache: a consumer's in-place op (sort, -=)
        # must never mutate the cached entry (reference
        # IndexedCachedDataset copies per access)
        return self._cached_item(i).copy()

    @lru_cache(maxsize=8)
    def _cached_item(self, i: int) -> np.ndarray:
        self.check_index(i)
        shape = tuple(self.sizes[self.dim_offsets[i]: self.dim_offsets[i + 1]])
        start = self.data_offsets[i]
        n = int(np.prod(shape))
        a = np.array(self._data()[start: start + n]).reshape(shape)
        if np.issubdtype(self.dtype, np.integer):
            a = a.astype(np.int64)
            if self.fix_lua_indexing:
                a -= 1
        return a

    def __len__(self) -> int:
        return self._len

    def num_tokens(self, index: int) -> int:
        return int(self.sizes[self.dim_offsets[index]])

    def size(self, index: int) -> int:
        return int(self.sizes[self.dim_offsets[index]])

    def item_shape(self, index: int):
        return tuple(
            int(s)
            for s in self.sizes[self.dim_offsets[index]: self.dim_offsets[index + 1]]
        )

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(index_file_path(path)) and os.path.exists(
            data_file_path(path)
        )

    @property
    def supports_prefetch(self) -> bool:
        return False


class FilterBanksDataset(IndexedDataset):
    """2-D float32 filterbank dataset (reference data/fbank_dataset.py:97-152).

    ``sizes`` holds (T, n_mels) pairs: size(i) / num_tokens(i) report the
    frame count, which drives length bucketing.
    """

    def __init__(self, path: str, legacy_audio_fix_lua_indexing: bool = False):
        super().__init__(path)
        assert self.dtype == np.float32
        assert len(self.sizes) == len(self) * 2
        self.legacy_audio_fix_lua_indexing = legacy_audio_fix_lua_indexing

    def __getitem__(self, i: int) -> np.ndarray:
        # copy out of the lru cache: a consumer's in-place op (sort, -=)
        # must never mutate the cached entry (reference
        # IndexedCachedDataset copies per access)
        return self._cached_item(i).copy()

    @lru_cache(maxsize=8)
    def _cached_item(self, i: int) -> np.ndarray:
        self.check_index(i)
        shape = tuple(self.sizes[self.dim_offsets[i]: self.dim_offsets[i + 1]])
        start = self.data_offsets[i]
        n = int(np.prod(shape))
        a = np.array(self._data()[start: start + n]).reshape(shape)
        if self.legacy_audio_fix_lua_indexing:
            a = a - 1
        return a

    def num_tokens(self, index: int) -> int:
        return int(self.sizes[index * 2])

    def size(self, index: int) -> int:
        return int(self.sizes[index * 2])

    @property
    def n_features(self) -> int:
        return int(self.sizes[1]) if len(self) else 0


class IndexedDatasetBuilder:
    """TNT-format writer for *token* datasets.

    Reproduces the reference's +1 Lua-compat shift on write
    (indexed_dataset.py:305) so the resulting files byte-match.
    """

    lua_compat_shift = 1

    def __init__(self, out_file: str, dtype=np.int32):
        self.out_file = open(out_file, "wb")
        self.dtype = np.dtype(dtype).type
        self.data_offsets = [0]
        self.dim_offsets = [0]
        self.sizes = []
        self.element_size = _ELEMENT_SIZES[self.dtype]

    def add_item(self, array) -> None:
        array = np.asarray(array)
        if self.lua_compat_shift:
            array = array + self.lua_compat_shift
        nbytes = self.out_file.write(
            np.ascontiguousarray(array, dtype=self.dtype).tobytes()
        )
        self.data_offsets.append(self.data_offsets[-1] + nbytes // self.element_size)
        for s in array.shape:
            self.sizes.append(s)
        self.dim_offsets.append(self.dim_offsets[-1] + array.ndim)

    def merge_file_(self, another_file: str) -> None:
        index = IndexedDataset(another_file)
        assert index.dtype == self.dtype
        begin = self.data_offsets[-1]
        for offset in index.data_offsets[1:]:
            self.data_offsets.append(begin + offset)
        self.sizes.extend(index.sizes)
        begin = self.dim_offsets[-1]
        for dim_offset in index.dim_offsets[1:]:
            self.dim_offsets.append(begin + dim_offset)
        with open(data_file_path(another_file), "rb") as f:
            shutil.copyfileobj(f, self.out_file)

    def finalize(self, index_file: str) -> None:
        self.out_file.close()
        with open(index_file, "wb") as index:
            index.write(_TNT_MAGIC)
            index.write(struct.pack("<Q", 1))
            index.write(struct.pack("<QQ", dtype_code(self.dtype), self.element_size))
            index.write(
                struct.pack("<QQ", len(self.data_offsets) - 1, len(self.sizes))
            )
            index.write(np.array(self.dim_offsets, dtype=np.int64).tobytes())
            index.write(np.array(self.data_offsets, dtype=np.int64).tobytes())
            index.write(np.array(self.sizes, dtype=np.int64).tobytes())


class AudioIndexedDatasetBuilder(IndexedDatasetBuilder):
    """float32 multi-dim writer (reference preprocess_audio.py:44-59) —
    values are stored verbatim (no Lua shift)."""

    lua_compat_shift = 0

    def __init__(self, out_file: str):
        super().__init__(out_file, dtype=np.float32)


class MMapIndexedDataset:
    """Reader for the mmap format."""

    def __init__(self, path: str):
        self._path = path
        with open(index_file_path(path), "rb") as stream:
            magic = stream.read(9)
            assert magic == _MMAP_MAGIC, (
                "Index file doesn't match expected format (MMIDIDX)."
            )
            version = struct.unpack("<Q", stream.read(8))
            assert version == (1,)
            (code,) = struct.unpack("<B", stream.read(1))
            self._dtype = DTYPES[code]
            self._len = struct.unpack("<Q", stream.read(8))[0]
            offset = stream.tell()

        idx_mmap = np.memmap(index_file_path(path), mode="r", order="C")
        idx_buffer = memoryview(idx_mmap)
        self._sizes = np.frombuffer(
            idx_buffer, dtype=np.int32, count=self._len, offset=offset
        )
        self._pointers = np.frombuffer(
            idx_buffer,
            dtype=np.int64,
            count=self._len,
            offset=offset + self._sizes.nbytes,
        )
        self._bin_buffer = np.memmap(data_file_path(path), mode="r", order="C")

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int) -> np.ndarray:
        # copy out of the lru cache: a consumer's in-place op (sort, -=)
        # must never mutate the cached entry (reference
        # IndexedCachedDataset copies per access)
        return self._cached_item(i).copy()

    @lru_cache(maxsize=8)
    def _cached_item(self, i: int) -> np.ndarray:
        ptr, size = int(self._pointers[i]), int(self._sizes[i])
        a = np.frombuffer(
            self._bin_buffer, dtype=self._dtype, count=size, offset=ptr
        )
        if self._dtype != np.int64 and np.issubdtype(self._dtype, np.integer):
            a = a.astype(np.int64)
        return a

    @property
    def dtype(self):
        return self._dtype

    @property
    def sizes(self) -> np.ndarray:
        return self._sizes

    def num_tokens(self, index: int) -> int:
        return int(self._sizes[index])

    def size(self, index: int) -> int:
        return int(self._sizes[index])

    @property
    def supports_prefetch(self) -> bool:
        return False

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(index_file_path(path)) and os.path.exists(
            data_file_path(path)
        )


class MMapIndexedDatasetBuilder:
    def __init__(self, out_file: str, dtype=np.int64):
        self._data_file = open(out_file, "wb")
        self._dtype = np.dtype(dtype).type
        self._sizes = []

    def add_item(self, array) -> None:
        a = np.ascontiguousarray(np.asarray(array), dtype=self._dtype)
        self._data_file.write(a.tobytes(order="C"))
        self._sizes.append(a.size)

    def merge_file_(self, another_file: str) -> None:
        index = MMapIndexedDataset(another_file)
        assert index.dtype == self._dtype
        for size in index.sizes:
            self._sizes.append(size)
        with open(data_file_path(another_file), "rb") as f:
            shutil.copyfileobj(f, self._data_file)

    def finalize(self, index_file: str) -> None:
        self._data_file.close()
        with open(index_file, "wb") as f:
            f.write(_MMAP_MAGIC)
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<B", dtype_code(self._dtype)))
            f.write(struct.pack("<Q", len(self._sizes)))
            sizes = np.array(self._sizes, dtype=np.int32)
            itemsize = np.dtype(self._dtype).itemsize
            pointers = np.zeros(len(self._sizes), dtype=np.int64)
            if len(self._sizes) > 1:
                np.cumsum(sizes[:-1] * itemsize, out=pointers[1:])
            f.write(sizes.tobytes(order="C"))
            f.write(pointers.tobytes(order="C"))


class IndexedRawTextDataset:
    """In-memory binarized text file (reference indexed_dataset.py:230-283)."""

    def __init__(
        self,
        path: str,
        dictionary: Dictionary,
        append_eos: bool = True,
        reverse_order: bool = False,
    ):
        self.tokens_list = []
        self.lines = []
        self.sizes = []
        self.append_eos = append_eos
        self.reverse_order = reverse_order
        self.read_data(path, dictionary)
        self._size = len(self.tokens_list)

    def read_data(self, path: str, dictionary: Dictionary) -> None:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                self.lines.append(line.strip("\n"))
                tokens = dictionary.encode_line(
                    line,
                    add_if_not_exist=False,
                    append_eos=self.append_eos,
                    reverse_order=self.reverse_order,
                )
                self.tokens_list.append(tokens)
                self.sizes.append(len(tokens))
        self.sizes = np.array(self.sizes)

    def check_index(self, i: int) -> None:
        if i < 0 or i >= self._size:
            raise IndexError("index out of range")

    def __getitem__(self, i: int) -> np.ndarray:
        self.check_index(i)
        return self.tokens_list[i]

    def get_original_text(self, i: int) -> str:
        self.check_index(i)
        return self.lines[i]

    def __len__(self) -> int:
        return self._size

    def num_tokens(self, index: int) -> int:
        return int(self.sizes[index])

    def size(self, index: int) -> int:
        return int(self.sizes[index])

    @property
    def supports_prefetch(self) -> bool:
        return False

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path)
