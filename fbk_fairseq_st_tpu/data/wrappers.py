"""Small composable dataset wrappers (reference fairseq/data/*_dataset.py
zoo): prepend/append/truncate/strip tokens, id-offset slicing, resampling,
sorting — the building blocks multilingual and denoising recipes compose.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .datasets import Dataset


class BaseWrapperDataset(Dataset):
    def __init__(self, dataset):
        self.dataset = dataset

    def __getitem__(self, index):
        return self.dataset[index]

    def __len__(self):
        return len(self.dataset)

    def collater(self, samples, **kwargs):
        return self.dataset.collater(samples, **kwargs)

    def num_tokens(self, index):
        return self.dataset.num_tokens(index)

    def size(self, index):
        return self.dataset.size(index)

    @property
    def sizes(self):
        return self.dataset.sizes

    def ordered_indices(self):
        return self.dataset.ordered_indices()


class PrependTokenDataset(BaseWrapperDataset):
    """Prepend a token to every item (reference prepend_token_dataset.py)."""

    def __init__(self, dataset, token: Optional[int] = None):
        super().__init__(dataset)
        self.token = token

    def __getitem__(self, index):
        item = np.asarray(self.dataset[index])
        if self.token is not None:
            item = np.concatenate([[self.token], item])
        return item

    def num_tokens(self, index):
        return self.dataset.num_tokens(index) + int(self.token is not None)

    def size(self, index):
        return self.dataset.size(index) + int(self.token is not None)

    @property
    def sizes(self):
        return self.dataset.sizes + int(self.token is not None)


class AppendTokenDataset(BaseWrapperDataset):
    def __init__(self, dataset, token: Optional[int] = None):
        super().__init__(dataset)
        self.token = token

    def __getitem__(self, index):
        item = np.asarray(self.dataset[index])
        if self.token is not None:
            item = np.concatenate([item, [self.token]])
        return item

    def num_tokens(self, index):
        return self.dataset.num_tokens(index) + int(self.token is not None)

    def size(self, index):
        return self.dataset.size(index) + int(self.token is not None)

    @property
    def sizes(self):
        return self.dataset.sizes + int(self.token is not None)


class TruncateDataset(BaseWrapperDataset):
    """Truncate items to a maximum length (reference truncate_dataset.py)."""

    def __init__(self, dataset, truncation_length: int):
        super().__init__(dataset)
        assert truncation_length is not None
        self.truncation_length = truncation_length

    def __getitem__(self, index):
        item = np.asarray(self.dataset[index])
        if item.shape[0] > self.truncation_length:
            item = item[: self.truncation_length]
        return item

    @property
    def sizes(self):
        return np.minimum(self.dataset.sizes, self.truncation_length)

    def num_tokens(self, index):
        return min(self.dataset.num_tokens(index), self.truncation_length)

    def size(self, index):
        return min(self.dataset.size(index), self.truncation_length)


class StripTokenDataset(BaseWrapperDataset):
    """Strip a token off both ends (reference strip_token_dataset.py)."""

    def __init__(self, dataset, id_to_strip: int):
        super().__init__(dataset)
        self.id_to_strip = id_to_strip

    def __getitem__(self, index):
        item = np.asarray(self.dataset[index])
        while len(item) > 0 and item[-1] == self.id_to_strip:
            item = item[:-1]
        while len(item) > 0 and item[0] == self.id_to_strip:
            item = item[1:]
        return item


class ResamplingDataset(BaseWrapperDataset):
    """Up/down-sample a dataset by a ratio with a per-epoch seeded choice
    (reference resampling_dataset.py)."""

    def __init__(self, dataset, size_ratio: float = 1.0, seed: int = 0,
                 epoch: int = 0, replace: bool = True):
        super().__init__(dataset)
        self.size_ratio = size_ratio
        self.actual_size = int(np.ceil(len(dataset) * size_ratio))
        self.seed = seed
        self.replace = replace
        self._cur_epoch = None
        self._indices = None
        self.set_epoch(epoch)

    def set_epoch(self, epoch: int):
        if epoch == self._cur_epoch:
            return
        self._cur_epoch = epoch
        rng = np.random.RandomState([42, self.seed, epoch])
        self._indices = rng.choice(
            len(self.dataset), self.actual_size, replace=self.replace
        )

    def __getitem__(self, index):
        return self.dataset[self._indices[index]]

    def __len__(self):
        return self.actual_size

    def num_tokens(self, index):
        return self.dataset.num_tokens(self._indices[index])

    def size(self, index):
        return self.dataset.size(self._indices[index])

    @property
    def sizes(self):
        return np.asarray(self.dataset.sizes)[self._indices]

    def ordered_indices(self):
        return np.arange(len(self), dtype=np.int64)


class SortDataset(BaseWrapperDataset):
    """Order indices by successive sort keys (reference sort_dataset.py)."""

    def __init__(self, dataset, sort_order):
        super().__init__(dataset)
        if not isinstance(sort_order, (list, tuple)):
            sort_order = [sort_order]
        self.sort_order = sort_order
        assert all(len(so) == len(dataset) for so in sort_order)

    def ordered_indices(self):
        return np.lexsort(self.sort_order)


class TransformEosLangPairDataset(BaseWrapperDataset):
    """Replace the source EOS / target BOS with language tokens on the
    collated batch (reference transform_eos_lang_pair_dataset.py; the
    langtok mechanism of multilingual_translation)."""

    def __init__(self, dataset, src_eos: int, new_src_eos=None,
                 tgt_bos=None, new_tgt_bos=None):
        super().__init__(dataset)
        self.src_eos = src_eos
        self.new_src_eos = new_src_eos
        self.tgt_bos = tgt_bos
        self.new_tgt_bos = new_tgt_bos

    def collater(self, samples, **kwargs):
        batch = self.dataset.collater(samples, **kwargs)
        if not batch:
            return batch
        if self.new_src_eos is not None:
            src = np.asarray(batch["net_input"]["src_tokens"]).copy()
            if src.shape[1] > 0:
                # left-padded sources end in EOS; fixed-shape pad rows do
                # not — replace only where the EOS actually sits
                last = src[:, -1]
                src[:, -1] = np.where(
                    last == self.src_eos, self.new_src_eos, last
                )
                # right-padded sources: EOS at position length-1
                lengths = np.asarray(batch["net_input"]["src_lengths"])
                rows = np.arange(src.shape[0])
                idx = np.clip(lengths - 1, 0, src.shape[1] - 1)
                vals = src[rows, idx]
                src[rows, idx] = np.where(
                    vals == self.src_eos, self.new_src_eos, vals
                )
            batch["net_input"]["src_tokens"] = src
        if (
            self.new_tgt_bos is not None
            and "prev_output_tokens" in batch.get("net_input", {})
        ):
            prev = np.asarray(batch["net_input"]["prev_output_tokens"]).copy()
            first = prev[:, 0]
            prev[:, 0] = np.where(
                first == self.tgt_bos, self.new_tgt_bos, first
            )
            batch["net_input"]["prev_output_tokens"] = prev
        return batch


class OffsetTokensDataset(BaseWrapperDataset):
    """Add a constant to every token (reference offset_tokens_dataset.py;
    used to map label-dictionary ids to 0-based class indices)."""

    def __init__(self, dataset, offset: int):
        super().__init__(dataset)
        self.offset = offset

    def __getitem__(self, index):
        return np.asarray(self.dataset[index]) + self.offset


class ConcatSentencesDataset(Dataset):
    """Concatenate parallel datasets item-wise (reference
    concat_sentences_dataset.py; input0+input1 sentence pairs)."""

    def __init__(self, *datasets):
        self.datasets = datasets
        assert all(len(ds) == len(datasets[0]) for ds in datasets)

    def __getitem__(self, index):
        return np.concatenate([np.asarray(ds[index]) for ds in self.datasets])

    def __len__(self):
        return len(self.datasets[0])

    @property
    def sizes(self):
        return sum(np.asarray(ds.sizes) for ds in self.datasets)

    def num_tokens(self, index):
        return sum(ds.num_tokens(index) for ds in self.datasets)

    def size(self, index):
        return sum(ds.size(index) for ds in self.datasets)

    def ordered_indices(self):
        return np.arange(len(self), dtype=np.int64)


class RawLabelDataset(Dataset):
    """In-memory labels (reference raw_label_dataset.py)."""

    def __init__(self, labels):
        self.labels = labels

    def __getitem__(self, index):
        return self.labels[index]

    def __len__(self):
        return len(self.labels)

    def num_tokens(self, index):
        return 1

    def size(self, index):
        return 1


class IdDataset(Dataset):
    """Identity ids (reference id_dataset.py)."""

    def __init__(self, n: int):
        self.n = n

    def __getitem__(self, index):
        return index

    def __len__(self):
        return self.n

    def num_tokens(self, index):
        return 1

    def size(self, index):
        return 1


class LRUCacheDataset(BaseWrapperDataset):
    """Memoize recent item lookups (reference lru_cache_dataset.py); useful
    when several views of the same underlying dataset are zipped together
    and fetch the same index repeatedly (e.g. masked-LM input/target)."""

    def __init__(self, dataset, maxsize: int = 8):
        super().__init__(dataset)
        import functools

        self.__getitem__cached = functools.lru_cache(maxsize)(
            lambda index: self.dataset[index]
        )

    def __getitem__(self, index):
        return self.__getitem__cached(index)


class ReplaceDataset(BaseWrapperDataset):
    """Map token values to replacements past a per-field offset (reference
    replace_dataset.py)."""

    def __init__(self, dataset, replace_map: dict, offsets):
        super().__init__(dataset)
        assert replace_map
        self.replace_map = replace_map
        self.offsets = offsets

    def _apply(self, src, offset):
        src = np.array(src, copy=True)
        view = src[offset:] if offset >= 0 else src[:offset]
        for old, new in self.replace_map.items():
            view[view == old] = new
        return src

    def __getitem__(self, index):
        item = self.dataset[index]
        if isinstance(item, tuple):
            return tuple(
                self._apply(src, off)
                for off, src in zip(self.offsets, item)
            )
        return self._apply(item, self.offsets[0])


class RollDataset(BaseWrapperDataset):
    """Circularly shift every item (reference roll_dataset.py)."""

    def __init__(self, dataset, shifts: int):
        super().__init__(dataset)
        self.shifts = shifts

    def __getitem__(self, index):
        return np.roll(self.dataset[index], self.shifts)


class SubsampleDataset(BaseWrapperDataset):
    """Random fixed subsample by example-count ratio (reference
    subsample_dataset.py)."""

    def __init__(self, dataset, size_ratio: float, seed: int = 0):
        super().__init__(dataset)
        assert 0 < size_ratio < 1
        self.actual_size = int(np.ceil(len(dataset) * size_ratio))
        rng = np.random.RandomState(seed)
        self.indices = rng.choice(
            len(dataset), self.actual_size, replace=False
        )

    def __getitem__(self, index):
        return self.dataset[self.indices[index]]

    def __len__(self):
        return self.actual_size

    def num_tokens(self, index):
        return self.dataset.num_tokens(self.indices[index])

    def size(self, index):
        return self.dataset.size(self.indices[index])

    @property
    def sizes(self):
        return self.dataset.sizes[self.indices]

    def ordered_indices(self):
        return np.argsort(self.sizes, kind="mergesort").astype(np.int64)


class ColorizeDataset(BaseWrapperDataset):
    """Attach a per-sample integer "color" to net_input (reference
    colorize_dataset.py)."""

    def __init__(self, dataset, color_getter):
        super().__init__(dataset)
        self.color_getter = color_getter

    def collater(self, samples, **kwargs):
        batch = self.dataset.collater(samples, **kwargs)
        if batch:
            batch["net_input"]["colors"] = np.array(
                [self.color_getter(self.dataset, s["id"]) for s in samples],
                np.int64,
            )
        return batch


class PadDataset(BaseWrapperDataset):
    """Collate raw token lists into one padded matrix (reference
    pad_dataset.py)."""

    def __init__(self, dataset, pad_idx: int, left_pad: bool):
        super().__init__(dataset)
        self.pad_idx = pad_idx
        self.left_pad = left_pad

    def collater(self, samples, **unused):
        from .datasets import collate_tokens

        return collate_tokens(samples, self.pad_idx, left_pad=self.left_pad)


class LeftPadDataset(PadDataset):
    def __init__(self, dataset, pad_idx):
        super().__init__(dataset, pad_idx, left_pad=True)


class RightPadDataset(PadDataset):
    def __init__(self, dataset, pad_idx):
        super().__init__(dataset, pad_idx, left_pad=False)


class PrependDataset(BaseWrapperDataset):
    """Overwrite the first token via a per-index getter (reference
    prepend_dataset.py — used to inject language tokens)."""

    def __init__(self, dataset, prepend_getter, ensure_first_token_is=None):
        super().__init__(dataset)
        self.prepend_getter = prepend_getter
        self.ensure_first_token = ensure_first_token_is

    def __getitem__(self, index):
        item = self.dataset[index]
        is_tuple = isinstance(item, tuple)
        src = np.array(item[0] if is_tuple else item, copy=True)
        if self.ensure_first_token is not None:
            assert src[0] == self.ensure_first_token
        prepend = self.prepend_getter(self.dataset, index)
        assert isinstance(prepend, int)
        src[0] = prepend
        return tuple((src,) + tuple(item[1:])) if is_tuple else src


class ListDataset(BaseWrapperDataset):
    """Passthrough over a plain list with externally-supplied sizes
    (reference list_dataset.py)."""

    def __init__(self, dataset, sizes=None):
        super().__init__(dataset)
        self._sizes = sizes

    def __iter__(self):
        return iter(self.dataset)

    def collater(self, samples, **unused):
        return samples

    @property
    def sizes(self):
        return self._sizes

    def num_tokens(self, index):
        return self._sizes[index]

    def size(self, index):
        return self._sizes[index]


class NumSamplesDataset(Dataset):
    """Collates to the sample count (reference num_samples_dataset.py)."""

    def __getitem__(self, index):
        return 1

    def __len__(self):
        return 0

    def collater(self, samples, **unused):
        return sum(samples)


class NumelDataset(BaseWrapperDataset):
    """Per-item element counts, optionally summed at collate (reference
    numel_dataset.py)."""

    def __init__(self, dataset, reduce: bool = False):
        super().__init__(dataset)
        self.reduce = reduce

    def __getitem__(self, index):
        return int(np.size(self.dataset[index]))

    def collater(self, samples, **unused):
        if self.reduce:
            return sum(samples)
        return np.array(samples, np.int64)


class TransformEosDataset(Dataset):
    """Append/strip eos on source/target at collate time (reference
    transform_eos_dataset.py). Sizes are adjusted by the eos delta."""

    def __init__(
        self,
        dataset,
        eos: int,
        append_eos_to_src: bool = False,
        remove_eos_from_src: bool = False,
        append_eos_to_tgt: bool = False,
        remove_eos_from_tgt: bool = False,
        has_target: bool = True,
    ):
        if append_eos_to_src and remove_eos_from_src:
            raise ValueError(
                "cannot combine append_eos_to_src and remove_eos_from_src"
            )
        if append_eos_to_tgt and remove_eos_from_tgt:
            raise ValueError(
                "cannot combine append_eos_to_tgt and remove_eos_from_tgt"
            )
        self.dataset = dataset
        self.eos = eos
        self.append_eos_to_src = append_eos_to_src
        self.remove_eos_from_src = remove_eos_from_src
        self.append_eos_to_tgt = append_eos_to_tgt
        self.remove_eos_from_tgt = remove_eos_from_tgt
        self.has_target = has_target
        self._src_delta = int(append_eos_to_src) - int(remove_eos_from_src)
        self._tgt_delta = int(append_eos_to_tgt) - int(remove_eos_from_tgt)

    def __getitem__(self, index):
        return self.dataset[index]

    def __len__(self):
        return len(self.dataset)

    def _transform(self, item):
        item = dict(item)

        def _append(arr):
            return np.concatenate([arr, [self.eos]])

        if self.append_eos_to_src:
            assert item["source"][-1] != self.eos
            item["source"] = _append(item["source"])
        if self.remove_eos_from_src:
            assert item["source"][-1] == self.eos
            item["source"] = item["source"][:-1]
        if self.has_target and self.append_eos_to_tgt:
            assert item["target"][-1] != self.eos
            item["target"] = _append(item["target"])
        if self.has_target and self.remove_eos_from_tgt:
            assert item["target"][-1] == self.eos
            item["target"] = item["target"][:-1]
        return item

    def collater(self, samples, **kwargs):
        return self.dataset.collater(
            [self._transform(s) for s in samples], **kwargs
        )

    def num_tokens(self, index):
        return self.dataset.num_tokens(index)

    def size(self, index):
        if self.has_target:
            src_len, tgt_len = self.dataset.size(index)
            return (src_len + self._src_delta, tgt_len + self._tgt_delta)
        return self.dataset.size(index)

    @property
    def sizes(self):
        return self.dataset.sizes

    def ordered_indices(self):
        return self.dataset.ordered_indices()


class MultiCorpusSampledDataset(Dataset):
    """Zip several corpora; each collated batch draws ALL its items from
    one corpus chosen by a sampling function (reference
    multi_corpus_sampled_dataset.py). Item *index* wraps modulo each
    corpus's length."""

    def __init__(self, datasets, sampling_func=None, seed: int = 0):
        from collections import OrderedDict

        assert isinstance(datasets, OrderedDict) or isinstance(datasets, dict)
        self.datasets = OrderedDict(datasets)
        rng = np.random.RandomState(seed)
        self.sampling_func = sampling_func or (
            lambda keys: keys[rng.randint(len(keys))]
        )
        self.total_num_instances = sum(len(d) for d in self.datasets.values())
        self._ordered_indices = None

    def __len__(self):
        return self.total_num_instances

    def ordered_indices(self):
        if self._ordered_indices is None:
            self._ordered_indices = {
                key: d.ordered_indices() for key, d in self.datasets.items()
            }
        return np.arange(len(self), dtype=np.int64)

    def _map_index(self, key, index):
        assert self._ordered_indices is not None, (
            "call ordered_indices() first"
        )
        return self._ordered_indices[key][index % len(self.datasets[key])]

    def __getitem__(self, index):
        from collections import OrderedDict

        return OrderedDict(
            (key, d[self._map_index(key, index)])
            for key, d in self.datasets.items()
        )

    def collater(self, samples, **kwargs):
        if len(samples) == 0:
            return None
        key = self.sampling_func(list(self.datasets.keys()))
        return self.datasets[key].collater(
            [s[key] for s in samples], **kwargs
        )

    def num_tokens(self, index):
        return max(
            d.num_tokens(self._map_index(key, index))
            for key, d in self.datasets.items()
        )

    def size(self, index):
        return max(
            d.size(self._map_index(key, index))
            for key, d in self.datasets.items()
        )
