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
