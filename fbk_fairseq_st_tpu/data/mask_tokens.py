"""BERT-style token masking datasets.

Counterpart of the reference MaskTokensDataset
(fairseq/data/mask_tokens_dataset.py:16-173) and the NestedDictionary/Pad
dataset stack the masked_lm task composes (fairseq/tasks/masked_lm.py:
129-158). Masking math is preserved — per-item seed (seed, epoch, index),
probabilistic rounding of the mask count, the unmask/random-replacement
split, frequency-weighted replacement, whole-word extension — but the
src/tgt pair is produced in ONE pass (`MaskedTokensPair`) instead of two
LRU-cached wrapper datasets, and batch assembly is a plain collater
(`MaskedLMDataset`) emitting the fixed-shape batch layout the TPU step
expects (pad_to_* kwargs for the shape bucketer).
"""

from __future__ import annotations

import numpy as np

from .datasets import Dataset, collate_tokens


class MaskedTokensPair(Dataset):
    """For each item return (masked input, target-with-pads) deterministically
    from (seed, epoch, index)."""

    def __init__(
        self,
        dataset,
        vocab,
        pad_idx: int,
        mask_idx: int,
        seed: int = 1,
        mask_prob: float = 0.15,
        leave_unmasked_prob: float = 0.1,
        random_token_prob: float = 0.1,
        freq_weighted_replacement: bool = False,
        mask_whole_words: np.ndarray = None,
    ):
        assert 0.0 < mask_prob < 1.0
        assert 0.0 <= random_token_prob <= 1.0
        assert 0.0 <= leave_unmasked_prob <= 1.0
        assert random_token_prob + leave_unmasked_prob <= 1.0
        self.dataset = dataset
        self.vocab = vocab
        self.pad_idx = pad_idx
        self.mask_idx = mask_idx
        self.seed = seed
        self.mask_prob = mask_prob
        self.leave_unmasked_prob = leave_unmasked_prob
        self.random_token_prob = random_token_prob
        self.mask_whole_words = mask_whole_words
        self.epoch = 0

        if random_token_prob > 0.0:
            if freq_weighted_replacement:
                weights = np.array(self.vocab.count)
            else:
                weights = np.ones(len(self.vocab))
            weights[: self.vocab.nspecial] = 0
            self.weights = weights / weights.sum()
        else:
            self.weights = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __getitem__(self, index):
        rng = np.random.RandomState(
            np.random.RandomState([self.seed, self.epoch, index]).randint(
                2 ** 31
            )
        )
        item = np.asarray(self.dataset[index])
        sz = len(item)
        assert self.mask_idx not in item, (
            "Dataset contains mask_idx (={}), this is not expected!".format(
                self.mask_idx
            )
        )

        word_lens = None
        if self.mask_whole_words is not None:
            word_begins = self.mask_whole_words[item].astype(bool)
            begin_idx = np.nonzero(word_begins)[0]
            sz = len(begin_idx)
            word_lens = np.diff(np.append(begin_idx, len(item)))

        # probabilistic rounding of the masked count (reference :117-122)
        mask = np.full(sz, False)
        num_mask = int(self.mask_prob * sz + rng.rand())
        mask[rng.choice(sz, num_mask, replace=False)] = True

        token_mask = (
            np.repeat(mask, word_lens) if word_lens is not None else mask
        )
        target = np.full(len(item), self.pad_idx, item.dtype)
        target[token_mask] = item[token_mask]

        # split mask into keep-original / random-replacement (reference
        # :134-152)
        rand_or_unmask_prob = self.random_token_prob + self.leave_unmasked_prob
        unmask = rand_mask = None
        if rand_or_unmask_prob > 0.0:
            rand_or_unmask = mask & (rng.rand(sz) < rand_or_unmask_prob)
            if self.random_token_prob == 0.0:
                unmask = rand_or_unmask
            elif self.leave_unmasked_prob == 0.0:
                rand_mask = rand_or_unmask
            else:
                unmask_prob = self.leave_unmasked_prob / rand_or_unmask_prob
                decision = rng.rand(sz) < unmask_prob
                unmask = rand_or_unmask & decision
                rand_mask = rand_or_unmask & (~decision)
        if unmask is not None:
            mask = mask ^ unmask

        if word_lens is not None:
            mask = np.repeat(mask, word_lens)
        source = item.copy()
        source[mask] = self.mask_idx
        if rand_mask is not None:
            if word_lens is not None:
                rand_mask = np.repeat(rand_mask, word_lens)
            num_rand = int(rand_mask.sum())
            if num_rand > 0:
                source[rand_mask] = rng.choice(
                    len(self.vocab), num_rand, p=self.weights
                )
        return {"id": index, "source": source, "target": target}

    def __len__(self):
        return len(self.dataset)

    def num_tokens(self, index):
        return self.dataset.num_tokens(index)

    def size(self, index):
        return self.dataset.size(index)

    @property
    def sizes(self):
        return self.dataset.sizes


class MaskedLMDataset(Dataset):
    """Batch assembly over a MaskedTokensPair (the reference's
    NestedDictionaryDataset net_input/target layout, tasks/masked_lm.py:
    133-158)."""

    def __init__(self, pair: MaskedTokensPair, pad_idx: int,
                 shuffle: bool = False):
        self.pair = pair
        self.pad_idx = pad_idx
        self.shuffle = shuffle

    def set_epoch(self, epoch):
        self.pair.set_epoch(epoch)

    def __getitem__(self, index):
        return self.pair[index]

    def __len__(self):
        return len(self.pair)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        pad = self.pad_idx
        pad_len = pad_to_src_len or pad_to_tgt_len
        ids = np.array([s["id"] for s in samples], np.int64)
        src = collate_tokens(
            [s["source"] for s in samples], pad, pad_to_length=pad_len
        )
        tgt = collate_tokens(
            [s["target"] for s in samples], pad, pad_to_length=pad_len
        )
        # src/tgt must share one static width
        width = max(src.shape[1], tgt.shape[1])
        for name, arr in (("src", src), ("tgt", tgt)):
            if arr.shape[1] < width:
                padcols = np.full(
                    (arr.shape[0], width - arr.shape[1]), pad, arr.dtype
                )
                if name == "src":
                    src = np.concatenate([arr, padcols], axis=1)
                else:
                    tgt = np.concatenate([arr, padcols], axis=1)
        lengths = np.array([len(s["source"]) for s in samples], np.int64)
        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences
            ids = np.concatenate([ids, np.full(extra, -1, np.int64)])
            src = np.concatenate(
                [src, np.full((extra, src.shape[1]), pad, src.dtype)]
            )
            tgt = np.concatenate(
                [tgt, np.full((extra, tgt.shape[1]), pad, tgt.dtype)]
            )
            lengths = np.concatenate([lengths, np.zeros(extra, np.int64)])
        return {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": int(lengths.sum()),
            "net_input": {"src_tokens": src, "src_lengths": lengths},
            "target": tgt,
        }

    def num_tokens(self, index):
        return self.pair.num_tokens(index)

    def size(self, index):
        return self.pair.size(index)

    @property
    def sizes(self):
        return self.pair.sizes

    def ordered_indices(self):
        if self.shuffle:
            order = np.random.permutation(len(self)).astype(np.int64)
            return order[np.argsort(np.asarray(self.sizes)[order],
                                    kind="mergesort")]
        return np.arange(len(self), dtype=np.int64)


def get_whole_word_mask(bpe, dictionary) -> np.ndarray:
    """Byte mask over the vocab: is this token the beginning of a word?
    (reference fairseq/data/encoders/utils.py:10-24)."""

    def is_beginning_of_word(i):
        if i < dictionary.nspecial:
            return True
        tok = dictionary[i]
        if tok.startswith("madeupword"):
            return True
        if bpe is not None:
            try:
                return bpe.is_beginning_of_word(tok)
            except (ValueError, AttributeError):
                return True
        # default @@-continuation convention
        return not tok.endswith("@@")

    return np.array(
        [is_beginning_of_word(i) for i in range(len(dictionary))]
    )
