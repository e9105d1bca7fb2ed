"""Legacy (BERT/XLM-style) masked LM datasets: sentence pairs with segment
labels and a next-sentence-prediction target.

Counterpart of fairseq/data/legacy/{block_pair_dataset.py,
masked_lm_dataset.py} (the pre-RoBERTa data path kept upstream for
backwards compatibility). The pair construction follows BERT: 50% of items
take a random second block (NSP label 1), the rest the true continuation
(label 0); items are [cls] A [sep] B [sep] with segment ids 0/1 and the
masking reuses the modern seeded 80/10/10 scheme (data/mask_tokens.py)
instead of the legacy duplicate implementation."""

from __future__ import annotations

import numpy as np

from .datasets import Dataset, collate_tokens


class BlockPairDataset(Dataset):
    """Pairs of consecutive token blocks with NSP labels."""

    def __init__(self, dataset, sizes, block_size: int, pad: int, cls: int,
                 sep: int, seed: int = 1):
        self.dataset = dataset
        self.block_size = block_size
        self.pad_idx = pad
        self.cls_idx = cls
        self.sep_idx = sep
        self.seed = seed
        self.n = len(dataset)

    def __getitem__(self, index):
        rng = np.random.RandomState([self.seed, index])
        a = np.asarray(self.dataset[index])[: self.block_size]
        if self.n > 1 and rng.rand() < 0.5:
            j = rng.randint(self.n - 1)
            j = j + 1 if j >= index else j
            label = 1  # random next sentence
        else:
            j = (index + 1) % self.n
            label = 0
        b = np.asarray(self.dataset[j])[: self.block_size]
        tokens = np.concatenate(
            [[self.cls_idx], a, [self.sep_idx], b, [self.sep_idx]]
        )
        segments = np.concatenate(
            [np.zeros(len(a) + 2, np.int64), np.ones(len(b) + 1, np.int64)]
        )
        return {
            "tokens": tokens.astype(np.int64),
            "segments": segments,
            "sentence_target": label,
        }

    def __len__(self):
        return self.n

    def num_tokens(self, index):
        return min(self.dataset.num_tokens(index), self.block_size) * 2 + 3

    def size(self, index):
        return self.num_tokens(index)

    @property
    def sizes(self):
        return np.minimum(
            np.asarray(self.dataset.sizes), self.block_size
        ) * 2 + 3


class LegacyMaskedLMDataset(Dataset):
    """Apply 80/10/10 masking to block pairs and collate BERT-style batches
    (net_input: src_tokens + segment_labels; targets: lm + sentence)."""

    def __init__(self, pair_dataset: BlockPairDataset, vocab, mask_idx: int,
                 seed: int = 1, mask_prob: float = 0.15,
                 leave_unmasked_prob: float = 0.1,
                 random_token_prob: float = 0.1, shuffle: bool = True):
        self.pairs = pair_dataset
        self.vocab = vocab
        self.mask_idx = mask_idx
        self.seed = seed
        self.mask_prob = mask_prob
        self.leave_unmasked_prob = leave_unmasked_prob
        self.random_token_prob = random_token_prob
        self.shuffle = shuffle

    def __getitem__(self, index):
        from .mask_tokens import MaskedTokensPair

        item = self.pairs[index]
        masker = MaskedTokensPair(
            _OneItem(item["tokens"]),
            self.vocab,
            pad_idx=self.vocab.pad(),
            mask_idx=self.mask_idx,
            seed=self.seed + index,
            mask_prob=self.mask_prob,
            leave_unmasked_prob=self.leave_unmasked_prob,
            random_token_prob=self.random_token_prob,
        )
        masked = masker[0]
        return {
            "id": index,
            "source": masked["source"],
            "target": masked["target"],
            "segments": item["segments"],
            "sentence_target": item["sentence_target"],
        }

    def __len__(self):
        return len(self.pairs)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        pad = self.vocab.pad()
        pad_len = pad_to_src_len or pad_to_tgt_len
        ids = np.array([s["id"] for s in samples], np.int64)
        src = collate_tokens(
            [s["source"] for s in samples], pad, pad_to_length=pad_len
        )
        tgt = collate_tokens(
            [s["target"] for s in samples], pad, pad_to_length=pad_len
        )
        seg = collate_tokens(
            [s["segments"] for s in samples], 0, pad_to_length=pad_len
        )
        width = max(src.shape[1], tgt.shape[1], seg.shape[1])

        def fit(a, fill):
            if a.shape[1] < width:
                a = np.concatenate(
                    [a, np.full((a.shape[0], width - a.shape[1]), fill,
                                a.dtype)], axis=1,
                )
            return a

        src, tgt, seg = fit(src, pad), fit(tgt, pad), fit(seg, 0)
        lengths = np.array([len(s["source"]) for s in samples], np.int64)
        sent_tgt = np.array(
            [s["sentence_target"] for s in samples], np.int64
        )
        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences
            ids = np.concatenate([ids, np.full(extra, -1, np.int64)])
            src = np.concatenate(
                [src, np.full((extra, width), pad, src.dtype)]
            )
            tgt = np.concatenate(
                [tgt, np.full((extra, width), pad, tgt.dtype)]
            )
            seg = np.concatenate([seg, np.zeros((extra, width), seg.dtype)])
            lengths = np.concatenate([lengths, np.zeros(extra, np.int64)])
            sent_tgt = np.concatenate([sent_tgt, np.full(extra, -1, np.int64)])
        return {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": int(lengths.sum()),
            "net_input": {
                "src_tokens": src,
                "src_lengths": lengths,
                "segment_labels": seg,
            },
            "target": tgt,
            "sentence_target": sent_tgt,
        }

    def num_tokens(self, index):
        return self.pairs.num_tokens(index)

    def size(self, index):
        return self.pairs.size(index)

    @property
    def sizes(self):
        return self.pairs.sizes

    def ordered_indices(self):
        if self.shuffle:
            return np.random.permutation(len(self)).astype(np.int64)
        return np.arange(len(self), dtype=np.int64)


class _OneItem:
    def __init__(self, item):
        self.item = item

    def __getitem__(self, i):
        return self.item

    def __len__(self):
        return 1
