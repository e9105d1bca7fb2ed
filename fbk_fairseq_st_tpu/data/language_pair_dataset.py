"""Text translation dataset (reference fairseq/data/language_pair_dataset.py).

Batch layout matches the reference collate (:17-110): sources left-padded by
default, targets right-padded, rows sorted by descending source length,
prev_output_tokens via move_eos_to_beginning. ``ordered_indices`` sorts by
(tgt_len, src_len) like the reference when shuffle is on.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .datasets import Dataset, collate_tokens


class LanguagePairDataset(Dataset):
    def __init__(
        self,
        src,
        src_sizes,
        src_dict,
        tgt=None,
        tgt_sizes=None,
        tgt_dict=None,
        left_pad_source: bool = True,
        left_pad_target: bool = False,
        max_source_positions: int = 1024,
        max_target_positions: int = 1024,
        shuffle: bool = True,
        input_feeding: bool = True,
        append_eos_to_target: bool = False,
        align_dataset=None,
        eos=None,
    ):
        # align_dataset[i]: (n_pairs, 2) int array of (src, tgt) index pairs
        # (reference transformer_align supervision; collated into a dense
        # per-target-position weight grid so the loss stays fixed-shape)
        self.align_dataset = align_dataset
        # eos override for mBART-style '[lang]'-terminated targets
        self.eos = eos
        self.src = src
        self.tgt = tgt
        self.src_sizes = np.array(src_sizes)
        self.tgt_sizes = np.array(tgt_sizes) if tgt_sizes is not None else None
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict if tgt_dict is not None else src_dict
        self.left_pad_source = left_pad_source
        self.left_pad_target = left_pad_target
        self.max_source_positions = max_source_positions
        self.max_target_positions = max_target_positions
        self.shuffle = shuffle
        self.input_feeding = input_feeding
        self.append_eos_to_target = append_eos_to_target

    def __getitem__(self, index):
        tgt_item = np.asarray(self.tgt[index]) if self.tgt is not None else None
        src_item = np.asarray(self.src[index])
        if self.append_eos_to_target and tgt_item is not None:
            eos = self.tgt_dict.eos()
            if tgt_item[-1] != eos:
                tgt_item = np.concatenate([tgt_item, [eos]])
        item = {"id": index, "source": src_item, "target": tgt_item}
        if self.align_dataset is not None:
            item["alignment"] = np.asarray(self.align_dataset[index])
        return item

    def __len__(self):
        return len(self.src)

    def collater(
        self,
        samples,
        pad_to_src_len: Optional[int] = None,
        pad_to_tgt_len: Optional[int] = None,
        pad_to_bsz: Optional[int] = None,
    ):
        if len(samples) == 0:
            return {}
        pad_idx = self.src_dict.pad()
        eos_idx = self.src_dict.eos()

        ids = np.array([s["id"] for s in samples], dtype=np.int64)
        src_tokens = collate_tokens(
            [s["source"] for s in samples], pad_idx, eos_idx,
            left_pad=self.left_pad_source, pad_to_length=pad_to_src_len,
        )
        src_lengths = np.array([len(s["source"]) for s in samples], np.int64)
        sort_order = np.argsort(-src_lengths, kind="stable")
        ids = ids[sort_order]
        src_tokens = src_tokens[sort_order]
        src_lengths = src_lengths[sort_order]

        target = prev_output_tokens = None
        ntokens = int(src_lengths.sum())
        if samples[0].get("target") is not None:
            target = collate_tokens(
                [s["target"] for s in samples],
                self.tgt_dict.pad(), self.tgt_dict.eos(),
                left_pad=self.left_pad_target, pad_to_length=pad_to_tgt_len,
            )[sort_order]
            ntokens = int(sum(len(s["target"]) for s in samples))
            if self.input_feeding:
                prev_output_tokens = collate_tokens(
                    [s["target"] for s in samples],
                    self.tgt_dict.pad(),
                    self.eos if self.eos is not None else self.tgt_dict.eos(),
                    left_pad=self.left_pad_target,
                    move_eos_to_beginning=True,
                    pad_to_length=pad_to_tgt_len,
                )[sort_order]

        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences

            def pad_rows(a, fill):
                if a is None:
                    return None
                return np.concatenate(
                    [a, np.full((extra,) + a.shape[1:], fill, a.dtype)]
                )

            ids = pad_rows(ids, -1)
            src_tokens = pad_rows(src_tokens, pad_idx)
            src_lengths = pad_rows(src_lengths, 0)
            target = pad_rows(target, self.tgt_dict.pad())
            prev_output_tokens = pad_rows(prev_output_tokens, self.tgt_dict.pad())

        batch = {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": ntokens,
            "net_input": {
                "src_tokens": src_tokens,
                "src_lengths": src_lengths,
            },
            "target": target,
        }
        if prev_output_tokens is not None:
            batch["net_input"]["prev_output_tokens"] = prev_output_tokens
        if self.align_dataset is not None and target is not None:
            # dense (B, T_tgt, T_src) alignment weights: for every aligned
            # (src, tgt) pair, 1/#alignments-of-that-tgt (the reference
            # align_weights normalization, lspcwa criterion :59-71)
            t_tgt, t_src = target.shape[1], src_tokens.shape[1]
            weights = np.zeros((target.shape[0], t_tgt, t_src), np.float32)
            ordered = [samples[i] for i in sort_order]
            for row, s in enumerate(ordered):
                align = s.get("alignment")
                if align is None or len(align) == 0:
                    continue
                align = align[
                    (align[:, 0] < t_src) & (align[:, 1] < t_tgt)
                ]
                if self.left_pad_source:
                    # src positions count from the right-aligned sentence
                    offset = t_src - src_lengths[row]
                    align = align.copy()
                    align[:, 0] += offset
                counts = np.bincount(align[:, 1], minlength=t_tgt)
                w = 1.0 / np.maximum(counts[align[:, 1]], 1)
                weights[row, align[:, 1], align[:, 0]] = w
            batch["align_weights"] = weights
        return batch

    def num_tokens(self, index):
        return max(
            self.src_sizes[index],
            self.tgt_sizes[index] if self.tgt_sizes is not None else 0,
        )

    def num_tokens_vec(self, indices):
        toks = np.asarray(self.src_sizes)[indices]
        if self.tgt_sizes is not None:
            toks = np.maximum(toks, np.asarray(self.tgt_sizes)[indices])
        return toks.astype(np.int64)

    def filter_indices_by_size(self, indices, max_positions,
                               raise_exception=False):
        from .batching import filter_by_size_vec

        return filter_by_size_vec(
            indices, self.src_sizes, self.tgt_sizes, max_positions,
            raise_exception=raise_exception,
        )

    def size(self, index):
        return (
            self.src_sizes[index],
            self.tgt_sizes[index] if self.tgt_sizes is not None else 0,
        )

    @property
    def sizes(self):
        return self.src_sizes

    def ordered_indices(self):
        """Sort by target then source length when shuffling (reference
        language_pair_dataset.py ordered_indices)."""
        if self.shuffle:
            indices = np.random.permutation(len(self)).astype(np.int64)
        else:
            indices = np.arange(len(self), dtype=np.int64)
        if self.tgt_sizes is not None:
            indices = indices[np.argsort(self.tgt_sizes[indices], kind="mergesort")]
        return indices[np.argsort(self.src_sizes[indices], kind="mergesort")]
