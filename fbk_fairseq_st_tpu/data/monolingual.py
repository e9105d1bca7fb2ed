"""Monolingual LM data: token-block chunking + LM dataset.

Counterparts of fairseq/data/token_block_dataset.py (Cython-backed
_get_slice_indices_fast — here plain NumPy since this is one-time host-side
index math) and fairseq/data/monolingual_dataset.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .datasets import Dataset, collate_tokens


def _complete_blocks(sizes: np.ndarray, block_size: int) -> np.ndarray:
    """Greedy whole-sentence packing into <=block_size blocks — the loop
    the reference compiles with Cython (token_block_utils_fast.pyx); here
    the C++ twin in native/batching.cpp with this Python fallback."""
    from ..native.build import load_library

    lib = load_library("batching")
    if lib is not None and len(sizes):
        import ctypes

        fn = lib.token_block_complete
        fn.restype = ctypes.c_int64
        p = ctypes.POINTER(ctypes.c_int64)
        fn.argtypes = [p, ctypes.c_int64, ctypes.c_int64, p, p]
        s = np.ascontiguousarray(sizes, dtype=np.int64)
        starts = np.empty(len(s), np.int64)
        ends = np.empty(len(s), np.int64)
        n = fn(s.ctypes.data_as(p), len(s), block_size,
               starts.ctypes.data_as(p), ends.ctypes.data_as(p))
        return np.stack([starts[:n], ends[:n]], axis=1)

    out = []
    tok_idx = 0
    sz_idx = 0
    curr_size = 0
    while sz_idx < len(sizes):
        if curr_size + sizes[sz_idx] <= block_size or curr_size == 0:
            curr_size += int(sizes[sz_idx])
            sz_idx += 1
        else:
            out.append((tok_idx, tok_idx + curr_size))
            tok_idx += curr_size
            curr_size = 0
    if curr_size > 0:
        out.append((tok_idx, tok_idx + curr_size))
    return np.array(out, dtype=np.int64)


class TokenBlockDataset(Dataset):
    """Chunk a stream of items into blocks.

    break_mode:
      * 'none': concatenate everything, fixed block_size chunks;
      * 'complete': blocks of whole sentences up to block_size;
      * 'eos': one sentence per block.
    """

    def __init__(self, dataset, sizes, block_size: Optional[int],
                 pad: int, eos: int, break_mode: str = "none",
                 include_targets: bool = False):
        self.dataset = dataset
        self.pad = pad
        self.eos = eos
        self.include_targets = include_targets
        sizes = np.asarray(sizes, dtype=np.int64)

        if break_mode is None:
            break_mode = "none"
        if break_mode == "none":
            total = int(sizes.sum())
            length = max(block_size, 1)
            starts = np.arange(0, total, length, dtype=np.int64)
            ends = np.minimum(starts + length, total)
            slice_indices = np.stack([starts, ends], axis=1)
        elif break_mode == "complete":
            slice_indices = _complete_blocks(sizes, int(block_size))
        elif break_mode == "eos":
            cum = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
            slice_indices = np.stack([cum[:-1], cum[1:]], axis=1)
        else:
            raise ValueError(f"invalid break_mode: {break_mode}")

        self.slice_indices = slice_indices.reshape(-1, 2)
        self._sizes = self.slice_indices[:, 1] - self.slice_indices[:, 0]
        # item -> (first dataset idx, offset) map for lazy reads
        self._ds_sizes = sizes
        self._cum = np.concatenate([[0], np.cumsum(sizes)])

    def _read_range(self, start: int, end: int) -> np.ndarray:
        first = int(np.searchsorted(self._cum, start, side="right") - 1)
        out = []
        pos = self._cum[first]
        i = first
        while pos < end and i < len(self._ds_sizes):
            item = np.asarray(self.dataset[i])
            s = max(start - pos, 0)
            e = min(end - pos, len(item))
            out.append(item[int(s): int(e)])
            pos += len(item)
            i += 1
        return np.concatenate(out) if out else np.array([], np.int64)

    def __getitem__(self, index):
        start, end = self.slice_indices[index]
        return self._read_range(int(start), int(end))

    def __len__(self):
        return len(self.slice_indices)

    @property
    def sizes(self):
        return self._sizes

    def num_tokens(self, index):
        return int(self._sizes[index])

    def size(self, index):
        return int(self._sizes[index])


class MonolingualDataset(Dataset):
    """LM dataset: inputs = tokens shifted right with eos prepended,
    targets = tokens (reference monolingual_dataset.py 'future' target)."""

    def __init__(self, dataset, sizes, vocab, shuffle: bool = False):
        self.dataset = dataset
        self._sizes = np.asarray(sizes)
        self.vocab = vocab
        self.shuffle = shuffle

    def __getitem__(self, index):
        tokens = np.asarray(self.dataset[index])
        source = np.concatenate([[self.vocab.eos()], tokens[:-1]])
        return {"id": index, "source": source, "target": tokens}

    def __len__(self):
        return len(self.dataset)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        pad = self.vocab.pad()
        eos = self.vocab.eos()
        ids = np.array([s["id"] for s in samples], np.int64)
        src = collate_tokens(
            [s["source"] for s in samples], pad, eos,
            pad_to_length=pad_to_tgt_len,
        )
        tgt = collate_tokens(
            [s["target"] for s in samples], pad, eos,
            pad_to_length=pad_to_tgt_len,
        )
        lengths = np.array([len(s["source"]) for s in samples], np.int64)
        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences
            ids = np.concatenate([ids, np.full(extra, -1, np.int64)])
            src = np.concatenate([src, np.full((extra, src.shape[1]), pad, src.dtype)])
            tgt = np.concatenate([tgt, np.full((extra, tgt.shape[1]), pad, tgt.dtype)])
            lengths = np.concatenate([lengths, np.zeros(extra, np.int64)])
        return {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": int(sum(len(s["target"]) for s in samples)),
            "net_input": {
                "src_tokens": src,
                "src_lengths": lengths,
            },
            "target": tgt,
        }

    def num_tokens(self, index):
        return int(self._sizes[index])

    def size(self, index):
        return int(self._sizes[index])

    @property
    def sizes(self):
        return self._sizes

    def ordered_indices(self):
        if self.shuffle:
            order = np.random.permutation(len(self)).astype(np.int64)
        else:
            order = np.arange(len(self), dtype=np.int64)
        return order[np.argsort(self._sizes[order], kind="mergesort")]


class LMContextWindowDataset(Dataset):
    """Sliding-window LM evaluation (reference
    data/lm_context_window_dataset.py): each collated batch row is prefixed
    with up to ``context_window`` tokens of trailing context carried over
    from previously collated rows; context positions receive pad targets so
    the NLL is scored only over the fresh window. The collater is stateful
    across calls — evaluate in order, single process."""

    def __init__(self, dataset, tokens_per_sample: int, context_window: int,
                 pad_idx: int):
        assert context_window > 0
        self.dataset = dataset
        self.tokens_per_sample = tokens_per_sample
        self.context_window = context_window
        self.pad_idx = pad_idx
        self._carry = np.empty(0, np.int64)

    def __getitem__(self, index):
        return self.dataset[index]

    def __len__(self):
        return len(self.dataset)

    def collater(self, samples, **unused):
        base = self.dataset.collater(samples)
        if not base:
            return base
        pad = self.pad_idx
        cw = self.context_window
        budget = self.tokens_per_sample + cw

        toks = np.asarray(base["net_input"]["src_tokens"])
        tgt = np.asarray(base["target"])
        lengths = np.asarray(base["net_input"]["src_lengths"]).copy()
        bsz, tsz = toks.shape
        out_toks = np.full((bsz, tsz + cw), pad, np.int64)
        out_tgt = np.full((bsz, tsz + cw), pad, np.int64)
        starts = np.zeros(bsz, np.int64)
        for i in range(bsz):
            row_len = int((toks[i] != pad).sum())
            # trim carried context so context + sample fits the budget
            overflow = len(self._carry) + row_len - budget
            if overflow > 0:
                self._carry = self._carry[overflow:]
            c = len(self._carry)
            out_toks[i, :c] = self._carry
            out_toks[i, c:c + tsz] = toks[i]
            out_tgt[i, c:c + tsz] = tgt[i]
            starts[i] = c
            lengths[i] += c
            row = out_toks[i]
            self._carry = row[row != pad][-cw:].astype(np.int64)
        base["net_input"]["src_tokens"] = out_toks
        base["net_input"]["src_lengths"] = lengths
        base["target"] = out_tgt
        base["start_indices"] = starts
        return base

    def num_tokens(self, index):
        return self.dataset.num_tokens(index)

    def size(self, index):
        return self.dataset.size(index)

    @property
    def sizes(self):
        return self.dataset.sizes

    def ordered_indices(self):
        return self.dataset.ordered_indices()
