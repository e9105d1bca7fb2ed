"""dummy_lm / dummy seq2seq benchmark tasks (reference fairseq/benchmark/
dummy_lm.py, dummy_model.py): synthetic token batches for perf measurement
without data."""

from __future__ import annotations

import numpy as np

from ..data.dictionary import Dictionary
from ..data.language_pair_dataset import LanguagePairDataset
from ..registry import register_task
from ..tasks.base import Task


class _SyntheticTokens:
    def __init__(self, n, length, vocab, seed):
        rng = np.random.RandomState(seed)
        self.items = [
            np.concatenate(
                [rng.randint(4, vocab, size=length - 1), [2]]
            ).astype(np.int64)
            for _ in range(n)
        ]
        self.sizes = np.full((n,), length, np.int64)

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def size(self, i):
        return int(self.sizes[i])


@register_task("dummy_seq2seq")
class DummySeq2SeqTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", nargs="?", default="")
        parser.add_argument("--dict-size", default=8000, type=int)
        parser.add_argument("--dataset-size", default=1024, type=int)
        parser.add_argument("--src-len", default=32, type=int)
        parser.add_argument("--tgt-len", default=32, type=int)
        parser.add_argument("--max-source-positions", default=1024, type=int)
        parser.add_argument("--max-target-positions", default=1024, type=int)

    def __init__(self, args, d):
        super().__init__(args)
        self.d = d

    @classmethod
    def setup_task(cls, args, **kwargs):
        d = Dictionary()
        for i in range(args.dict_size - 4):
            d.add_symbol(f"tok{i}")
        d.finalize(padding_factor=8)
        return cls(args, d)

    def load_dataset(self, split, combine=False, **kwargs):
        src = _SyntheticTokens(
            self.args.dataset_size, self.args.src_len, len(self.d), 0
        )
        tgt = _SyntheticTokens(
            self.args.dataset_size, self.args.tgt_len, len(self.d), 1
        )
        self.datasets[split] = LanguagePairDataset(
            src, src.sizes, self.d, tgt, tgt.sizes, self.d, shuffle=False
        )

    @property
    def source_dictionary(self):
        return self.d

    @property
    def target_dictionary(self):
        return self.d
