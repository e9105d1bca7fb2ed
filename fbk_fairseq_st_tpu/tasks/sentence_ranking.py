"""sentence_ranking task: choose among N candidate sentences.

Counterpart of fairseq/tasks/sentence_ranking.py:30-160: data laid out as
``data/input0`` (shared context) + ``data/input1..inputN`` (options) +
``data/label`` (0-based option index, raw text); every option is
concatenated with the context and scored by a single-output ranking head
(:157 registers it with num_classes=1)."""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.datasets import Dataset, collate_tokens
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.wrappers import ConcatSentencesDataset, PrependTokenDataset, TruncateDataset
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


class SentenceRankingDataset(Dataset):
    def __init__(self, options, labels, pad_idx, shuffle=True):
        self.options = options  # list of N datasets
        self.labels = labels
        self.pad_idx = pad_idx
        self.shuffle = shuffle

    def __getitem__(self, index):
        return {
            "id": index,
            "options": [np.asarray(o[index]) for o in self.options],
            "target": (
                int(self.labels[index]) if self.labels is not None else None
            ),
        }

    def __len__(self):
        return len(self.options[0])

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        ids = np.array([s["id"] for s in samples], np.int64)
        batch = {"id": ids, "nsentences": len(samples)}
        ntokens = 0
        n_opts = len(samples[0]["options"])
        for idx in range(n_opts):
            toks = [s["options"][idx] for s in samples]
            src = collate_tokens(toks, self.pad_idx,
                                 pad_to_length=pad_to_src_len)
            lengths = np.array([len(t) for t in toks], np.int64)
            ntokens += int(lengths.sum())
            if pad_to_bsz is not None and pad_to_bsz > len(samples):
                extra = pad_to_bsz - len(samples)
                src = np.concatenate(
                    [src, np.full((extra, src.shape[1]), self.pad_idx,
                                  src.dtype)]
                )
                lengths = np.concatenate([lengths, np.zeros(extra, np.int64)])
            batch[f"net_input{idx + 1}"] = {
                "src_tokens": src, "src_lengths": lengths,
            }
        if samples[0]["target"] is not None:
            target = np.array([s["target"] for s in samples], np.int64)
            if pad_to_bsz is not None and pad_to_bsz > len(samples):
                target = np.concatenate(
                    [target, np.full(pad_to_bsz - len(samples), -1, np.int64)]
                )
            batch["target"] = target
        if pad_to_bsz is not None and pad_to_bsz > len(samples):
            batch["id"] = np.concatenate(
                [ids, np.full(pad_to_bsz - len(samples), -1, np.int64)]
            )
        batch["ntokens"] = ntokens
        # the trainer's jitted step consumes a flat net_input; expose
        # option 1 as the nominal input (criterion reads all of them)
        batch["net_input"] = batch["net_input1"]
        return batch

    def num_tokens(self, index):
        return max(len(np.asarray(o[index])) for o in self.options)

    def size(self, index):
        return self.num_tokens(index)

    @property
    def sizes(self):
        return np.maximum.reduce(
            [np.asarray(o.sizes) for o in self.options]
        )

    def ordered_indices(self):
        if self.shuffle:
            return np.random.permutation(len(self)).astype(np.int64)
        return np.arange(len(self), dtype=np.int64)


@register_task("sentence_ranking")
class SentenceRankingTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", metavar="FILE")
        parser.add_argument("--num-classes", type=int,
                            help="number of sentences to be ranked")
        parser.add_argument("--init-token", type=int, default=None)
        parser.add_argument("--separator-token", type=int, default=None)
        parser.add_argument("--no-shuffle", action="store_true")
        parser.add_argument("--truncate-sequence", action="store_true")
        parser.add_argument("--max-option-length", type=int, default=None)

    def __init__(self, args, dictionary):
        super().__init__(args)
        self.dictionary = dictionary
        if not hasattr(args, "max_positions") or args.max_positions is None:
            args.max_positions = 512

    @classmethod
    def load_dictionary(cls, args, filename, source=True):
        d = Dictionary.load(filename)
        d.add_symbol("<mask>")
        return d

    @classmethod
    def setup_task(cls, args, **kwargs):
        assert getattr(args, "criterion", "sentence_ranking") == (
            "sentence_ranking"
        ), "Must set --criterion=sentence_ranking"
        data_dict = cls.load_dictionary(
            args, os.path.join(args.data, "input0", "dict.txt")
        )
        logger.info("[input] dictionary: {} types".format(len(data_dict)))
        return cls(args, data_dict)

    def build_model(self, args):
        from ..registry import build_model

        model = build_model(args, self)
        model.register_classification_head(
            getattr(args, "ranking_head_name", "sentence_classification_head"),
            num_classes=1,
        )
        return model

    def load_dataset(self, split, combine=False, **kwargs):
        def get_path(kind):
            return os.path.join(self.args.data, kind, split)

        def make_dataset(kind):
            try:
                return load_indexed_dataset(
                    get_path(kind), self.source_dictionary,
                    getattr(self.args, "dataset_impl", None),
                )
            except FileNotFoundError:
                return None

        input0 = make_dataset("input0")
        input_options = [
            make_dataset("input{}".format(i + 1))
            for i in range(self.args.num_classes)
        ]
        if self.args.separator_token is not None:
            input0 = PrependTokenDataset(input0, self.args.separator_token)

        options = []
        for opt in input_options:
            if self.args.init_token is not None:
                opt = PrependTokenDataset(opt, self.args.init_token)
            if self.args.max_option_length is not None:
                opt = TruncateDataset(opt, self.args.max_option_length)
            src = ConcatSentencesDataset(opt, input0)
            if self.args.truncate_sequence:
                src = TruncateDataset(src, self.args.max_positions)
            options.append(src)

        labels = None
        label_path = "{}.label".format(get_path("label"))
        if os.path.exists(label_path):
            with open(label_path) as f:
                labels = [int(line.strip()) for line in f]

        self.datasets[split] = SentenceRankingDataset(
            options, labels, self.source_dictionary.pad(),
            shuffle=not self.args.no_shuffle,
        )
        logger.info(
            "Loaded {} with #samples: {}".format(
                split, len(self.datasets[split])
            )
        )

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary

    def max_positions(self):
        return (self.args.max_positions, self.args.max_positions)
