"""sentence_prediction task: sentence(-pair) classification / regression
(GLUE-style RoBERTa fine-tuning).

Counterpart of fairseq/tasks/sentence_prediction.py:35-228: data laid out as
``data/input0`` (+ optional ``input1``) indexed datasets with ``dict.txt``,
labels either as an indexed dataset under ``data/label`` (classification;
ids offset by the label dictionary's nspecial) or a raw ``{split}.label``
float file (regression). ``<mask>`` is added to the data dictionary so
pretrained masked-LM checkpoints keep their vocab size (:81-89)."""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.datasets import Dataset, collate_tokens
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.wrappers import (
    ConcatSentencesDataset,
    OffsetTokensDataset,
    PrependTokenDataset,
    RawLabelDataset,
    StripTokenDataset,
    TruncateDataset,
)
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


class SentencePredictionDataset(Dataset):
    def __init__(self, src, labels, pad_idx, regression: bool,
                 shuffle: bool = True, add_prev_output_tokens: bool = False):
        self.src = src
        self.labels = labels
        self.pad_idx = pad_idx
        self.regression = regression
        self.shuffle = shuffle
        self.add_prev_output_tokens = add_prev_output_tokens

    def __getitem__(self, index):
        target = None
        if self.labels is not None:
            target = np.asarray(self.labels[index])
        return {
            "id": index,
            "source": np.asarray(self.src[index]),
            "target": target,
        }

    def __len__(self):
        return len(self.src)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        ids = np.array([s["id"] for s in samples], np.int64)
        src = collate_tokens(
            [s["source"] for s in samples], self.pad_idx,
            pad_to_length=pad_to_src_len,
        )
        lengths = np.array([len(s["source"]) for s in samples], np.int64)
        target = None
        if samples[0]["target"] is not None:
            if self.regression:
                target = np.stack(
                    [np.atleast_1d(s["target"]).astype(np.float32)
                     for s in samples]
                )
            else:
                target = np.array(
                    [int(np.asarray(s["target"]).reshape(-1)[0]) for s in samples],
                    np.int64,
                )
        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences
            ids = np.concatenate([ids, np.full(extra, -1, np.int64)])
            src = np.concatenate(
                [src, np.full((extra, src.shape[1]), self.pad_idx, src.dtype)]
            )
            lengths = np.concatenate([lengths, np.zeros(extra, np.int64)])
            if target is not None:
                pad_rows = (
                    np.zeros((extra,) + target.shape[1:], target.dtype)
                    if self.regression
                    else np.full(extra, -1, np.int64)
                )
                target = np.concatenate([target, pad_rows])
        net_input = {"src_tokens": src, "src_lengths": lengths}
        if self.add_prev_output_tokens:
            # reference sentence_prediction.py:160-167: per-item roll of the
            # source by 1 (RollDataset), right-padded — lets BART-style
            # encoder-decoder classification heads run teacher-forced
            prev = collate_tokens(
                [np.roll(s["source"], 1) for s in samples], self.pad_idx,
                pad_to_length=pad_to_src_len,
            )
            if src.shape[0] > prev.shape[0]:  # pad_to_bsz rows
                prev = np.concatenate([
                    prev,
                    np.full((src.shape[0] - prev.shape[0], prev.shape[1]),
                            self.pad_idx, prev.dtype),
                ])
            net_input["prev_output_tokens"] = prev
        return {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": int(lengths.sum()),
            "net_input": net_input,
            "target": target,
        }

    def num_tokens(self, index):
        return self.src.num_tokens(index)

    def size(self, index):
        return self.src.size(index)

    @property
    def sizes(self):
        return self.src.sizes

    def ordered_indices(self):
        if self.shuffle:
            return np.random.permutation(len(self)).astype(np.int64)
        return np.arange(len(self), dtype=np.int64)


@register_task("sentence_prediction")
class SentencePredictionTask(Task):
    @staticmethod
    def add_args(parser):
        # reference tasks/sentence_prediction.py:44-59
        parser.add_argument("data", metavar="FILE", help="file prefix for data")
        parser.add_argument("--num-classes", type=int, default=-1)
        parser.add_argument("--init-token", type=int, default=None,
                            help="add token at the beginning of each item")
        parser.add_argument("--separator-token", type=int, default=None,
                            help="add separator token between inputs")
        parser.add_argument("--regression-target", action="store_true",
                            default=False)
        parser.add_argument("--no-shuffle", action="store_true", default=False)
        parser.add_argument("--truncate-sequence", action="store_true",
                            default=False)
        # reference sentence_prediction.py:58-59
        parser.add_argument("--add-prev-output-tokens", action="store_true",
                            default=False,
                            help="add prev_output_tokens to sample, used for "
                                 "encoder-decoder arch")
        # --max-positions comes from the model args (roberta add_args)

    def __init__(self, args, data_dictionary, label_dictionary):
        super().__init__(args)
        self.dictionary = data_dictionary
        self._label_dictionary = label_dictionary
        if not hasattr(args, "max_positions") or args.max_positions is None:
            args.max_positions = 512

    @classmethod
    def load_dictionary(cls, args, filename, source=True):
        d = Dictionary.load(filename)
        d.add_symbol("<mask>")
        return d

    @classmethod
    def setup_task(cls, args, **kwargs):
        assert args.num_classes > 0, "Must set --num-classes"
        data_dict = cls.load_dictionary(
            args, os.path.join(args.data, "input0", "dict.txt")
        )
        logger.info("[input] dictionary: {} types".format(len(data_dict)))
        if not args.regression_target:
            label_dict = cls.load_dictionary(
                args, os.path.join(args.data, "label", "dict.txt"),
                source=False,
            )
            logger.info("[label] dictionary: {} types".format(len(label_dict)))
        else:
            label_dict = data_dict
        return cls(args, data_dict, label_dict)

    def load_dataset(self, split, combine=False, **kwargs):
        def get_path(kind):
            return os.path.join(self.args.data, kind, split)

        def make_dataset(kind, dictionary):
            try:
                return load_indexed_dataset(
                    get_path(kind), dictionary,
                    getattr(self.args, "dataset_impl", None),
                )
            except FileNotFoundError:
                return None

        input0 = make_dataset("input0", self.source_dictionary)
        assert input0 is not None, "could not find dataset: {}".format(
            get_path("input0")
        )
        input1 = make_dataset("input1", self.source_dictionary)

        if self.args.init_token is not None:
            input0 = PrependTokenDataset(input0, self.args.init_token)
        if input1 is None:
            src_tokens = input0
        else:
            if self.args.separator_token is not None:
                input1 = PrependTokenDataset(
                    input1, self.args.separator_token
                )
            src_tokens = ConcatSentencesDataset(input0, input1)
        if self.args.truncate_sequence:
            src_tokens = TruncateDataset(src_tokens, self.args.max_positions)

        labels = None
        if not self.args.regression_target:
            label_ds = make_dataset("label", self._label_dictionary)
            if label_ds is not None:
                labels = OffsetTokensDataset(
                    StripTokenDataset(
                        label_ds, id_to_strip=self._label_dictionary.eos()
                    ),
                    offset=-self._label_dictionary.nspecial,
                )
        else:
            label_path = get_path("label") + ".label"
            if os.path.exists(label_path):
                with open(label_path) as f:
                    labels = RawLabelDataset(
                        [
                            np.array([float(x) for x in line.split()],
                                     np.float32)
                            for line in f
                        ]
                    )

        self.datasets[split] = SentencePredictionDataset(
            src_tokens, labels, self.source_dictionary.pad(),
            regression=self.args.regression_target,
            shuffle=not self.args.no_shuffle,
            add_prev_output_tokens=getattr(
                self.args, "add_prev_output_tokens", False
            ),
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
        return self._label_dictionary

    @property
    def label_dictionary(self):
        return self._label_dictionary

    def max_positions(self):
        return (self.args.max_positions, self.args.max_positions)
