"""language_modeling task (reference fairseq/tasks/language_modeling.py):
token-block chunked monolingual data for decoder-only LMs."""

from __future__ import annotations

import logging
import os

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.monolingual import MonolingualDataset, TokenBlockDataset
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


@register_task("language_modeling")
class LanguageModelingTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", help="path to data directory")
        parser.add_argument("--sample-break-mode", default="none",
                            choices=["none", "complete", "eos"],
                            help='"none": fixed blocks; "complete": whole '
                            'sentences up to --tokens-per-sample; "eos": one '
                            "sentence per sample")
        parser.add_argument("--tokens-per-sample", default=1024, type=int,
                            help="max tokens per sample for LM dataset")
        parser.add_argument("--max-target-positions", type=int, default=None)

    def __init__(self, args, dictionary):
        super().__init__(args)
        self.dictionary = dictionary
        if getattr(args, "max_target_positions", None) is None:
            args.max_target_positions = args.tokens_per_sample

    @classmethod
    def setup_task(cls, args, **kwargs):
        paths = args.data.split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        logger.info("dictionary: {} types".format(len(dictionary)))
        return cls(args, dictionary)

    def load_dataset(self, split, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        ds = load_indexed_dataset(
            os.path.join(paths[0], split),
            self.dictionary,
            getattr(self.args, "dataset_impl", None),
        )
        if ds is None:
            raise FileNotFoundError(
                f"Dataset not found: {split} ({paths[0]})"
            )
        block = TokenBlockDataset(
            ds,
            ds.sizes,
            self.args.tokens_per_sample,
            pad=self.dictionary.pad(),
            eos=self.dictionary.eos(),
            break_mode=self.args.sample_break_mode,
        )
        self.datasets[split] = MonolingualDataset(
            block, block.sizes, self.dictionary, shuffle=(split == "train")
        )

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary

    def max_positions(self):
        return (
            self.args.max_target_positions,
            self.args.max_target_positions,
        )
