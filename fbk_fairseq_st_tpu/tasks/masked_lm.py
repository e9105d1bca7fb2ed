"""masked_lm task: BERT/RoBERTa-style pretraining over token blocks.

Counterpart of fairseq/tasks/masked_lm.py:32-194: indexed dataset ->
TokenBlockDataset(tokens_per_sample - 1) -> prepend <s> (= [CLS]) ->
masked src/tgt pair under a per-(seed, epoch, index) RNG. The <mask> symbol
is added to the dictionary at task setup (:68)."""

from __future__ import annotations

import logging
import os

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.mask_tokens import (
    MaskedLMDataset,
    MaskedTokensPair,
    get_whole_word_mask,
)
from ..data.monolingual import TokenBlockDataset
from ..data.wrappers import PrependTokenDataset
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


@register_task("masked_lm")
class MaskedLMTask(Task):
    @staticmethod
    def add_args(parser):
        # reference tasks/masked_lm.py:37-60
        parser.add_argument("data", help="colon separated path to data "
                            "directories (round-robin over epochs)")
        parser.add_argument("--sample-break-mode", default="complete",
                            choices=["none", "complete", "eos"])
        parser.add_argument("--tokens-per-sample", default=512, type=int,
                            help="max tokens per sample")
        parser.add_argument("--mask-prob", default=0.15, type=float,
                            help="probability of replacing a token with mask")
        parser.add_argument("--leave-unmasked-prob", default=0.1, type=float,
                            help="probability that a masked token is unmasked")
        parser.add_argument("--random-token-prob", default=0.1, type=float,
                            help="probability of replacing a token with a "
                            "random token")
        parser.add_argument("--freq-weighted-replacement", default=False,
                            action="store_true")
        parser.add_argument("--mask-whole-words", default=False,
                            action="store_true")

    def __init__(self, args, dictionary):
        super().__init__(args)
        self.dictionary = dictionary
        self.seed = args.seed
        self.mask_idx = dictionary.add_symbol("<mask>")

    @classmethod
    def setup_task(cls, args, **kwargs):
        paths = args.data.split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        logger.info("dictionary: {} types".format(len(dictionary)))
        return cls(args, dictionary)

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        ds = load_indexed_dataset(
            os.path.join(data_path, split),
            self.dictionary,
            getattr(self.args, "dataset_impl", None),
        )
        if ds is None:
            raise FileNotFoundError(
                "Dataset not found: {} ({})".format(split, data_path)
            )
        ds = TokenBlockDataset(
            ds,
            ds.sizes,
            self.args.tokens_per_sample - 1,  # one less for <s>
            pad=self.dictionary.pad(),
            eos=self.dictionary.eos(),
            break_mode=self.args.sample_break_mode,
        )
        logger.info("loaded {} blocks from: {}".format(len(ds), data_path))
        ds = PrependTokenDataset(ds, self.dictionary.bos())

        mask_whole_words = (
            get_whole_word_mask(None, self.dictionary)
            if self.args.mask_whole_words
            else None
        )
        pair = MaskedTokensPair(
            ds,
            self.dictionary,
            pad_idx=self.dictionary.pad(),
            mask_idx=self.mask_idx,
            seed=self.args.seed,
            mask_prob=self.args.mask_prob,
            leave_unmasked_prob=self.args.leave_unmasked_prob,
            random_token_prob=self.args.random_token_prob,
            freq_weighted_replacement=self.args.freq_weighted_replacement,
            mask_whole_words=mask_whole_words,
        )
        self.datasets[split] = MaskedLMDataset(
            pair, self.dictionary.pad(), shuffle=(split == "train")
        )

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary

    def max_positions(self):
        return (self.args.tokens_per_sample, self.args.tokens_per_sample)
