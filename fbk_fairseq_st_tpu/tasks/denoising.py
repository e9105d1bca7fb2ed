"""denoising task: BART-style seq2seq denoising pretraining.

Counterpart of fairseq/tasks/denoising.py:28-171: token blocks wrapped in
<s>...</s>, noised by DenoisingDataset (mask spans / permute sentences /
insert / rotate), trained to reconstruct the original."""

from __future__ import annotations

import logging
import os

from ..data.denoising_dataset import DenoisingDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.mask_tokens import get_whole_word_mask
from ..data.monolingual import TokenBlockDataset
from ..data.wrappers import (
    AppendTokenDataset,
    PrependTokenDataset,
    StripTokenDataset,
)
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


@register_task("denoising")
class DenoisingTask(Task):
    @staticmethod
    def add_args(parser):
        # reference denoising.py:33-88
        parser.add_argument("data", help="path to data directory")
        parser.add_argument("--tokens-per-sample", default=512, type=int)
        parser.add_argument("--sample-break-mode", default="complete", type=str)
        parser.add_argument("--mask", default=0.0, type=float,
                            help="fraction of words/subwords to mask")
        parser.add_argument("--mask-random", default=0.0, type=float,
                            help="use random token instead of [MASK] this often")
        parser.add_argument("--insert", default=0.0, type=float,
                            help="insert this fraction of additional random tokens")
        parser.add_argument("--permute", default=0.0, type=float)
        parser.add_argument("--rotate", default=0.5, type=float,
                            help="rotate this proportion of inputs")
        parser.add_argument("--poisson-lambda", default=3.0, type=float)
        parser.add_argument("--permute-sentences", default=0.0, type=float)
        parser.add_argument("--mask-length", default="subword", type=str,
                            choices=["subword", "word", "span-poisson"])
        parser.add_argument("--replace-length", default=-1, type=int,
                            help="replace masked spans with 0, 1, or N "
                                 "tokens (-1 for N)")
        parser.add_argument("--max-source-positions", default=1024, type=int,
                            metavar="N")
        parser.add_argument("--max-target-positions", default=1024, type=int,
                            metavar="N")
        parser.add_argument("--shuffle-instance", action="store_true",
                            default=False)

    def __init__(self, args, dictionary):
        super().__init__(args)
        self.dictionary = dictionary
        self.seed = args.seed
        self.mask_idx = self.dictionary.add_symbol("<mask>")

    @classmethod
    def setup_task(cls, args, **kwargs):
        dictionary = Dictionary.load(os.path.join(args.data, "dict.txt"))
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
        ds = StripTokenDataset(ds, self.dictionary.eos())
        ds = TokenBlockDataset(
            ds,
            ds.sizes,
            self.args.tokens_per_sample - 2,  # room for <s> and </s>
            pad=self.dictionary.pad(),
            eos=self.dictionary.eos(),
            break_mode=self.args.sample_break_mode,
        )
        ds = PrependTokenDataset(ds, self.source_dictionary.bos())
        ds = AppendTokenDataset(ds, self.source_dictionary.eos())

        mask_whole_words = (
            get_whole_word_mask(None, self.source_dictionary)
            if self.args.mask_length != "subword"
            else None
        )
        self.datasets[split] = DenoisingDataset(
            ds, ds.sizes, self.dictionary, self.mask_idx, mask_whole_words,
            shuffle=self.args.shuffle_instance, seed=self.seed,
            args=self.args,
        )
        logger.info(
            "Split: {}, Loaded {} samples of denoising_dataset".format(
                split, len(self.datasets[split])
            )
        )

    def max_positions(self):
        return (self.args.max_source_positions, self.args.max_target_positions)

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary
