"""multilingual_denoising task: mBART pretraining over per-language corpora.

Counterpart of fairseq/tasks/multilingual_denoising.py:27-222: per-language
``data/<lang>/<split>`` denoising datasets (optionally terminated by a
``[lang]`` token with --add-lang-token) concatenated with alpha-smoothed
resampling for the train split."""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.datasets import ConcatDataset
from ..data.denoising_dataset import DenoisingDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.mask_tokens import get_whole_word_mask
from ..data.monolingual import TokenBlockDataset
from ..data.wrappers import (
    AppendTokenDataset,
    PrependTokenDataset,
    ResamplingDataset,
    StripTokenDataset,
)
from ..registry import register_task
from .denoising import DenoisingTask

logger = logging.getLogger(__name__)


@register_task("multilingual_denoising")
class MultilingualDenoisingTask(DenoisingTask):
    @staticmethod
    def add_args(parser):
        DenoisingTask.add_args(parser)
        parser.add_argument("--multilang-sampling-alpha", type=float,
                            default=1.0)
        parser.add_argument("--add-lang-token", default=False,
                            action="store_true")
        parser.add_argument("--langs", type=str, default=None,
                            help="comma-separated language ids")
        # reference multilingual_denoising.py:40-41 (scripts without word
        # segmentation fall back to subword masking)
        parser.add_argument("--no-whole-word-mask-langs", type=str,
                            default="", metavar="N",
                            help="languages without spacing between words "
                                 "(do not use whole-word masking)")

    @classmethod
    def setup_task(cls, args, **kwargs):
        paths = args.data.split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        data_path = paths[0]
        if args.langs is None:
            languages = sorted(
                name for name in os.listdir(data_path)
                if os.path.isdir(os.path.join(data_path, name))
            )
        else:
            languages = args.langs.split(",")
        if getattr(args, "add_lang_token", False):
            for lang in languages:
                dictionary.add_symbol("[{}]".format(lang))
        logger.info("dictionary: {} types".format(len(dictionary)))
        task = cls(args, dictionary)
        task.languages = languages
        return task

    def _get_sample_prob(self, dataset_lens):
        prob = dataset_lens / dataset_lens.sum()
        smoothed = prob ** self.args.multilang_sampling_alpha
        return smoothed / smoothed.sum()

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        languages = self.languages
        mask_whole_words = (
            get_whole_word_mask(None, self.dictionary)
            if self.args.mask_length != "subword" else None
        )
        language_without_segmentations = getattr(
            self.args, "no_whole_word_mask_langs", ""
        ).split(",")
        lang_datasets = []
        for language in languages:
            split_path = os.path.join(data_path, language, split)
            ds = load_indexed_dataset(
                split_path, self.dictionary,
                getattr(self.args, "dataset_impl", None),
            )
            if ds is None:
                raise FileNotFoundError(
                    "Dataset not found: {} ({})".format(split, split_path)
                )
            end_token = (
                self.dictionary.index("[{}]".format(language))
                if self.args.add_lang_token
                else self.dictionary.eos()
            )
            ds = StripTokenDataset(ds, self.dictionary.eos())
            ds = TokenBlockDataset(
                ds, ds.sizes, self.args.tokens_per_sample - 2,
                pad=self.dictionary.pad(), eos=end_token,
                break_mode=self.args.sample_break_mode,
            )
            ds = PrependTokenDataset(ds, self.dictionary.bos())
            ds = AppendTokenDataset(ds, end_token)
            lang_mask_whole_words = (
                mask_whole_words
                if language not in language_without_segmentations
                else None
            )
            lang_datasets.append(
                DenoisingDataset(
                    ds, ds.sizes, self.dictionary, self.mask_idx,
                    lang_mask_whole_words,
                    shuffle=self.args.shuffle_instance,
                    seed=self.seed, args=self.args, eos=end_token,
                )
            )

        if split == getattr(self.args, "train_subset", "train"):
            lens = np.array([len(d) for d in lang_datasets], np.float64)
            probs = self._get_sample_prob(lens)
            size_ratios = (probs * lens.sum()) / lens
            dataset = ConcatDataset(
                [
                    ResamplingDataset(
                        d, size_ratio=float(r), seed=self.args.seed,
                        epoch=epoch,
                    )
                    for d, r in zip(lang_datasets, size_ratios)
                ]
            )
        else:
            dataset = ConcatDataset(lang_datasets)
        self.datasets[split] = dataset
