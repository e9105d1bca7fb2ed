"""multilingual_masked_lm task: XLM-R-style masked LM over per-language
corpora.

Counterpart of fairseq/tasks/multilingual_masked_lm.py:36-317: data lives in
``data/<lang>/<split>`` subdirectories sharing one dictionary; the train
split concatenates every language resampled by the alpha-smoothed size
distribution (:109-117), upweighting low-resource languages."""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.datasets import ConcatDataset
from ..data.indexed_dataset import load_indexed_dataset
from ..data.mask_tokens import (
    MaskedLMDataset,
    MaskedTokensPair,
    get_whole_word_mask,
)
from ..data.monolingual import TokenBlockDataset
from ..data.wrappers import PrependTokenDataset, ResamplingDataset
from ..registry import register_task
from .masked_lm import MaskedLMTask

logger = logging.getLogger(__name__)


@register_task("multilingual_masked_lm")
class MultilingualMaskedLMTask(MaskedLMTask):
    @staticmethod
    def add_args(parser):
        MaskedLMTask.add_args(parser)
        parser.add_argument("--multilang-sampling-alpha", type=float,
                            default=1.0,
                            help="smoothing alpha for language sampling "
                                 "(<1 upweights low-resource languages)")

    def _get_sample_prob(self, dataset_lens):
        """Reference multilingual_masked_lm.py:109-117."""
        prob = dataset_lens / dataset_lens.sum()
        smoothed = prob ** self.args.multilang_sampling_alpha
        return smoothed / smoothed.sum()

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        languages = sorted(
            name for name in os.listdir(data_path)
            if os.path.isdir(os.path.join(data_path, name))
        )
        logger.info(
            "Training on {} languages: {}".format(len(languages), languages)
        )
        mask_whole_words = (
            get_whole_word_mask(None, self.dictionary)
            if self.args.mask_whole_words else None
        )
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
            ds = TokenBlockDataset(
                ds, ds.sizes, self.args.tokens_per_sample - 1,
                pad=self.dictionary.pad(), eos=self.dictionary.eos(),
                break_mode=self.args.sample_break_mode,
            )
            ds = PrependTokenDataset(ds, self.dictionary.bos())
            pair = MaskedTokensPair(
                ds, self.dictionary,
                pad_idx=self.dictionary.pad(), mask_idx=self.mask_idx,
                seed=self.args.seed,
                mask_prob=self.args.mask_prob,
                leave_unmasked_prob=self.args.leave_unmasked_prob,
                random_token_prob=self.args.random_token_prob,
                freq_weighted_replacement=self.args.freq_weighted_replacement,
                mask_whole_words=mask_whole_words,
            )
            lang_datasets.append(
                MaskedLMDataset(pair, self.dictionary.pad(), shuffle=False)
            )

        if split == getattr(self.args, "train_subset", "train"):
            lens = np.array([len(d) for d in lang_datasets], np.float64)
            probs = self._get_sample_prob(lens)
            size_ratios = (probs * lens.sum()) / lens
            logger.info(
                "Up/Down Sampling ratio by language: {}".format(
                    {
                        lang: "{:.2f}".format(r)
                        for lang, r in zip(languages, size_ratios)
                    }
                )
            )
            resampled = [
                ResamplingDataset(
                    d, size_ratio=float(r), seed=self.args.seed, epoch=epoch,
                )
                for d, r in zip(lang_datasets, size_ratios)
            ]
            dataset = ConcatDataset(resampled)
        else:
            dataset = ConcatDataset(lang_datasets)
        self.datasets[split] = dataset
