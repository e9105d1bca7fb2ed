"""Legacy masked LM tasks: BERT-style sentence pairs + NSP, and the XLM
cross-lingual MLM.

Counterparts of fairseq/tasks/legacy_masked_lm.py:31-144 and
fairseq/tasks/cross_lingual_lm.py:31-170. Both ride the legacy
BlockPairDataset / LegacyMaskedLMDataset pipeline
(data/legacy_masked_lm.py); cross_lingual_lm concatenates per-language
datasets (the reference samples corpora via MultiCorpusSampledDataset —
concatenation covers the same data with uniform mixing)."""

from __future__ import annotations

import logging
import os

from ..data.datasets import ConcatDataset
from ..data.indexed_dataset import load_indexed_dataset
from ..data.legacy_masked_lm import BlockPairDataset, LegacyMaskedLMDataset
from ..registry import register_task
from .base import Task
from .translation_from_pretrained import MaskedLMDictionary

logger = logging.getLogger(__name__)


class BertDictionary(MaskedLMDictionary):
    """MaskedLMDictionary + [CLS]/[SEP] (reference
    fairseq/data/legacy/masked_lm_dictionary.py:40-56)."""

    def __init__(self, pad="<pad>", eos="</s>", unk="<unk>", mask="<mask>",
                 cls="<cls>", sep="<sep>"):
        super().__init__(pad=pad, eos=eos, unk=unk, mask=mask)
        self.cls_word = cls
        self.sep_word = sep
        self.cls_index = self.add_symbol(cls)
        self.sep_index = self.add_symbol(sep)
        self.nspecial = len(self.symbols)

    def cls(self):
        return self.cls_index

    def sep(self):
        return self.sep_index


@register_task("legacy_masked_lm")
class LegacyMaskedLMTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", help="colon separated path to data "
                            "directories")
        parser.add_argument("--tokens-per-sample", default=512, type=int,
                            help="max tokens per sentence pair half")
        parser.add_argument("--break-mode", default="doc", type=str)
        parser.add_argument("--shuffle-dataset", action="store_true",
                            default=False)

    def __init__(self, args, dictionary):
        super().__init__(args)
        self.dictionary = dictionary
        self.seed = args.seed

    @classmethod
    def dictionary_class(cls):
        return BertDictionary

    @classmethod
    def load_dictionary(cls, filename):
        return BertDictionary.load(filename)

    @classmethod
    def setup_task(cls, args, **kwargs):
        paths = args.data.split(os.pathsep)
        dictionary = cls.load_dictionary(
            os.path.join(paths[0], "dict.txt")
        )
        logger.info("dictionary: {} types".format(len(dictionary)))
        return cls(args, dictionary)

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        ds = load_indexed_dataset(
            os.path.join(data_path, split), self.dictionary,
            getattr(self.args, "dataset_impl", None),
        )
        if ds is None:
            raise FileNotFoundError(
                "Dataset not found: {} ({})".format(split, data_path)
            )
        pairs = BlockPairDataset(
            ds, ds.sizes, self.args.tokens_per_sample // 2,
            pad=self.dictionary.pad(),
            cls=self.dictionary.cls(),
            sep=self.dictionary.sep(),
            seed=self.seed,
        )
        self.datasets[split] = LegacyMaskedLMDataset(
            pairs, self.dictionary, self.dictionary.mask(),
            seed=self.seed, shuffle=self.args.shuffle_dataset,
        )

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary

    @property
    def dictionary_(self):
        return self.dictionary

    def max_positions(self):
        return (
            self.args.tokens_per_sample + 3,
            self.args.tokens_per_sample + 3,
        )


@register_task("cross_lingual_lm")
class CrossLingualLMTask(LegacyMaskedLMTask):
    """XLM MLM over multiple monolingual corpora
    (reference cross_lingual_lm.py:31-170)."""

    @staticmethod
    def add_args(parser):
        LegacyMaskedLMTask.add_args(parser)
        parser.add_argument("--monolingual-langs", default="en", type=str,
                            help="comma-separated languages")
        # reference cross_lingual_lm.py:52-54
        parser.add_argument("--shuffle", action="store_true",
                            help="shuffle each monolingual dataset while "
                                 "training")

    def __init__(self, args, dictionary):
        super().__init__(args, dictionary)
        self.langs2id = {
            lang: i
            for i, lang in enumerate(
                sorted(args.monolingual_langs.split(","))
            )
        }

    @classmethod
    def dictionary_class(cls):
        return MaskedLMDictionary

    @classmethod
    def load_dictionary(cls, filename):
        return MaskedLMDictionary.load(filename)

    @classmethod
    def setup_task(cls, args, **kwargs):
        paths = args.data.split(os.pathsep)
        dictionary = cls.load_dictionary(os.path.join(paths[0], "dict.txt"))
        logger.info("dictionary: {} types".format(len(dictionary)))
        return cls(args, dictionary)

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        lang_datasets = []
        for lang in sorted(self.langs2id):
            path = os.path.join(data_path, "{}.{}".format(split, lang))
            ds = load_indexed_dataset(
                path, self.dictionary,
                getattr(self.args, "dataset_impl", None),
            )
            if ds is None:
                raise FileNotFoundError(
                    "Dataset not found: {} ({})".format(split, path)
                )
            # XLM masks single streams (no NSP); segment = language id
            from ..data.mask_tokens import MaskedLMDataset, MaskedTokensPair

            pair = MaskedTokensPair(
                ds, self.dictionary,
                pad_idx=self.dictionary.pad(),
                mask_idx=self.dictionary.mask(),
                seed=self.seed,
            )
            lang_datasets.append(
                MaskedLMDataset(
                    pair, self.dictionary.pad(),
                    shuffle=getattr(self.args, "shuffle", False),
                )
            )
        self.datasets[split] = (
            ConcatDataset(lang_datasets)
            if len(lang_datasets) > 1 else lang_datasets[0]
        )
