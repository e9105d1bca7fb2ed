"""multilingual_translation task: text translation over many language pairs.

Counterpart of fairseq/tasks/multilingual_translation.py:40-334: round-robin
batches over --lang-pairs, per-language dictionaries (langtok symbols added
when --encoder-langtok/--decoder-langtok), EOS/BOS replaced with language
tokens via TransformEosLangPairDataset, per-pair model views at train time,
single-pair inference with --source-lang/--target-lang."""

from __future__ import annotations

import logging
import os

from ..data.datasets import RoundRobinZipDatasets
from ..data.dictionary import Dictionary
from ..data.wrappers import TransformEosLangPairDataset
from ..registry import CRITERIONS, register_task
from .base import Task
from .multilingual_speech_translation import _MultilingualCriterion
from .translation import load_langpair_dataset

logger = logging.getLogger(__name__)


def _lang_token(lang: str) -> str:
    return "__{}__".format(lang)


def _lang_token_index(dic, lang: str) -> int:
    idx = dic.index(_lang_token(lang))
    assert idx != dic.unk_index, "cannot find language token for lang {}".format(lang)
    return idx


@register_task("multilingual_translation")
class MultilingualTranslationTask(Task):
    @staticmethod
    def add_args(parser):
        # reference multilingual_translation.py:67-93
        parser.add_argument("data", metavar="DIR")
        parser.add_argument("--lang-pairs", default=None, metavar="PAIRS",
                            help="comma-separated list of language pairs: "
                                 "en-de,en-fr,de-fr")
        parser.add_argument("-s", "--source-lang", default=None, metavar="SRC",
                            help="source language (inference only)")
        parser.add_argument("-t", "--target-lang", default=None,
                            metavar="TARGET",
                            help="target language (inference only)")
        parser.add_argument("--left-pad-source", default="True", type=str,
                            metavar="BOOL")
        parser.add_argument("--left-pad-target", default="False", type=str,
                            metavar="BOOL")
        parser.add_argument("--max-source-positions", default=1024, type=int,
                            metavar="N")
        parser.add_argument("--max-target-positions", default=1024, type=int,
                            metavar="N")
        parser.add_argument("--upsample-primary", default=1, type=int)
        parser.add_argument("--encoder-langtok", default=None, type=str,
                            choices=["src", "tgt"], metavar="SRCTGT")
        parser.add_argument("--decoder-langtok", action="store_true")

    def __init__(self, args, dicts, training):
        super().__init__(args)
        self.dicts = dicts
        self.training_mode = training
        if training:
            self.lang_pairs = args.lang_pairs
        else:
            self.lang_pairs = [
                "{}-{}".format(args.source_lang, args.target_lang)
            ]
        self.model_lang_pairs = self.lang_pairs
        self.langs = list(dicts.keys())

    @classmethod
    def setup_task(cls, args, **kwargs):
        dicts, training = cls.prepare(args, **kwargs)
        return cls(args, dicts, training)

    @classmethod
    def prepare(cls, args, **kwargs):
        """Reference multilingual_translation.py:121-149."""
        args.left_pad_source = str(args.left_pad_source).lower() == "true"
        args.left_pad_target = str(args.left_pad_target).lower() == "true"
        if args.lang_pairs is None:
            raise ValueError(
                "--lang-pairs is required. List all the language pairs in "
                "the training objective."
            )
        if isinstance(args.lang_pairs, str):
            args.lang_pairs = args.lang_pairs.split(",")
        sorted_langs = sorted(
            {x for pair in args.lang_pairs for x in pair.split("-")}
        )
        training = args.source_lang is None and args.target_lang is None
        dicts = {}
        for lang in sorted_langs:
            paths = args.data.split(os.pathsep)
            dicts[lang] = Dictionary.load(
                os.path.join(paths[0], "dict.{}.txt".format(lang))
            )
            assert dicts[lang].pad() == dicts[sorted_langs[0]].pad()
            assert dicts[lang].eos() == dicts[sorted_langs[0]].eos()
            assert dicts[lang].unk() == dicts[sorted_langs[0]].unk()
            if args.encoder_langtok is not None or args.decoder_langtok:
                for lang_to_add in sorted_langs:
                    dicts[lang].add_symbol(_lang_token(lang_to_add))
            logger.info(
                "[{}] dictionary: {} types".format(lang, len(dicts[lang]))
            )
        return dicts, training

    def get_encoder_langtok(self, src_lang, tgt_lang):
        if self.args.encoder_langtok is None:
            return self.dicts[src_lang].eos()
        if self.args.encoder_langtok == "src":
            return _lang_token_index(self.dicts[src_lang], src_lang)
        return _lang_token_index(self.dicts[src_lang], tgt_lang)

    def get_decoder_langtok(self, tgt_lang):
        if not self.args.decoder_langtok:
            return self.dicts[tgt_lang].eos()
        return _lang_token_index(self.dicts[tgt_lang], tgt_lang)

    def alter_dataset_langtok(self, lang_pair_dataset, src_eos=None,
                              src_lang=None, tgt_eos=None, tgt_lang=None):
        if self.args.encoder_langtok is None and not self.args.decoder_langtok:
            return lang_pair_dataset
        new_src_eos = None
        if (
            self.args.encoder_langtok is not None
            and src_eos is not None
            and src_lang is not None
            and tgt_lang is not None
        ):
            new_src_eos = self.get_encoder_langtok(src_lang, tgt_lang)
        else:
            src_eos = None
        new_tgt_bos = None
        if self.args.decoder_langtok and tgt_eos is not None and tgt_lang:
            new_tgt_bos = self.get_decoder_langtok(tgt_lang)
        else:
            tgt_eos = None
        return TransformEosLangPairDataset(
            lang_pair_dataset,
            src_eos=src_eos,
            new_src_eos=new_src_eos,
            tgt_bos=tgt_eos,
            new_tgt_bos=new_tgt_bos,
        )

    def _pair_dataset(self, split, lang_pair):
        src, tgt = lang_pair.split("-")
        paths = self.args.data.split(os.pathsep)
        ds = load_langpair_dataset(
            paths[0], split, src, self.dicts[src], tgt, self.dicts[tgt],
            combine=True,
            dataset_impl=getattr(self.args, "dataset_impl", None),
            upsample_primary=self.args.upsample_primary,
            left_pad_source=self.args.left_pad_source,
            left_pad_target=self.args.left_pad_target,
            max_source_positions=self.args.max_source_positions,
            max_target_positions=self.args.max_target_positions,
        )
        return self.alter_dataset_langtok(
            ds,
            src_eos=self.dicts[src].eos(), src_lang=src,
            tgt_eos=self.dicts[tgt].eos(), tgt_lang=tgt,
        )

    def load_dataset(self, split, combine=False, **kwargs):
        if self.training_mode:
            self.datasets[split] = RoundRobinZipDatasets(
                {
                    pair: self._pair_dataset(split, pair)
                    for pair in self.lang_pairs
                }
            )
        else:
            self.datasets[split] = self._pair_dataset(
                split, self.lang_pairs[0]
            )

    def build_criterion(self, args):
        inner = CRITERIONS[args.criterion].build_criterion(args, self)
        if self.training_mode:
            return _MultilingualCriterion(inner, self)
        return inner

    def inference_step(self, generator, models, sample, prefix_tokens=None):
        pair = self.lang_pairs[0]
        pair_models = [
            (m.pair_view(pair), v) if hasattr(m, "pair_view") else (m, v)
            for m, v in models
        ]
        bos_token = None
        if self.args.decoder_langtok:
            tgt = pair.split("-")[1]
            bos_token = _lang_token_index(self.dicts[tgt], tgt)
        return generator.generate(
            pair_models, sample, prefix_tokens=prefix_tokens,
            bos_token=bos_token,
        )

    @property
    def source_dictionary(self):
        if self.training_mode:
            return next(iter(self.dicts.values()))
        return self.dicts[self.args.source_lang]

    @property
    def target_dictionary(self):
        if self.training_mode:
            return next(iter(self.dicts.values()))
        return self.dicts[self.args.target_lang]

    def max_positions(self):
        return (self.args.max_source_positions, self.args.max_target_positions)
