"""Multilingual ST tasks (COLING 2020).

Counterparts of examples/speech_recognition/tasks/
multilingual_speech_translation.py:25-240 (which extend the core
MultilingualTranslationTask, fairseq/tasks/multilingual_translation.py):
round-robin iteration over language pairs via RoundRobinZipDatasets;
per-language dictionaries with ``__lang__`` tokens appended when
--encoder-langtok/--decoder-langtok are set; langtok merge by 'concat' or
'sum' (LangtokFilterBanksToTextDataset). The per-pair loss sum of the
reference's sequential train loop becomes one jitted step over all pairs
(identical gradients to grad accumulation across pairs).
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax.numpy as jnp

from ..criterions.base import Criterion
from ..data.datasets import (
    ConcatDataset,
    LangtokFilterBanksToTextDataset,
    RoundRobinZipDatasets,
    TranscriptionWrapperDataset,
)
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..models.multilingual_conv_transformer import (
    _lang_token,
    _lang_token_index,
)
from ..registry import CRITERIONS, register_task
from .speech_recognition import (
    SpeechRecognitionTask,
    get_datasets_from_indexed_filterbanks,
)

logger = logging.getLogger(__name__)


class _MultilingualCriterion(Criterion):
    """Sums the inner criterion over all language pairs in the batch."""

    def __init__(self, inner: Criterion, task):
        self.inner = inner
        self.task = task
        self.padding_idx = inner.padding_idx
        self.sentence_avg = inner.sentence_avg

    def __call__(self, model, variables, batch, rng=None, training=False):
        total_loss = 0.0
        total_ss = 0.0
        logging: Dict[str, object] = {}
        new_state = variables["state"]
        for pair in self.task.lang_pairs:
            if pair not in batch or not batch[pair]:
                continue
            view = model.pair_view(pair)
            loss, ss, log, new_state = self.inner(
                view,
                {"params": variables["params"], "state": new_state},
                batch[pair],
                rng=rng,
                training=training,
            )
            total_loss = total_loss + loss
            total_ss = total_ss + ss
            for k, v in log.items():
                logging[k] = logging.get(k, 0) + v
                logging[f"{pair}:{k}"] = v
        logging["loss"] = total_loss
        logging["sample_size"] = total_ss
        return total_loss, total_ss, logging, new_state

    def reduce_metrics(self, logging_outputs, metrics):
        self.inner.reduce_metrics(logging_outputs, metrics)


@register_task("multilingual_speech_translation")
class MultilingualSpeechTranslationTask(SpeechRecognitionTask):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", help="path to data directory; pathsep-joined")
        parser.add_argument("--lang-pairs", default=None, metavar="PAIRS",
                            help="comma-separated list of language pairs: en-de,en-fr")
        parser.add_argument("-s", "--source-lang", default=None, metavar="SRC",
                            help="source language (only needed for inference)")
        parser.add_argument("-t", "--target-lang", default=None, metavar="TARGET",
                            help="target language (only needed for inference)")
        parser.add_argument("--encoder-langtok", default=None, type=str,
                            choices=["src", "tgt"],
                            help="prepend/sum an encoder language token")
        parser.add_argument("--decoder-langtok", action="store_true",
                            help="replace beginning-of-sentence in target sentence "
                            "with target language token")
        parser.add_argument("--langtok-merge-strategy", default="concat", type=str,
                            choices=["concat", "sum"], metavar="MRG",
                            help="strategy to merge the language token with the input")
        parser.add_argument("--max-source-positions", default=1024, type=int, metavar="N")
        parser.add_argument("--max-target-positions", default=1024, type=int, metavar="N")
        parser.add_argument("--skip-normalization", action="store_true", default=False)
        parser.add_argument("--legacy-audio-fix-lua-indexing", action="store_true",
                            default=False)
        parser.add_argument("--dataset-from-json", default=False)
        # SpecAugment / TimeStretch flags (reference duplicates them :65-82)
        parser.add_argument("--specaugment", action="store_true", default=False)
        parser.add_argument("--frequency-masking-pars", type=int, default=13)
        parser.add_argument("--time-masking-pars", type=int, default=13)
        parser.add_argument("--frequency-masking-num", type=int, default=2)
        parser.add_argument("--time-masking-num", type=int, default=2)
        parser.add_argument("--specaugment-rate", type=float, default=1.0)
        parser.add_argument("--time-stretch", action="store_true")
        parser.add_argument("--time-stretch-rate", type=float, default=1.0)
        parser.add_argument("--time-stretch-w", type=int, default=1)
        parser.add_argument("--time-stretch-low", type=float, default=0.8)
        parser.add_argument("--time-stretch-high", type=float, default=1.25)

    def __init__(self, args, dicts: Dict[str, Dictionary], training: bool):
        # bypass SpeechRecognitionTask.__init__'s single-dict assumption but
        # reuse its SpecAugment/TimeStretch plumbing
        tgt0 = args.lang_pairs[0].split("-")[1]
        super().__init__(args, dicts[tgt0])
        self.dicts = dicts
        self.training_mode = training
        self.lang_pairs = args.lang_pairs
        if not training:
            self.lang_pairs = [f"{args.source_lang}-{args.target_lang}"]
        self.eval_lang_pairs = self.lang_pairs
        self.langs = sorted({x for p in args.lang_pairs for x in p.split("-")})

    @classmethod
    def setup_task(cls, args, **kwargs):
        dicts, training = cls.prepare(args, **kwargs)
        return cls(args, dicts, training)

    @classmethod
    def prepare(cls, args, **kwargs):
        """Reference multilingual_translation.py:121-155."""
        if args.lang_pairs is None:
            raise ValueError(
                "--lang-pairs is required. List all the language pairs in the "
                "training data."
            )
        if isinstance(args.lang_pairs, str):
            args.lang_pairs = args.lang_pairs.split(",")
        sorted_langs = sorted(
            {x for lang_pair in args.lang_pairs for x in lang_pair.split("-")}
        )
        if args.source_lang is not None or args.target_lang is not None:
            training = False
        else:
            training = True
        paths = args.data.split(os.pathsep)
        dicts = {}
        # source side is audio: only target-language dicts exist on disk
        tgt_langs = sorted({p.split("-")[1] for p in args.lang_pairs})
        for lang in sorted_langs:
            dict_path = os.path.join(paths[0], "dict.{}.txt".format(lang))
            if not os.path.isfile(dict_path):
                if lang in tgt_langs:
                    raise FileNotFoundError(f"Dict not found: {dict_path}")
                continue
            dicts[lang] = Dictionary.load(dict_path)
            if len(dicts) > 1:
                first = dicts[next(iter(dicts))]
                assert dicts[lang].pad() == first.pad()
                assert dicts[lang].eos() == first.eos()
                assert dicts[lang].unk() == first.unk()
            if args.encoder_langtok is not None or args.decoder_langtok:
                for lang_to_add in sorted_langs:
                    dicts[lang].add_symbol(_lang_token(lang_to_add))
            logger.info("[{}] dictionary: {} types".format(lang, len(dicts[lang])))
        return dicts, training

    def _load_pair_dataset(self, split, lang_pair):
        src, tgt = lang_pair.split("-")
        datasets = []
        for path in self.paths:
            try:
                ds = get_datasets_from_indexed_filterbanks(
                    path,
                    tgt,
                    self.dicts[tgt],
                    split,
                    getattr(self.args, "dataset_impl", None),
                    self.args.skip_normalization,
                    self.args.legacy_audio_fix_lua_indexing,
                )
                datasets.append(ds)
            except (FileNotFoundError, AssertionError):
                logger.warning(f"Split {split} not found in {path} for {lang_pair}")
        assert len(datasets) > 0, f"no data for {lang_pair} {split}"
        ds = ConcatDataset(datasets) if len(datasets) > 1 else datasets[0]
        return self.alter_dataset_langtok(
            ds,
            src_eos=None,
            src_lang=src,
            tgt_eos=self.dicts[tgt].eos(),
            tgt_lang=tgt,
        )

    def alter_dataset_langtok(self, ds, src_eos=None, src_lang=None,
                              tgt_eos=None, tgt_lang=None):
        """Reference multilingual_speech_translation.py:112-130."""
        if self.args.encoder_langtok is None and not self.args.decoder_langtok:
            return ds
        encoder_lang_for_token = None
        if self.args.encoder_langtok is not None:
            encoder_lang_for_token = (
                src_lang if self.args.encoder_langtok == "src" else tgt_lang
            )
        tgt_langtok = None
        if self.args.decoder_langtok and tgt_eos is not None and tgt_lang is not None:
            tgt_langtok = _lang_token_index(self.dicts[tgt_lang], tgt_lang)
        else:
            tgt_eos = None
        return LangtokFilterBanksToTextDataset(
            ds,
            lang_for_token=encoder_lang_for_token,
            tgt_bos=tgt_eos,
            tgt_langtok=tgt_langtok,
        )

    def load_dataset(self, split, combine=False, **kwargs):
        if self.training_mode:
            self.datasets[split] = RoundRobinZipDatasets(
                {
                    pair: self._load_pair_dataset(split, pair)
                    for pair in self.lang_pairs
                }
            )
        else:
            pair = self.lang_pairs[0]
            self.datasets[split] = self._load_pair_dataset(split, pair)

    def build_criterion(self, args):
        inner = CRITERIONS[args.criterion].build_criterion(args, self)
        if self.training_mode:
            return _MultilingualCriterion(inner, self)
        return inner

    def build_model(self, args):
        from ..registry import build_model

        model = build_model(args, self)
        if not self.training_mode and hasattr(model, "pair_view"):
            return model  # generators use pair_view via inference hooks
        return model

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
            pair_models, sample, prefix_tokens=prefix_tokens, bos_token=bos_token
        )

    def augment_batch(self, batch, rng):
        if isinstance(batch, dict) and batch and all(
            isinstance(v, dict) for v in batch.values()
        ) and "src_tokens" not in batch:
            return {
                pair: super(MultilingualSpeechTranslationTask, self).augment_batch(
                    sub, rng
                )
                for pair, sub in batch.items()
            }
        return super().augment_batch(batch, rng)

    @property
    def source_dictionary(self):
        return None

    @property
    def target_dictionary(self):
        if self.training_mode:
            return self.dicts[self.lang_pairs[0].split("-")[1]]
        return self.dicts[self.args.target_lang]


@register_task("multilingual_speech_translation_with_transcr")
class MultilingualSpeechTranslationWithTranscriptionTask(
    MultilingualSpeechTranslationTask
):
    """Adds source-language transcripts per pair (reference second task in
    multilingual_speech_translation.py:211)."""

    def _load_pair_dataset(self, split, lang_pair):
        src, tgt = lang_pair.split("-")
        ds = super()._load_pair_dataset(split, lang_pair)
        transcr_datasets = []
        for path in self.paths:
            t = load_indexed_dataset(
                os.path.join(path, split) + "." + src,
                self.dicts.get(src),
                getattr(self.args, "dataset_impl", None),
            )
            if t is not None:
                transcr_datasets.append(t)
        if not transcr_datasets:
            return ds
        transcr = (
            ConcatDataset(transcr_datasets)
            if len(transcr_datasets) > 1
            else transcr_datasets[0]
        )
        return TranscriptionWrapperDataset(ds, transcr, self.dicts[src])
