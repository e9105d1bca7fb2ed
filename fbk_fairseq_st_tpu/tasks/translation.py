"""translation task — text-to-text MT (reference fairseq/tasks/translation.py).

Loads ``<split>.<src>-<tgt>.{src,tgt}`` indexed pairs (either direction's
prefix, like the reference load_langpair_dataset :35-130) with per-language
dictionaries, left-padded sources, and the standard generation path.
"""

from __future__ import annotations

import itertools
import logging
import os

from ..data.datasets import ConcatDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import dataset_exists, infer_dataset_impl, load_indexed_dataset
from ..data.language_pair_dataset import LanguagePairDataset
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


EVAL_BLEU_ORDER = 4


def load_langpair_dataset(
    data_path, split, src, src_dict, tgt, tgt_dict, combine, dataset_impl,
    upsample_primary, left_pad_source, left_pad_target,
    max_source_positions, max_target_positions, load_alignments=False,
    prepend_bos=False, append_source_id=False, truncate_source=False,
):
    def split_exists(split_k, src_l, tgt_l, lang, path):
        filename = os.path.join(path, f"{split_k}.{src_l}-{tgt_l}.{lang}")
        if dataset_impl is not None:
            return dataset_exists(filename, impl=dataset_impl)
        return infer_dataset_impl(filename) is not None

    src_datasets = []
    tgt_datasets = []
    for k in itertools.count():
        split_k = split + (str(k) if k > 0 else "")
        if split_exists(split_k, src, tgt, src, data_path):
            prefix = os.path.join(data_path, f"{split_k}.{src}-{tgt}.")
        elif split_exists(split_k, tgt, src, src, data_path):
            prefix = os.path.join(data_path, f"{split_k}.{tgt}-{src}.")
        else:
            if k > 0:
                break
            raise FileNotFoundError(
                f"Dataset not found: {split} ({data_path})"
            )
        src_dataset = load_indexed_dataset(prefix + src, src_dict, dataset_impl)
        if truncate_source:
            # strip eos -> hard-truncate -> re-append eos (reference
            # translation.py:66-74): sources longer than the model limit are
            # clipped instead of dropped by the size filter
            from ..data.wrappers import (
                AppendTokenDataset,
                StripTokenDataset,
                TruncateDataset,
            )

            src_dataset = AppendTokenDataset(
                TruncateDataset(
                    StripTokenDataset(src_dataset, src_dict.eos()),
                    max_source_positions - 1,
                ),
                src_dict.eos(),
            )
        src_datasets.append(src_dataset)
        tgt_datasets.append(
            load_indexed_dataset(prefix + tgt, tgt_dict, dataset_impl)
        )
        logger.info(
            "{} {} {}-{} {} examples".format(
                data_path, split_k, src, tgt, len(src_datasets[-1])
            )
        )
        if not combine:
            break

    assert len(src_datasets) == len(tgt_datasets)
    if len(src_datasets) == 1:
        src_dataset, tgt_dataset = src_datasets[0], tgt_datasets[0]
    else:
        src_dataset = ConcatDataset(src_datasets)
        tgt_dataset = ConcatDataset(tgt_datasets)

    def _sizes(ds):
        if hasattr(ds, "sizes") and ds.sizes is not None:
            import numpy as np

            s = ds.sizes
            # TNT datasets store 1-D sizes directly
            return s if len(s) == len(ds) else np.array(
                [ds.size(i) for i in range(len(ds))]
            )
        return [ds.size(i) for i in range(len(ds))]

    eos = None
    if prepend_bos:
        from ..data.wrappers import PrependTokenDataset

        src_dataset = PrependTokenDataset(src_dataset, src_dict.bos())
        tgt_dataset = PrependTokenDataset(tgt_dataset, tgt_dict.bos())
    if append_source_id:
        # mBART layout: '[src]' appended to sources, '[tgt]' to targets,
        # and generation terminates on '[tgt]' (reference
        # translation.py load_langpair_dataset append_source_id branch)
        from ..data.wrappers import AppendTokenDataset

        src_dataset = AppendTokenDataset(
            src_dataset, src_dict.index("[{}]".format(src))
        )
        tgt_dataset = AppendTokenDataset(
            tgt_dataset, tgt_dict.index("[{}]".format(tgt))
        )
        eos = tgt_dict.index("[{}]".format(tgt))

    align_dataset = None
    if load_alignments:
        import numpy as np

        # preferred: the binarized {split}.align.src-tgt dataset written by
        # preprocess --align-suffix (reference translation.py
        # load_langpair_dataset align path) — flat [s0,t0,s1,t1,...] rows
        from ..data import indexed_dataset

        bin_prefix = os.path.join(data_path, f"{split}.align.{src}-{tgt}")
        impl = indexed_dataset.infer_dataset_impl(bin_prefix)
        if impl is not None:
            ds = indexed_dataset.make_dataset(bin_prefix, impl)
            align_dataset = [
                np.asarray(ds[i], np.int64).reshape(-1, 2)
                for i in range(len(ds))
            ]
        else:
            # fallback: raw "srcidx-tgtidx ..." lines per sentence pair
            align_path = os.path.join(data_path, f"{split}.{src}-{tgt}.align")
            if os.path.exists(align_path):
                align_dataset = []
                with open(align_path) as f:
                    for line in f:
                        pairs = [
                            tuple(map(int, p.split("-"))) for p in line.split()
                        ]
                        align_dataset.append(
                            np.array(pairs, np.int64).reshape(-1, 2)
                        )
        if align_dataset is not None:
            assert len(align_dataset) == len(src_dataset)

    return LanguagePairDataset(
        src_dataset,
        _sizes(src_dataset),
        src_dict,
        tgt_dataset,
        _sizes(tgt_dataset),
        tgt_dict,
        left_pad_source=left_pad_source,
        left_pad_target=left_pad_target,
        max_source_positions=max_source_positions,
        max_target_positions=max_target_positions,
        align_dataset=align_dataset,
        eos=eos,
    )


@register_task("translation")
class TranslationTask(Task):
    @staticmethod
    def add_args(parser):
        # flag names/defaults are the CLI-compat surface (reference
        # translation.py:74-103 and :181-199, pinned by
        # tests/test_cli_flag_parity.py); help prose is ours
        parser.add_argument("data", help="binarized corpus director(ies), "
                                         "os.pathsep-joined for round-robin "
                                         "over epochs")
        parser.add_argument("-s", "--source-lang", default=None, metavar="SRC",
                            help="language code of the input side "
                                 "(inferred from dict.*.txt when omitted)")
        parser.add_argument("-t", "--target-lang", default=None, metavar="TARGET",
                            help="language code of the output side "
                                 "(inferred from dict.*.txt when omitted)")
        parser.add_argument("--left-pad-source", default="True", type=str, metavar="BOOL",
                            help="put source padding before the tokens "
                                 "rather than after")
        parser.add_argument("--left-pad-target", default="False", type=str, metavar="BOOL",
                            help="put target padding before the tokens "
                                 "rather than after")
        parser.add_argument("--max-source-positions", default=1024, type=int, metavar="N")
        parser.add_argument("--max-target-positions", default=1024, type=int, metavar="N")
        parser.add_argument("--upsample-primary", default=1, type=int)
        parser.add_argument("--load-alignments", action="store_true")
        parser.add_argument("--truncate-source", action="store_true", default=False,
                            help="clip over-long sources at "
                                 "max-source-positions instead of "
                                 "filtering them out")

        # validation-time BLEU reporting (reference translation.py:181-199)
        parser.add_argument("--eval-bleu", action="store_true",
                            help="score each validation pass with BLEU "
                                 "(drives --best-checkpoint-metric bleu)")
        parser.add_argument("--eval-bleu-detok", type=str, default="space",
                            help="detokenizer applied before scoring "
                                 "('moses', ...); 'space' means score the "
                                 "raw space-split tokens")
        parser.add_argument("--eval-bleu-detok-args", type=str, metavar="JSON",
                            help="JSON kwargs forwarded to the detokenizer "
                                 "constructor")
        parser.add_argument("--eval-tokenized-bleu", action="store_true", default=False,
                            help="score pre-tokenized text directly rather "
                                 "than through sacrebleu's tokenizer")
        parser.add_argument("--eval-bleu-remove-bpe", nargs="?", const="@@ ", default=None,
                            help="strip this BPE continuation marker "
                                 "before scoring")
        parser.add_argument("--eval-bleu-args", type=str, metavar="JSON",
                            help="JSON of generation settings used for the "
                                 "validation decode (beam, lenpen, ...)")
        parser.add_argument("--eval-bleu-print-samples", action="store_true",
                            help="log one hypothesis/reference pair per "
                                 "validation batch")

    def __init__(self, args, src_dict, tgt_dict):
        super().__init__(args)
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.paths = args.data.split(os.pathsep)
        self.tokenizer = None
        self._bleu_generator = None

    @classmethod
    def setup_task(cls, args, **kwargs):
        args.left_pad_source = str(args.left_pad_source).lower() == "true"
        args.left_pad_target = str(args.left_pad_target).lower() == "true"
        paths = args.data.split(os.pathsep)
        if args.source_lang is None or args.target_lang is None:
            args.source_lang, args.target_lang = infer_language_pair(paths[0])
        if args.source_lang is None or args.target_lang is None:
            raise Exception(
                "Could not infer language pair, please provide it explicitly"
            )
        src_dict = Dictionary.load(
            os.path.join(paths[0], f"dict.{args.source_lang}.txt")
        )
        tgt_dict = Dictionary.load(
            os.path.join(paths[0], f"dict.{args.target_lang}.txt")
        )
        assert src_dict.pad() == tgt_dict.pad()
        assert src_dict.eos() == tgt_dict.eos()
        assert src_dict.unk() == tgt_dict.unk()
        logger.info(f"[{args.source_lang}] dictionary: {len(src_dict)} types")
        logger.info(f"[{args.target_lang}] dictionary: {len(tgt_dict)} types")
        return cls(args, src_dict, tgt_dict)

    def load_dataset(self, split, combine=False, **kwargs):
        data_path = self.paths[0]
        self.datasets[split] = load_langpair_dataset(
            data_path,
            split,
            self.args.source_lang,
            self.src_dict,
            self.args.target_lang,
            self.tgt_dict,
            combine=combine,
            dataset_impl=getattr(self.args, "dataset_impl", None),
            upsample_primary=getattr(self.args, "upsample_primary", 1),
            left_pad_source=self.args.left_pad_source,
            left_pad_target=self.args.left_pad_target,
            max_source_positions=self.args.max_source_positions,
            max_target_positions=self.args.max_target_positions,
            load_alignments=getattr(self.args, "load_alignments", False),
            truncate_source=getattr(self.args, "truncate_source", False),
        )

    @property
    def source_dictionary(self):
        return self.src_dict

    @property
    def target_dictionary(self):
        return self.tgt_dict

    def max_positions(self):
        return (self.args.max_source_positions, self.args.max_target_positions)

    # -- validation-time BLEU (reference translation.py:264-381) ------------

    def build_model(self, args):
        model = super().build_model(args)
        if getattr(args, "eval_bleu", False):
            import json
            from argparse import Namespace

            from ..data import encoders

            detok = getattr(args, "eval_bleu_detok", None)
            assert detok is not None, (
                "--eval-bleu-detok is required if using --eval-bleu; "
                "try --eval-bleu-detok=moses (or --eval-bleu-detok=space "
                "to disable detokenization, e.g., when using sentencepiece)"
            )
            detok_args = json.loads(
                getattr(args, "eval_bleu_detok_args", "{}") or "{}"
            )
            self.tokenizer = encoders.build_tokenizer(
                Namespace(tokenizer=detok, **detok_args)
            )
            gen_args = json.loads(getattr(args, "eval_bleu_args", "{}") or "{}")
            self._bleu_generator = self.build_generator(
                [model], Namespace(**gen_args)
            )
        return model

    def valid_step_extra(self, sample, trainer):
        """Per-batch validation hook run by Trainer.valid_step on the HOST
        sample: decodes with the current params and returns sacrebleu
        sufficient statistics as logging-output entries (the reference
        computes these in TranslationTask.valid_step, translation.py:299-311;
        splitting counts into scalar entries keeps them psum-reducible)."""
        if not getattr(self.args, "eval_bleu", False):
            return {}
        bleu = self._inference_with_bleu(
            self._bleu_generator,
            sample,
            [(trainer.model, trainer.variables())],
        )
        out = {"_bleu_sys_len": bleu.sys_len, "_bleu_ref_len": bleu.ref_len}
        assert len(bleu.counts) == EVAL_BLEU_ORDER
        for i in range(EVAL_BLEU_ORDER):
            out[f"_bleu_counts_{i}"] = bleu.counts[i]
            out[f"_bleu_totals_{i}"] = bleu.totals[i]
        return out

    def reduce_metrics(self, logging_outputs, criterion, metrics):
        super().reduce_metrics(logging_outputs, criterion, metrics)
        if not getattr(self.args, "eval_bleu", False):
            return

        import numpy as np

        def sum_logs(key):
            return sum(log.get(key, 0) for log in logging_outputs)

        counts = [sum_logs(f"_bleu_counts_{i}") for i in range(EVAL_BLEU_ORDER)]
        totals = [sum_logs(f"_bleu_totals_{i}") for i in range(EVAL_BLEU_ORDER)]
        if max(totals) > 0:
            # arrays sum correctly inside AverageMeter across batches
            metrics.log_scalar("_bleu_counts", np.array(counts))
            metrics.log_scalar("_bleu_totals", np.array(totals))
            metrics.log_scalar("_bleu_sys_len", sum_logs("_bleu_sys_len"))
            metrics.log_scalar("_bleu_ref_len", sum_logs("_bleu_ref_len"))

            def compute_bleu(meters):
                from sacrebleu.metrics import BLEU

                bleu = BLEU.compute_bleu(
                    correct=[int(c) for c in np.asarray(meters["_bleu_counts"].sum)],
                    total=[int(t) for t in np.asarray(meters["_bleu_totals"].sum)],
                    sys_len=int(meters["_bleu_sys_len"].sum),
                    ref_len=int(meters["_bleu_ref_len"].sum),
                    smooth_method="exp",
                )
                return round(bleu.score, 2)

            metrics.log_derived("bleu", compute_bleu)

    def _inference_with_bleu(self, generator, sample, models):
        import numpy as np
        import sacrebleu

        def decode(toks, escape_unk=False):
            s = self.tgt_dict.string(
                np.asarray(toks),
                getattr(self.args, "eval_bleu_remove_bpe", None),
                # <unk> would be tokenized by sacrebleu as '< unk >',
                # inflating BLEU — substitute verbose sentinels that can't
                # cross-match (reference translation.py:351-361)
                unk_string=(
                    "UNKNOWNTOKENINREF" if escape_unk else "UNKNOWNTOKENINHYP"
                ),
            )
            if self.tokenizer:
                s = self.tokenizer.decode(s)
            return s

        gen_out = self.inference_step(generator, models, sample, None)
        hyps, refs = [], []
        pad = self.tgt_dict.pad()
        for i in range(len(gen_out)):
            hyps.append(decode(gen_out[i][0]["tokens"]))
            target = np.asarray(sample["target"][i])
            refs.append(decode(target[target != pad], escape_unk=True))
        if getattr(self.args, "eval_bleu_print_samples", False):
            logger.info("example hypothesis: " + hyps[0])
            logger.info("example reference: " + refs[0])
        tokenize = (
            "none"
            if getattr(self.args, "eval_tokenized_bleu", False)
            else sacrebleu.BLEU.TOKENIZER_DEFAULT
        )
        return sacrebleu.corpus_bleu(hyps, [refs], tokenize=tokenize)


def infer_language_pair(path):
    """Infer (src, tgt) from filenames like train.de-en.de.idx
    (reference data_utils.infer_language_pair)."""
    src, dst = None, None
    for filename in os.listdir(path):
        parts = filename.split(".")
        if len(parts) >= 3 and len(parts[1].split("-")) == 2:
            return parts[1].split("-")
    return src, dst
