"""Text preprocessing: dictionary build + binarization.

Counterpart of fairseq_cli/preprocess.py for the ST data pipeline: builds
``dict.<lang>.txt`` (thresholds, nwords, padding_factor=8 — reference
Dictionary.finalize) and binarizes ``<pref>.<lang>`` text into
``<split>.<lang>.{bin,idx}`` indexed datasets — the exact inputs
the speech tasks load (tasks/speech_recognition.py:73-84).
"""

from __future__ import annotations

import logging
import os
import sys

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import make_builder
from .. import options

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.preprocess")


def _dictionary_hooks(args):
    """Tasks may use a custom dictionary class (BertDictionary,
    MaskedLMDictionary, ...) — the fairseq-preprocess --task mechanism:
    the task's dictionary_class/load_dictionary drive binarization."""
    from ..registry import TASKS

    task_name = getattr(args, "task", None)
    if task_name and task_name in TASKS:
        task_cls = TASKS[task_name]
        dict_cls = getattr(task_cls, "dictionary_class", None)
        dict_cls = dict_cls() if callable(dict_cls) else Dictionary
        loader = getattr(task_cls, "load_dictionary", Dictionary.load)
        return dict_cls, loader
    return Dictionary, Dictionary.load


def build_dictionary(filenames, threshold=-1, nwords=-1, padding_factor=8,
                     dict_cls=Dictionary):
    d = dict_cls()
    for filename in filenames:
        with open(filename, "r", encoding="utf-8") as f:
            for line in f:
                for word in line.split():
                    d.add_symbol(word)
                d.add_symbol(d.eos_word)
    d.finalize(threshold=threshold, nwords=nwords, padding_factor=padding_factor)
    return d


def binarize(input_file, dictionary, output_prefix, impl="mmap", append_eos=True):
    builder = make_builder(
        output_prefix + ".bin", impl=impl, vocab_size=len(dictionary)
    )
    nseq, ntok, nunk = 0, 0, 0
    with open(input_file, "r", encoding="utf-8") as f:
        for line in f:
            ids = dictionary.encode_line(
                line, add_if_not_exist=False, append_eos=append_eos
            )
            nseq += 1
            ntok += len(ids)
            nunk += int((ids == dictionary.unk()).sum())
            builder.add_item(ids)
    builder.finalize(output_prefix + ".idx")
    return nseq, ntok, nunk


def main(args):
    os.makedirs(args.destdir, exist_ok=True)
    if getattr(args, "only_source", False):
        # monolingual/LM layout: {split}.{bin,idx} + dict.txt (the
        # fairseq-preprocess --only-source convention)
        langs = [args.source_lang]  # may be None -> unnamed
    else:
        langs = [
            l for l in [args.source_lang, args.target_lang] if l is not None
        ]
        assert langs, "specify --source-lang and/or --target-lang"

    dict_cls, dict_loader = _dictionary_hooks(args)
    joined_dict = None
    if getattr(args, "joined_dictionary", False) and len(langs) > 1:
        # one dictionary over both sides (fairseq --joined-dictionary)
        assert args.trainpref, "--trainpref required to build a dictionary"
        joined_dict = build_dictionary(
            [f"{args.trainpref}.{lang}" for lang in langs],
            threshold=args.thresholdsrc,
            nwords=args.nwordssrc,
            padding_factor=args.padding_factor,
            dict_cls=dict_cls,
        )

    for lang in langs:
        dict_path = os.path.join(
            args.destdir, f"dict.{lang}.txt" if lang else "dict.txt"
        )
        existing = args.srcdict if lang == args.source_lang else args.tgtdict
        if joined_dict is not None:
            d = joined_dict
        elif existing:
            d = dict_loader(existing)
        else:
            assert args.trainpref, "--trainpref required to build a dictionary"
            threshold = (
                args.thresholdsrc if lang == args.source_lang else args.thresholdtgt
            )
            nwords = args.nwordssrc if lang == args.source_lang else args.nwordstgt
            d = build_dictionary(
                [f"{args.trainpref}.{lang}" if lang else args.trainpref],
                threshold=threshold,
                nwords=nwords,
                padding_factor=args.padding_factor,
                dict_cls=dict_cls,
            )
        d.save(dict_path)
        logger.info(f"[{lang}] dictionary: {len(d)} types")

        both = args.source_lang is not None and args.target_lang is not None
        for pref, split in [
            (args.trainpref, "train"),
            (args.validpref, "valid"),
            (args.testpref, "test"),
        ]:
            if pref is None:
                continue
            if both:
                # fairseq-style paired naming for the translation task
                out_prefix = os.path.join(
                    args.destdir,
                    f"{split}.{args.source_lang}-{args.target_lang}.{lang}",
                )
            elif lang:
                out_prefix = os.path.join(args.destdir, f"{split}.{lang}")
            else:
                out_prefix = os.path.join(args.destdir, split)
            nseq, ntok, nunk = binarize(
                f"{pref}.{lang}" if lang else pref, d, out_prefix,
                impl=args.dataset_impl,
            )
            logger.info(
                "[{}] {}: {} sents, {} tokens, {:.3}% replaced by {}".format(
                    lang, f"{pref}.{lang}", nseq, ntok,
                    100.0 * nunk / max(ntok, 1), d.unk_word,
                )
            )
    logger.info(f"Wrote preprocessed data to {args.destdir}")


def cli_main(input_args=None):
    parser = options.get_preprocessing_parser()
    args = parser.parse_args(input_args)
    main(args)


if __name__ == "__main__":
    cli_main()
