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


def load_langpair_dataset(
    data_path, split, src, src_dict, tgt, tgt_dict, combine, dataset_impl,
    upsample_primary, left_pad_source, left_pad_target,
    max_source_positions, max_target_positions, load_alignments=False,
    prepend_bos=False, append_source_id=False,
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
        src_datasets.append(
            load_indexed_dataset(prefix + src, src_dict, dataset_impl)
        )
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
        parser.add_argument("data", help="colon separated path(s) to data directorie(s)")
        parser.add_argument("-s", "--source-lang", default=None, metavar="SRC",
                            help="source language")
        parser.add_argument("-t", "--target-lang", default=None, metavar="TARGET",
                            help="target language")
        parser.add_argument("--left-pad-source", default="True", type=str, metavar="BOOL",
                            help="pad the source on the left")
        parser.add_argument("--left-pad-target", default="False", type=str, metavar="BOOL",
                            help="pad the target on the left")
        parser.add_argument("--max-source-positions", default=1024, type=int, metavar="N")
        parser.add_argument("--max-target-positions", default=1024, type=int, metavar="N")
        parser.add_argument("--upsample-primary", default=1, type=int)
        parser.add_argument("--load-alignments", action="store_true")

    def __init__(self, args, src_dict, tgt_dict):
        super().__init__(args)
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.paths = args.data.split(os.pathsep)

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
        )

    @property
    def source_dictionary(self):
        return self.src_dict

    @property
    def target_dictionary(self):
        return self.tgt_dict

    def max_positions(self):
        return (self.args.max_source_positions, self.args.max_target_positions)


def infer_language_pair(path):
    """Infer (src, tgt) from filenames like train.de-en.de.idx
    (reference data_utils.infer_language_pair)."""
    src, dst = None, None
    for filename in os.listdir(path):
        parts = filename.split(".")
        if len(parts) >= 3 and len(parts[1].split("-")) == 2:
            return parts[1].split("-")
    return src, dst
