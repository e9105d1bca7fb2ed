"""language_modeling task (reference fairseq/tasks/language_modeling.py:
35-272): token-block chunked monolingual data for decoder-only LMs, with
multi-target (self/future/past) training, truncated output vocabulary
(--output-dictionary-size), bos prepending and document-aware block modes.
"""

from __future__ import annotations

import logging
import os

from ..data.dictionary import Dictionary, TruncatedDictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..data.monolingual import MonolingualDataset, TokenBlockDataset
from ..data.wrappers import TruncateDataset
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


@register_task("language_modeling")
class LanguageModelingTask(Task):
    """Train a language model. ``dictionary`` is the input vocabulary;
    ``output_dictionary`` is the same object unless
    --output-dictionary-size truncates it; ``targets`` lists what the
    model must predict ('future' by default — each model declares its
    capabilities via ``Model.supported_targets``)."""

    @staticmethod
    def add_args(parser):
        # reference language_modeling.py:65-93
        parser.add_argument("data", help="path to data directory")
        parser.add_argument(
            "--sample-break-mode", default="none",
            choices=["none", "complete", "complete_doc", "eos"],
            help='If omitted or "none", fills each sample with '
                 "tokens-per-sample tokens. If set to \"complete\", splits "
                 "samples only at the end of sentence, but may include "
                 'multiple sentences per sample. "complete_doc" is similar '
                 'but respects doc boundaries. If set to "eos", includes '
                 "only one sentence per sample.")
        parser.add_argument("--tokens-per-sample", default=1024, type=int,
                            help="max number of tokens per sample for LM "
                                 "dataset")
        parser.add_argument("--output-dictionary-size", default=-1,
                            type=int,
                            help="limit the size of output dictionary")
        parser.add_argument("--self-target", action="store_true",
                            help="include self target")
        parser.add_argument("--future-target", action="store_true",
                            help="include future target")
        parser.add_argument("--past-target", action="store_true",
                            help="include past target")
        parser.add_argument("--add-bos-token", action="store_true",
                            help="prepend beginning of sentence token (<s>)")
        parser.add_argument("--max-target-positions", type=int, metavar="N",
                            default=None,
                            help="max number of tokens in the target "
                                 "sequence")
        parser.add_argument("--truncate-sequence", action="store_true",
                            default=False,
                            help="truncate sequences to --tokens-per-sample")

    def __init__(self, args, dictionary, output_dictionary=None,
                 targets=None):
        super().__init__(args)
        self.dictionary = dictionary
        self.output_dictionary = output_dictionary or dictionary
        if targets is None:
            targets = ["future"]
        self.targets = targets
        if getattr(args, "max_target_positions", None) is None:
            args.max_target_positions = args.tokens_per_sample

    @classmethod
    def setup_task(cls, args, **kwargs):
        paths = args.data.split(os.pathsep)
        dictionary = Dictionary.load(os.path.join(paths[0], "dict.txt"))
        logger.info("dictionary: {} types".format(len(dictionary)))
        output_dictionary = dictionary
        if getattr(args, "output_dictionary_size", -1) >= 0:
            output_dictionary = TruncatedDictionary(
                dictionary, args.output_dictionary_size
            )

        targets = []
        if getattr(args, "self_target", False):
            targets.append("self")
        if getattr(args, "future_target", False):
            targets.append("future")
        if getattr(args, "past_target", False):
            targets.append("past")
        if len(targets) == 0:
            targets = ["future"]  # standard language modeling
        return cls(args, dictionary, output_dictionary, targets=targets)

    def build_model(self, args):
        model = super().build_model(args)
        for target in self.targets:
            if target not in model.supported_targets:
                raise ValueError(
                    "Unsupported language modeling target: {}".format(target)
                )
        return model

    def load_dataset(self, split, combine=False, epoch=1, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        ds = load_indexed_dataset(
            os.path.join(data_path, split),
            self.dictionary,
            getattr(self.args, "dataset_impl", None),
        )
        if ds is None:
            raise FileNotFoundError(
                f"Dataset not found: {split} ({data_path})"
            )
        if getattr(self.args, "truncate_sequence", False):
            ds = TruncateDataset(ds, self.args.tokens_per_sample)
        block = TokenBlockDataset(
            ds,
            ds.sizes,
            self.args.tokens_per_sample,
            pad=self.dictionary.pad(),
            eos=self.dictionary.eos(),
            break_mode=self.args.sample_break_mode,
            include_targets=True,
        )
        add_eos_for_other_targets = (
            self.args.sample_break_mode is not None
            and self.args.sample_break_mode != "none"
        )
        self.datasets[split] = MonolingualDataset(
            block, block.sizes, self.dictionary, self.output_dictionary,
            add_eos_for_other_targets=add_eos_for_other_targets,
            shuffle=(split == "train"),
            targets=self.targets,
            add_bos_token=getattr(self.args, "add_bos_token", False),
        )

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.output_dictionary

    def max_positions(self):
        return (
            self.args.max_target_positions,
            self.args.max_target_positions,
        )
