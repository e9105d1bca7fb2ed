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

# The three optional prediction streams a decoder-only LM can be trained
# on (reference's self/future/past targets): flag suffix -> stream name.
# "future" (the ordinary next-token objective) is the fallback when no
# flag is given.
_TARGET_FLAGS = (("self", "self"), ("future", "future"), ("past", "past"))


@register_task("language_modeling")
class LanguageModelingTask(Task):
    """Train a language model. ``dictionary`` is the input vocabulary;
    ``output_dictionary`` is the same object unless
    --output-dictionary-size truncates it; ``targets`` lists what the
    model must predict ('future' by default — each model declares its
    capabilities via ``Model.supported_targets``)."""

    @staticmethod
    def add_args(parser):
        # flag names/choices/defaults are the CLI-compat surface
        # (reference language_modeling.py:65-93, enforced by
        # tests/test_cli_flag_parity.py); the prose is ours
        parser.add_argument("data", help="path to data directory")
        parser.add_argument(
            "--sample-break-mode", default="none",
            choices=["none", "complete", "complete_doc", "eos"],
            help="how the token stream is chunked into training samples: "
                 "'none' packs exactly tokens-per-sample tokens per chunk "
                 "regardless of sentence boundaries; 'complete' never cuts "
                 "a sentence in half (a chunk holds as many whole "
                 "sentences as fit); 'complete_doc' additionally refuses "
                 "to mix documents within a chunk; 'eos' makes every "
                 "sentence its own sample")
        parser.add_argument("--tokens-per-sample", default=1024, type=int,
                            help="chunk length the monolingual stream is "
                                 "cut into (upper bound per sample)")
        parser.add_argument("--output-dictionary-size", default=-1,
                            type=int,
                            help="predict only the first N vocabulary "
                                 "entries (softmax truncation; -1 keeps "
                                 "the full vocabulary)")
        parser.add_argument("--self-target", action="store_true",
                            help="also train on the 'self' prediction "
                                 "stream")
        parser.add_argument("--future-target", action="store_true",
                            help="also train on the 'future' (next-token) "
                                 "prediction stream")
        parser.add_argument("--past-target", action="store_true",
                            help="also train on the 'past' prediction "
                                 "stream")
        parser.add_argument("--add-bos-token", action="store_true",
                            help="start every sample with the <s> symbol")
        parser.add_argument("--max-target-positions", type=int, metavar="N",
                            default=None,
                            help="model-side cap on sample length "
                                 "(defaults to --tokens-per-sample)")
        parser.add_argument("--truncate-sequence", action="store_true",
                            default=False,
                            help="clip over-long source sentences to "
                                 "--tokens-per-sample instead of "
                                 "erroring/filtering them")

    def __init__(self, args, dictionary, output_dictionary=None,
                 targets=None):
        super().__init__(args)
        self.dictionary = dictionary
        self.output_dictionary = output_dictionary or dictionary
        self.targets = targets if targets is not None else ["future"]
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
        targets = [
            stream
            for suffix, stream in _TARGET_FLAGS
            if getattr(args, f"{suffix}_target", False)
        ] or ["future"]  # plain next-token LM when no stream flag given
        return cls(args, dictionary, output_dictionary, targets=targets)

    def build_model(self, args):
        model = super().build_model(args)
        unsupported = [
            t for t in self.targets if t not in model.supported_targets
        ]
        if unsupported:
            raise ValueError(
                f"Unsupported language modeling target: {unsupported[0]}"
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
        # boundary-respecting modes carry an eos the extra target streams
        # must account for
        break_mode = self.args.sample_break_mode
        self.datasets[split] = MonolingualDataset(
            block, block.sizes, self.dictionary, self.output_dictionary,
            add_eos_for_other_targets=bool(break_mode) and break_mode != "none",
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
