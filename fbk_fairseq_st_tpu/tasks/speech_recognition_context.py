"""speech_recognition_context task: context-aware ST of auto-segmented
speech (INTERSPEECH 2020).

Counterpart of examples/speech_recognition/tasks/
speech_recognition_context.py:19-230: training reads ``<split>.context.npz``
(previous audio) or ``<split>.context.<tgt>`` (previous target text) into a
ContextAwareDataset; at inference the dataset is NOT wrapped and batches are
kept in corpus order (indices = arange, no shuffle) so the stateful
generator can chain each utterance's output into the next one's context.
Training/inference mode is inferred from the presence of --beam
(reference :100-104).
"""

from __future__ import annotations

import logging
import os

from ..data.datasets import ConcatDataset, ContextAwareDataset
from ..data.indexed_dataset import FilterBanksDataset, load_indexed_dataset
from ..registry import register_task
from .speech_recognition import (
    SpeechRecognitionTask,
    get_datasets_from_indexed_filterbanks,
)

logger = logging.getLogger(__name__)


@register_task("speech_recognition_context")
class ContextAwareSpeechRecognitionTask(SpeechRecognitionTask):
    @staticmethod
    def add_args(parser):
        SpeechRecognitionTask.add_args(parser)
        parser.add_argument(
            "--context-type", default="tgt", choices=["tgt", "src"],
            help="if src, the context is considered to be the previous audio, "
            "otherwise it is assumed to be the previous text",
        )

    def __init__(self, args, tgt_dict):
        super().__init__(args, tgt_dict)
        self.training = True  # may be flipped in setup_task

    @classmethod
    def setup_task(cls, args, **kwargs):
        task = super(ContextAwareSpeechRecognitionTask, cls).setup_task(args)
        if hasattr(args, "beam"):
            task.training = False
        return task

    def load_dataset(self, split, combine=False, **kwargs):
        datasets = []
        for path in self.paths:
            try:
                ds = get_datasets_from_indexed_filterbanks(
                    path,
                    self.args.target_lang,
                    self.tgt_dict,
                    split,
                    getattr(self.args, "dataset_impl", None),
                    self.args.skip_normalization,
                    self.args.legacy_audio_fix_lua_indexing,
                )
                if self.training:
                    if self.args.context_type == "src":
                        context_ds = FilterBanksDataset(
                            os.path.join(path, split) + ".context.npz",
                            legacy_audio_fix_lua_indexing=(
                                self.args.legacy_audio_fix_lua_indexing
                            ),
                        )
                    else:
                        context_ds = load_indexed_dataset(
                            os.path.join(path, split)
                            + ".context."
                            + self.args.target_lang,
                            self.tgt_dict,
                            getattr(self.args, "dataset_impl", None),
                        )
                    ds = ContextAwareDataset(
                        ds, context_ds, self.tgt_dict,
                        self.args.context_type == "src",
                    )
                datasets.append(ds)
            except (FileNotFoundError, AssertionError):
                logger.warning(
                    "Split {} not found in {}. Skipping...".format(split, path)
                )
        assert len(datasets) > 0
        if len(datasets) > 1:
            self.datasets[split] = ConcatDataset(datasets)
        else:
            self.datasets[split] = datasets[0]

    def build_generator(self, models, args):
        from ..generation.sequence_generator_with_context import (
            AudioContextAwareSequenceGenerator,
            TargetContextAwareSequenceGenerator,
        )

        cls = (
            AudioContextAwareSequenceGenerator
            if self.args.context_type == "src"
            else TargetContextAwareSequenceGenerator
        )
        return cls(
            self.target_dictionary,
            beam_size=getattr(args, "beam", 5),
            max_len_a=getattr(args, "max_len_a", 0),
            max_len_b=getattr(args, "max_len_b", 200),
            min_len=getattr(args, "min_len", 1),
            normalize_scores=(not getattr(args, "unnormalized", False)),
            len_penalty=getattr(args, "lenpen", 1),
            unk_penalty=getattr(args, "unkpen", 0),
            temperature=getattr(args, "temperature", 1.0),
            no_repeat_ngram_size=getattr(args, "no_repeat_ngram_size", 0),
        )
