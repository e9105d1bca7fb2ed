"""speech_translation_multitask task (reference tasks/
multitask_speech_translation.py:18-60): ST data plus a per-utterance
auxiliary classification target from ``<split>.<tgt>.<suffix>``."""

from __future__ import annotations

import logging
import os

from ..data.datasets import ConcatDataset, MultiTaskDataset
from ..data.indexed_dataset import load_indexed_dataset
from ..registry import register_task
from .speech_recognition import SpeechRecognitionTask

logger = logging.getLogger(__name__)


@register_task("speech_translation_multitask")
class SpeechTranslationMultiTask(SpeechRecognitionTask):
    @staticmethod
    def add_args(parser):
        SpeechRecognitionTask.add_args(parser)
        parser.add_argument(
            "--auxiliary-suffix", default=None, metavar="SUFFIX",
            help="Suffix to append to target dataset to get the auxiliary targets",
        )

    def load_dataset(self, split, combine=False, **kwargs):
        super().load_dataset(split, combine=combine, **kwargs)
        auxiliary_datasets = []
        for path in self.paths:
            auxiliary_ds = load_indexed_dataset(
                os.path.join(path, split)
                + "."
                + self.args.target_lang
                + "."
                + self.args.auxiliary_suffix,
                None,
                getattr(self.args, "dataset_impl", None),
            )
            if auxiliary_ds is not None:
                auxiliary_datasets.append(auxiliary_ds)
        assert len(auxiliary_datasets) > 0
        if len(auxiliary_datasets) > 1:
            auxiliary_dataset = ConcatDataset(auxiliary_datasets)
        else:
            auxiliary_dataset = auxiliary_datasets[0]
        assert len(self.datasets[split]) == len(auxiliary_dataset)
        self.datasets[split] = MultiTaskDataset(
            self.datasets[split], auxiliary_dataset
        )
