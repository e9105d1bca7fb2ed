"""multilingual_speech_translation_with_transcr_kd task.

Counterpart of examples/speech_recognition/tasks/
multilingual_speech_translation_kd.py:25-131: the multilingual
ST-with-transcription data of each language pair is further wrapped with the
teacher's top-k outputs (``<split>.<tgt>.top{K}_{idx,out}`` indexed datasets
written by cli/generate_topk), then iterated round-robin across pairs."""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.datasets import ConcatDataset
from ..data.indexed_dataset import IndexedDataset
from ..data.knowledge_distillation import (
    DatasetWithTeacherOutput,
    TeacherOutputDataset,
)
from ..registry import register_task
from .multilingual_speech_translation import (
    MultilingualSpeechTranslationWithTranscriptionTask,
)

logger = logging.getLogger(__name__)


@register_task("multilingual_speech_translation_with_transcr_kd")
class MultilingualSpeechTranslationWithTranscriptionKDTask(
    MultilingualSpeechTranslationWithTranscriptionTask
):
    @staticmethod
    def add_args(parser):
        MultilingualSpeechTranslationWithTranscriptionTask.add_args(parser)
        parser.add_argument(
            "--distill-topk", default=None, type=int, required=True,
            metavar="K", help="number of teacher outputs to distill from",
        )

    def _load_pair_dataset(self, split, lang_pair):
        src, tgt = lang_pair.split("-")
        ds = super()._load_pair_dataset(split, lang_pair)
        teacher_probs_datasets = []
        teacher_idxs_datasets = []
        for path in self.paths:
            prefix = os.path.join(path, split) + "." + tgt
            idx_fname = prefix + ".top{}_idx".format(self.args.distill_topk)
            out_fname = prefix + ".top{}_out".format(self.args.distill_topk)
            if IndexedDataset.exists(idx_fname) and IndexedDataset.exists(
                out_fname
            ):
                teacher_probs_datasets.append(
                    TeacherOutputDataset(out_fname, np.float32)
                )
                teacher_idxs_datasets.append(
                    TeacherOutputDataset(idx_fname, np.int32)
                )
        assert teacher_idxs_datasets, (
            "Teacher datasets not found for pair {} split {}".format(
                lang_pair, split
            )
        )
        if len(teacher_idxs_datasets) > 1:
            teacher_idxs = ConcatDataset(teacher_idxs_datasets)
            teacher_probs = ConcatDataset(teacher_probs_datasets)
        else:
            teacher_idxs = teacher_idxs_datasets[0]
            teacher_probs = teacher_probs_datasets[0]
        assert len(ds) == len(teacher_idxs)
        return DatasetWithTeacherOutput(
            ds, teacher_probs, teacher_idxs, self.dicts[tgt],
            self.args.distill_topk,
        )
