"""speech_translation_with_transcription_kd task (reference tasks/
speech_translation_ctc_kd.py): ST-with-transcripts data further wrapped
with the teacher's top-k outputs (``<split>.<tgt>.top{K}_{idx,out}``
written by cli/generate_topk)."""

from __future__ import annotations

import os

import numpy as np

from ..data.datasets import ConcatDataset
from ..data.indexed_dataset import IndexedDataset
from ..data.knowledge_distillation import (
    DatasetWithTeacherOutput,
    TeacherOutputDataset,
)
from ..registry import register_task
from .speech_translation_ctc import SpeechTranslationCTCTask


@register_task("speech_translation_with_transcription_kd")
class SpeechTranslationCTCWithKDTask(SpeechTranslationCTCTask):
    @staticmethod
    def add_args(parser):
        SpeechTranslationCTCTask.add_args(parser)
        parser.add_argument(
            "--distill-topk", default=None, type=int, required=True, metavar="K",
            help="number of teacher outputs to distill from",
        )

    def load_dataset(self, split, combine=False, **kwargs):
        super().load_dataset(split, combine=combine, **kwargs)
        teacher_probs_datasets = []
        teacher_idxs_datasets = []
        for path in self.paths:
            prefix = os.path.join(path, split) + "." + self.args.target_lang
            idx_fname = prefix + ".top{}_idx".format(self.args.distill_topk)
            out_fname = prefix + ".top{}_out".format(self.args.distill_topk)
            if IndexedDataset.exists(idx_fname) and IndexedDataset.exists(out_fname):
                teacher_probs_datasets.append(
                    TeacherOutputDataset(out_fname, np.float32)
                )
                teacher_idxs_datasets.append(
                    TeacherOutputDataset(idx_fname, np.int32)
                )
        assert len(teacher_idxs_datasets) > 0, (
            f"no teacher top-{self.args.distill_topk} outputs found for {split}"
        )
        if len(teacher_idxs_datasets) > 1:
            teacher_idxs_dataset = ConcatDataset(teacher_idxs_datasets)
            teacher_probs_dataset = ConcatDataset(teacher_probs_datasets)
        else:
            teacher_idxs_dataset = teacher_idxs_datasets[0]
            teacher_probs_dataset = teacher_probs_datasets[0]
        assert len(self.datasets[split]) == len(teacher_idxs_dataset)
        self.datasets[split] = DatasetWithTeacherOutput(
            self.datasets[split],
            teacher_probs_dataset,
            teacher_idxs_dataset,
            self.tgt_dict,
            self.args.distill_topk,
        )
