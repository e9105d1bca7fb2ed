"""speech_translation_with_transcription task.

Counterpart of examples/speech_recognition/tasks/speech_translation_ctc.py:
the ST dataset also carries source-language transcripts (for joint CTC
training / multi-decoder models): adds the source dictionary
(``dict.<src>.txt`` + <ctc_blank> when the criterion is ctc_multi_loss) and
wraps the dataset so batches carry transcript_target /
transcript_target_lengths / net_input.transcript_prev_output_tokens.
"""

from __future__ import annotations

import logging
import os

from ..data.datasets import ConcatDataset, TranscriptionWrapperDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import load_indexed_dataset
from ..registry import register_task
from .speech_recognition import SpeechRecognitionTask

logger = logging.getLogger(__name__)


@register_task("speech_translation_with_transcription")
class SpeechTranslationCTCTask(SpeechRecognitionTask):
    @staticmethod
    def add_args(parser):
        SpeechRecognitionTask.add_args(parser)
        parser.add_argument(
            "-s", "--source-lang", default=None, metavar="TARGET",
            help="source language",
        )

    def __init__(self, args, tgt_dict):
        super().__init__(args, tgt_dict)
        self.src_dict = None  # set in setup_task

    @classmethod
    def setup_task(cls, args, **kwargs):
        task = super(SpeechTranslationCTCTask, cls).setup_task(args)
        source_dict_path = os.path.join(
            args.data.split(os.pathsep)[0], "dict.{}.txt".format(args.source_lang)
        )
        if not os.path.isfile(source_dict_path):
            raise FileNotFoundError("Dict not found: {}".format(source_dict_path))
        src_dict = Dictionary.load(source_dict_path)
        if getattr(args, "criterion", None) == "ctc_multi_loss":
            src_dict.add_symbol("<ctc_blank>")
        logger.info("CTC dictionary: {} types".format(len(src_dict)))
        task.src_dict = src_dict
        return task

    def load_dataset(self, split, combine=False, **kwargs):
        super().load_dataset(split, combine=combine, **kwargs)
        transcr_datasets = []
        for path in self.paths:
            ds = load_indexed_dataset(
                os.path.join(path, split) + "." + self.args.source_lang,
                self.src_dict,
                getattr(self.args, "dataset_impl", None),
            )
            if ds is not None:
                transcr_datasets.append(ds)
        assert len(transcr_datasets) > 0
        if len(transcr_datasets) > 1:
            transcr_dataset = ConcatDataset(transcr_datasets)
        else:
            transcr_dataset = transcr_datasets[0]
        assert len(self.datasets[split]) == len(transcr_dataset)
        self.datasets[split] = TranscriptionWrapperDataset(
            self.datasets[split], transcr_dataset, self.src_dict
        )

    @property
    def source_dictionary(self):
        return self.src_dict
