"""audio_pretraining task: raw-waveform CPC pretraining for wav2vec.

Counterpart of fairseq/tasks/audio_pretraining.py:12-58."""

from __future__ import annotations

import os

from ..data.raw_audio_dataset import FileAudioDataset
from ..registry import register_task
from .base import Task


@register_task("audio_pretraining")
class AudioPretrainingTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", help="path to data directory")
        parser.add_argument("--sample-rate", default=16000, type=int,
                            help="target sample rate")
        parser.add_argument("--max-sample-size", default=None, type=int,
                            help="max sample size to crop to for batching")
        parser.add_argument("--min-sample-size", default=None, type=int,
                            help="min sample size to crop to for batching")

    @classmethod
    def setup_task(cls, args, **kwargs):
        return cls(args)

    def load_dataset(self, split, **kwargs):
        manifest = os.path.join(self.args.data, "{}.tsv".format(split))
        self.datasets[split] = FileAudioDataset(
            manifest,
            sample_rate=self.args.sample_rate,
            max_sample_size=self.args.max_sample_size,
            min_sample_size=self.args.min_sample_size,
        )

    @property
    def target_dictionary(self):
        return None

    @property
    def source_dictionary(self):
        return None

    def max_positions(self):
        return (10 ** 9, 10 ** 9)
