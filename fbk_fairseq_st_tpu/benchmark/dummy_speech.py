"""dummy_speech benchmark task: synthetic fbank->text batches with no data
on disk (the speech analog of reference fairseq/benchmark/dummy_lm.py) —
what bench.py uses to measure train frames/sec."""

from __future__ import annotations

import numpy as np

from ..data.dictionary import Dictionary
from ..registry import register_task
from ..tasks.speech_recognition import SpeechRecognitionTask


class DummySpeechDataset:
    def __init__(self, n, frames, n_mels, tgt_len, vocab, seed=0):
        rng = np.random.RandomState(seed)
        self.items = []
        for i in range(n):
            t = rng.randint(int(frames * 0.8), frames + 1)
            tgt = rng.randint(4, vocab, size=tgt_len - 1).tolist() + [2]
            self.items.append(
                {
                    "id": i,
                    "source": rng.randn(t, n_mels).astype(np.float32),
                    "target": np.array(tgt, np.int64),
                }
            )
        from ..data.datasets import Seq2SeqCollater

        self.collater_impl = Seq2SeqCollater(pad_index=1, eos_index=2)

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def collater(self, samples, **pad_kwargs):
        return self.collater_impl.collate(samples, **pad_kwargs)

    def num_tokens(self, i):
        return self.items[i]["source"].shape[0]

    def size(self, i):
        return (self.items[i]["source"].shape[0], len(self.items[i]["target"]))

    def ordered_indices(self):
        return np.arange(len(self), dtype=np.int64)


@register_task("dummy_speech")
class DummySpeechTask(SpeechRecognitionTask):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", nargs="?", default="")
        parser.add_argument("--dict-size", default=8000, type=int)
        parser.add_argument("--dataset-size", default=1024, type=int)
        parser.add_argument("--src-frames", default=512, type=int)
        parser.add_argument("--tgt-len", default=48, type=int)
        parser.add_argument("--input-feat", default=80, type=int)
        parser.add_argument("--max-source-positions", default=4096, type=int)
        parser.add_argument("--max-target-positions", default=1024, type=int)

    @classmethod
    def setup_task(cls, args, **kwargs):
        d = Dictionary()
        for i in range(args.dict_size - 4):
            d.add_symbol(f"tok{i}")
        d.finalize(padding_factor=8)
        args.data = ""
        args.target_lang = None
        args.skip_normalization = True
        args.legacy_audio_fix_lua_indexing = False
        task = cls(args, d)
        return task

    def load_dataset(self, split, combine=False, **kwargs):
        self.datasets[split] = DummySpeechDataset(
            n=self.args.dataset_size,
            frames=self.args.src_frames,
            n_mels=self.args.input_feat,
            tgt_len=self.args.tgt_len,
            vocab=len(self.tgt_dict),
        )
