"""Raw-waveform datasets for wav2vec pretraining.

Counterpart of fairseq/data/audio/raw_audio_dataset.py:13-156
(RawAudioDataset / FileAudioDataset): a ``{split}.tsv`` manifest (first
line: root dir; then ``relpath<TAB>n_samples`` per line), items are float
waveforms normalized to zero mean/unit variance, the collater random-crops
every sample in the batch to one common size. WAV files are read with the
built-in frontend (``data/audio.read_wav``) instead of soundfile; batches
are crop-to-common-size so the training program keeps a static shape per
bucket."""

from __future__ import annotations

import os

import numpy as np

from .audio import read_wav
from .datasets import Dataset


class RawAudioDataset(Dataset):
    def __init__(self, sample_rate, max_sample_size=None,
                 min_sample_size=None, shuffle=True):
        self.sample_rate = sample_rate
        self.max_sample_size = (
            max_sample_size if max_sample_size is not None else 2 ** 31
        )
        self.min_sample_size = (
            min_sample_size if min_sample_size is not None
            else self.max_sample_size
        )
        self.shuffle = shuffle
        self._sizes = []

    def postprocess(self, feats, curr_sample_rate):
        if curr_sample_rate != self.sample_rate:
            raise ValueError(
                f"sample rate {curr_sample_rate} != {self.sample_rate} "
                "(resample offline)"
            )
        feats = feats.astype(np.float32)
        feats = feats - feats.mean()
        std = feats.std()
        return feats / max(std, 1e-8)

    def crop_to_max_size(self, wav, target_size, rng=np.random):
        size = len(wav)
        diff = size - target_size
        if diff <= 0:
            return wav
        start = rng.randint(0, diff + 1)
        return wav[start: size - diff + start]

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        samples = [
            s for s in samples
            if s.get("source") is not None and len(s["source"]) > 0
        ]
        if len(samples) == 0:
            return {}
        sizes = [len(s["source"]) for s in samples]
        target_size = min(min(sizes), self.max_sample_size)
        collated = np.stack(
            [self.crop_to_max_size(s["source"], target_size)
             for s in samples]
        )
        ids = np.array([s["id"] for s in samples], np.int64)
        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences
            ids = np.concatenate([ids, np.full(extra, -1, np.int64)])
            collated = np.concatenate(
                [collated, np.zeros((extra, target_size), collated.dtype)]
            )
        return {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": int(sum(sizes)),
            "net_input": {
                "source": collated,
                "src_lengths": np.full(len(ids), target_size, np.int64),
            },
        }

    def num_tokens(self, index):
        return self.size(index)

    def size(self, index):
        return min(int(self._sizes[index]), self.max_sample_size)

    @property
    def sizes(self):
        return np.minimum(np.asarray(self._sizes), self.max_sample_size)

    def __len__(self):
        return len(self._sizes)

    def ordered_indices(self):
        if self.shuffle:
            order = np.random.permutation(len(self)).astype(np.int64)
        else:
            order = np.arange(len(self), dtype=np.int64)
        return order[np.argsort(self.sizes[order], kind="mergesort")]


class FileAudioDataset(RawAudioDataset):
    def __init__(self, manifest_path, sample_rate, max_sample_size=None,
                 min_sample_size=None, shuffle=True, min_length=0):
        super().__init__(sample_rate, max_sample_size, min_sample_size,
                         shuffle)
        self.fnames = []
        sizes = []
        with open(manifest_path) as f:
            self.root_dir = f.readline().strip()
            for line in f:
                items = line.strip().split("\t")
                assert len(items) == 2, line
                if int(items[1]) >= min_length:
                    self.fnames.append(items[0])
                    sizes.append(int(items[1]))
        self._sizes = sizes

    def __getitem__(self, index):
        path = os.path.join(self.root_dir, self.fnames[index])
        wav, rate = read_wav(path)
        return {"id": index, "source": self.postprocess(wav, rate)}
