"""Dataset ABC, collation, and speech<->text datasets (host-side NumPy).

Mirrors the reference contracts:
  * FairseqDataset (fairseq/data/fairseq_dataset.py): collater / num_tokens /
    size / ordered_indices / set_epoch;
  * collate_tokens (fairseq/data/data_utils.py:27-48) incl.
    move_eos_to_beginning for prev_output_tokens;
  * per-utterance CMVN (examples/speech_recognition/data/data_utils.py:9-24);
  * Seq2SeqCollater batch layout (examples/speech_recognition/data/
    collaters.py): {id, ntokens, nsentences, net_input:{src_tokens,
    src_lengths, prev_output_tokens}, target, target_lengths}, samples
    sorted by descending frame count within the batch.

TPU addition: every collater takes optional fixed pad targets
(``pad_to_src_len`` / ``pad_to_tgt_len`` / ``pad_to_bsz``) so the bucketized
iterator can emit a small closed set of shapes — XLA compiles one graph per
bucket instead of one per batch.
"""

from __future__ import annotations

import bisect
from typing import List, Optional

import numpy as np


class Dataset:
    """Base dataset (reference FairseqDataset)."""

    def __getitem__(self, index: int):
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def collater(self, samples):
        raise NotImplementedError

    def num_tokens(self, index: int) -> int:
        raise NotImplementedError

    def num_tokens_vec(self, indices) -> np.ndarray:
        """Token counts for many indices at once, feeding the native
        batch packer (role of the reference's num_tokens_vec added for
        data_utils_fast.pyx). Subclasses with a sizes array override
        with O(1)-per-item fancy indexing."""
        return np.fromiter(
            (self.num_tokens(int(i)) for i in indices),
            dtype=np.int64,
            count=len(indices),
        )

    def size(self, index: int):
        raise NotImplementedError

    def ordered_indices(self) -> np.ndarray:
        return np.arange(len(self), dtype=np.int64)

    @property
    def supports_prefetch(self) -> bool:
        return False

    def prefetch(self, indices) -> None:
        pass

    def set_epoch(self, epoch: int) -> None:
        pass


def collate_tokens(
    values: List[np.ndarray],
    pad_idx: int,
    eos_idx: Optional[int] = None,
    left_pad: bool = False,
    move_eos_to_beginning: bool = False,
    pad_to_length: Optional[int] = None,
) -> np.ndarray:
    """Pad a list of 1-D token arrays into a 2-D batch
    (reference fairseq/data/data_utils.py:27-48)."""
    size = max(len(v) for v in values)
    if pad_to_length is not None:
        size = max(size, pad_to_length)
    res = np.full((len(values), size), pad_idx, dtype=np.int64)

    for i, v in enumerate(values):
        v = np.asarray(v)
        if move_eos_to_beginning:
            # rows may end in a language token instead of </s> (mBART
            # add_lang_token batches can mix languages): rotate whatever
            # terminator the row actually has
            dst = np.empty_like(v)
            dst[0] = v[-1]
            dst[1:] = v[:-1]
        else:
            dst = v
        if left_pad:
            res[i, size - len(v):] = dst
        else:
            res[i, : len(v)] = dst
    return res


def collate_frames(
    frames: List[np.ndarray], pad_to_length: Optional[int] = None
) -> np.ndarray:
    """Pad (T_i, F) float arrays into (B, T_max, F) zero-filled."""
    len_max = max(f.shape[0] for f in frames)
    if pad_to_length is not None:
        len_max = max(len_max, pad_to_length)
    f_dim = frames[0].shape[1]
    res = np.zeros((len(frames), len_max, f_dim), dtype=frames[0].dtype)
    for i, v in enumerate(frames):
        res[i, : v.shape[0]] = v
    return res


def apply_mv_norm(features: np.ndarray) -> np.ndarray:
    """Per-utterance CMVN (reference examples/.../data/data_utils.py:9-24;
    torch biased-var semantics with var ddof=1)."""
    mean = features.mean(0)
    var = features.var(0, ddof=1)
    eps = 1e-8
    if (var < eps).any():
        inv = 1.0 / (np.sqrt(var) + eps)
    else:
        inv = 1.0 / np.sqrt(var)
    return ((features - mean) * inv).astype(features.dtype)


class Seq2SeqCollater:
    """Speech->text batch assembly (reference collaters.py:21-140)."""

    def __init__(
        self,
        pad_index: int = 1,
        eos_index: int = 2,
        move_eos_to_beginning: bool = True,
    ):
        self.pad_index = pad_index
        self.eos_index = eos_index
        self.move_eos_to_beginning = move_eos_to_beginning

    def collate(
        self,
        samples,
        pad_to_src_len: Optional[int] = None,
        pad_to_tgt_len: Optional[int] = None,
        pad_to_bsz: Optional[int] = None,
    ):
        samples = [s for s in samples if s.get("source") is not None]
        if len(samples) == 0:
            return {}

        ids = np.array([s["id"] for s in samples], dtype=np.int64)
        frames = collate_frames([s["source"] for s in samples], pad_to_src_len)
        frames_lengths = np.array(
            [s["source"].shape[0] for s in samples], dtype=np.int64
        )
        # sort by descending number of frames (reference collaters.py:88-92)
        sort_order = np.argsort(-frames_lengths, kind="stable")
        ids = ids[sort_order]
        frames = frames[sort_order]
        frames_lengths = frames_lengths[sort_order]

        target = target_lengths = prev_output_tokens = None
        if samples[0].get("target") is not None:
            ntokens = sum(len(s["target"]) for s in samples)
            target = collate_tokens(
                [s["target"] for s in samples],
                self.pad_index,
                self.eos_index,
                pad_to_length=pad_to_tgt_len,
            )[sort_order]
            target_lengths = np.array(
                [len(s["target"]) for s in samples], dtype=np.int64
            )[sort_order]
            prev_output_tokens = collate_tokens(
                [s["target"] for s in samples],
                self.pad_index,
                self.eos_index,
                move_eos_to_beginning=self.move_eos_to_beginning,
                pad_to_length=pad_to_tgt_len,
            )[sort_order]
        else:
            ntokens = sum(s["source"].shape[0] for s in samples)

        nsentences = len(samples)
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences

            def pad_rows(a, fill):
                if a is None:
                    return None
                pad_shape = (extra,) + a.shape[1:]
                return np.concatenate(
                    [a, np.full(pad_shape, fill, dtype=a.dtype)], axis=0
                )

            ids = pad_rows(ids, -1)
            frames = pad_rows(frames, 0.0)
            frames_lengths = pad_rows(frames_lengths, 0)
            target = pad_rows(target, self.pad_index)
            target_lengths = pad_rows(target_lengths, 0)
            prev_output_tokens = pad_rows(prev_output_tokens, self.pad_index)

        batch = {
            "id": ids,
            "ntokens": ntokens,
            "nsentences": nsentences,
            "net_input": {
                "src_tokens": frames,
                "src_lengths": frames_lengths,
            },
            "target": target,
            "target_lengths": target_lengths,
        }
        if prev_output_tokens is not None:
            batch["net_input"]["prev_output_tokens"] = prev_output_tokens
        return batch


class FilterBankToTextDataset(Dataset):
    """Precomputed filterbanks + target text
    (reference fbank_dataset.py:17-152)."""

    def __init__(self, src_dataset, tgt_dataset, tgt_dict, skip_normalization=False):
        if tgt_dataset is not None:
            assert len(src_dataset) == len(tgt_dataset)
        self.src_dataset = src_dataset
        self.tgt_dataset = tgt_dataset
        self.tgt_dict = tgt_dict
        self.skip_normalization = skip_normalization
        self.s2s_collater = Seq2SeqCollater(
            pad_index=tgt_dict.pad(), eos_index=tgt_dict.eos()
        )

    def __getitem__(self, index):
        src_item = np.asarray(self.src_dataset[index])
        if not self.skip_normalization:
            src_item = apply_mv_norm(src_item)
        tgt_item = (
            np.asarray(self.tgt_dataset[index])
            if self.tgt_dataset is not None
            else None
        )
        return {"id": index, "source": src_item, "target": tgt_item}

    def __len__(self):
        return len(self.src_dataset)

    def collater(self, samples, **pad_kwargs):
        return self.s2s_collater.collate(samples, **pad_kwargs)

    def num_tokens(self, index):
        return self.src_dataset.size(index)

    def size(self, index):
        return (
            self.src_dataset.size(index),
            self.tgt_dataset.size(index) if self.tgt_dataset is not None else 0,
        )

    @property
    def sizes(self):
        return (
            self.tgt_dataset.sizes if self.tgt_dataset is not None else None
        )

    def src_sizes(self) -> np.ndarray:
        return np.array(
            [self.src_dataset.size(i) for i in range(len(self))], dtype=np.int64
        )

    def ordered_indices(self):
        return np.arange(len(self), dtype=np.int64)


class TranscriptionWrapperDataset(Dataset):
    """Adds transcript targets to each batch
    (reference examples/speech_recognition/data/transcription_dataset.py):
    batches gain ``transcript_target``, ``transcript_target_lengths`` and
    ``net_input.transcript_prev_output_tokens``, row-aligned with the frame
    sort order of the wrapped collater."""

    def __init__(self, tgt_dataset, transcription_dataset, transcription_dict):
        self.tgt_dataset = tgt_dataset
        self.transcription_dataset = transcription_dataset
        self.transcription_dict = transcription_dict

    def __getitem__(self, index):
        item = self.tgt_dataset[index]
        item["transcript_target"] = np.asarray(self.transcription_dataset[index])
        return item

    def __len__(self):
        return len(self.tgt_dataset)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None, pad_to_bsz=None):
        batch = self.tgt_dataset.collater(
            samples,
            pad_to_src_len=pad_to_src_len,
            pad_to_tgt_len=pad_to_tgt_len,
            pad_to_bsz=pad_to_bsz,
        )
        if len(batch) == 0:
            return {}
        # align transcript rows with the wrapped collater's sort order via ids
        id_to_pos = {s["id"]: i for i, s in enumerate(samples)}
        order = [
            id_to_pos[int(i)] for i in batch["id"] if int(i) in id_to_pos
        ]
        transcripts = [samples[i]["transcript_target"] for i in order]
        lens = np.array([len(t) for t in transcripts], dtype=np.int64)
        tt = collate_tokens(
            transcripts,
            self.transcription_dict.pad(),
            self.transcription_dict.eos(),
            pad_to_length=pad_to_tgt_len,
        )
        prev = collate_tokens(
            transcripts,
            self.transcription_dict.pad(),
            self.transcription_dict.eos(),
            move_eos_to_beginning=True,
            pad_to_length=pad_to_tgt_len,
        )
        n_rows = batch["target"].shape[0] if batch.get("target") is not None else len(order)
        if n_rows > len(order):  # fixed-shape bsz padding rows
            extra = n_rows - len(order)
            tt = np.concatenate(
                [tt, np.full((extra, tt.shape[1]), self.transcription_dict.pad(), tt.dtype)]
            )
            prev = np.concatenate(
                [prev, np.full((extra, prev.shape[1]), self.transcription_dict.pad(), prev.dtype)]
            )
            lens = np.concatenate([lens, np.zeros(extra, lens.dtype)])
        batch["transcript_target"] = tt
        batch["transcript_target_lengths"] = lens
        batch["net_input"]["transcript_prev_output_tokens"] = prev
        return batch

    def num_tokens(self, index):
        return self.tgt_dataset.num_tokens(index)

    def size(self, index):
        return self.tgt_dataset.size(index)

    @property
    def sizes(self):
        return self.tgt_dataset.sizes

    def ordered_indices(self):
        return self.tgt_dataset.ordered_indices()


class ContextAwareDataset(Dataset):
    """Adds a context item (previous audio or previous target text) to each
    batch (reference examples/speech_recognition/data/context_dataset.py):
    batches gain ``net_input.context_tokens`` / ``net_input.context_lengths``
    row-aligned with the wrapped collater's frame sort order."""

    def __init__(self, dataset, context_dataset, context_dict, audio_context):
        self.dataset = dataset
        self.context_dataset = context_dataset
        self.context_dict = context_dict
        self.audio_context = audio_context

    def __getitem__(self, index):
        item = self.dataset[index]
        item["context"] = np.asarray(self.context_dataset[index])
        return item

    def __len__(self):
        return len(self.dataset)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None, pad_to_bsz=None):
        batch = self.dataset.collater(
            samples,
            pad_to_src_len=pad_to_src_len,
            pad_to_tgt_len=pad_to_tgt_len,
            pad_to_bsz=pad_to_bsz,
        )
        if len(batch) == 0:
            return {}
        id_to_pos = {s["id"]: i for i, s in enumerate(samples)}
        order = [id_to_pos[int(i)] for i in batch["id"] if int(i) in id_to_pos]
        contexts = [samples[i]["context"] for i in order]
        lens = np.array([c.shape[0] for c in contexts], dtype=np.int64)
        if self.audio_context:
            context = collate_frames(contexts, pad_to_src_len)
        else:
            context = collate_tokens(
                contexts,
                self.context_dict.pad(),
                self.context_dict.eos(),
                pad_to_length=pad_to_tgt_len,
            )
        n_rows = batch["net_input"]["src_tokens"].shape[0]
        if n_rows > len(order):
            extra = n_rows - len(order)
            fill = 0.0 if self.audio_context else self.context_dict.pad()
            context = np.concatenate(
                [
                    context,
                    np.full((extra,) + context.shape[1:], fill, context.dtype),
                ]
            )
            lens = np.concatenate([lens, np.zeros(extra, lens.dtype)])
        batch["net_input"]["context_tokens"] = context
        batch["net_input"]["context_lengths"] = lens
        return batch

    def num_tokens(self, index):
        return self.dataset.num_tokens(index)

    def size(self, index):
        return self.dataset.size(index)

    @property
    def sizes(self):
        return self.dataset.sizes

    def ordered_indices(self):
        return self.dataset.ordered_indices()


class MultiTaskDataset(Dataset):
    """Adds a per-utterance auxiliary classification target
    (reference examples/speech_recognition/data/multitask_dataset.py)."""

    def __init__(self, base_dataset, auxiliary_targets):
        self.base_dataset = base_dataset
        self.auxiliary_targets = auxiliary_targets

    def __getitem__(self, index):
        item = self.base_dataset[index]
        item["auxiliary_target"] = np.asarray(self.auxiliary_targets[index])
        return item

    def __len__(self):
        return len(self.base_dataset)

    def collater(self, samples, **pad_kwargs):
        batch = self.base_dataset.collater(samples, **pad_kwargs)
        if len(batch) == 0:
            return {}
        id_to_pos = {s["id"]: i for i, s in enumerate(samples)}
        order = [id_to_pos[int(i)] for i in batch["id"] if int(i) in id_to_pos]
        aux = np.stack([samples[i]["auxiliary_target"] for i in order])
        n_rows = batch["net_input"]["src_tokens"].shape[0]
        if n_rows > len(order):
            aux = np.concatenate(
                [aux, np.zeros((n_rows - len(order),) + aux.shape[1:], aux.dtype)]
            )
        batch["auxiliary_target"] = aux
        return batch

    def num_tokens(self, index):
        return self.base_dataset.num_tokens(index)

    def size(self, index):
        return self.base_dataset.size(index)

    @property
    def sizes(self):
        return self.base_dataset.sizes

    def ordered_indices(self):
        return self.base_dataset.ordered_indices()


class LangtokFilterBanksToTextDataset(Dataset):
    """Language-token wrapper (reference examples/speech_recognition/data/
    langtok_fbank_dataset.py): tags batches with the encoder langtok name
    and rewrites the decoder's first prev token to the target langtok id."""

    def __init__(self, wrapped_ds, lang_for_token=None, tgt_bos=None, tgt_langtok=None):
        self.wrapped_ds = wrapped_ds
        self.lang_for_token = lang_for_token
        self.tgt_bos = tgt_bos
        self.tgt_langtok = tgt_langtok

    def __getitem__(self, index):
        return self.wrapped_ds[index]

    def __len__(self):
        return len(self.wrapped_ds)

    def collater(self, samples, **pad_kwargs):
        batch = self.wrapped_ds.collater(samples, **pad_kwargs)
        if len(batch) == 0:
            return {}
        batch["net_input"]["langtok"] = self.lang_for_token
        if (
            self.tgt_langtok is not None
            and "prev_output_tokens" in batch["net_input"]
        ):
            prev = batch["net_input"]["prev_output_tokens"]
            # fixed-shape bsz padding rows keep pad at position 0
            is_real = prev[:, 0] == self.tgt_bos
            assert ((prev[:, 0] == self.tgt_bos) | (prev[:, 0] == 1)).all()
            prev[is_real, 0] = self.tgt_langtok
        return batch

    def num_tokens(self, index):
        return self.wrapped_ds.num_tokens(index)

    def size(self, index):
        return self.wrapped_ds.size(index)

    @property
    def sizes(self):
        return self.wrapped_ds.sizes

    def ordered_indices(self):
        return self.wrapped_ds.ordered_indices()


class RoundRobinZipDatasets(Dataset):
    """Zip multiple datasets, round-robin over the shorter ones
    (reference fairseq/data/round_robin_zip_datasets.py): item i is an
    OrderedDict {key: dataset[i % len(dataset)]}; the collater returns a
    dict of per-key batches."""

    def __init__(self, datasets, eval_key=None):
        assert isinstance(datasets, dict) and len(datasets) > 0
        self.datasets = datasets
        self.eval_key = eval_key
        self.longest_dataset_key = max(datasets, key=lambda k: len(datasets[k]))
        self.longest_dataset = datasets[self.longest_dataset_key]

    def _map_index(self, key, index):
        return index % len(self.datasets[key])

    def __getitem__(self, index):
        if self.eval_key is None:
            return {
                key: ds[self._map_index(key, index)]
                for key, ds in self.datasets.items()
            }
        return self.datasets[self.eval_key][
            self._map_index(self.eval_key, index)
        ]

    def __len__(self):
        return len(self.longest_dataset)

    def collater(self, samples, **pad_kwargs):
        if len(samples) == 0:
            return {}
        if self.eval_key is None:
            return {
                key: ds.collater([s[key] for s in samples], **pad_kwargs)
                for key, ds in self.datasets.items()
            }
        return self.datasets[self.eval_key].collater(samples, **pad_kwargs)

    def num_tokens(self, index):
        return max(
            ds.num_tokens(self._map_index(key, index))
            for key, ds in self.datasets.items()
        )

    def size(self, index):
        if self.eval_key is None:
            return {
                key: ds.size(self._map_index(key, index))
                for key, ds in self.datasets.items()
            }
        return self.datasets[self.eval_key].size(
            self._map_index(self.eval_key, index)
        )

    def max_component_size(self, index):
        """Component-wise max size for filtering."""
        sizes = [
            ds.size(self._map_index(key, index))
            for key, ds in self.datasets.items()
        ]
        if isinstance(sizes[0], tuple):
            return tuple(max(s[i] for s in sizes) for i in range(len(sizes[0])))
        return max(sizes)

    def ordered_indices(self):
        return np.arange(len(self), dtype=np.int64)


class ConcatDataset(Dataset):
    """Concatenation of datasets (reference fairseq/data/concat_dataset.py,
    sample_ratios=1 case)."""

    def __init__(self, datasets):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets])

    def _index(self, idx):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        offset = self.cumulative_sizes[ds_idx - 1] if ds_idx > 0 else 0
        return ds_idx, idx - offset

    def __getitem__(self, idx):
        ds_idx, sample_idx = self._index(idx)
        return self.datasets[ds_idx][sample_idx]

    def __len__(self):
        return int(self.cumulative_sizes[-1])

    def collater(self, samples, **kwargs):
        return self.datasets[0].collater(samples, **kwargs)

    def num_tokens(self, index):
        ds_idx, sample_idx = self._index(index)
        return self.datasets[ds_idx].num_tokens(sample_idx)

    def size(self, index):
        ds_idx, sample_idx = self._index(index)
        return self.datasets[ds_idx].size(sample_idx)

    @property
    def sizes(self):
        parts = [
            d.sizes if hasattr(d, "sizes") else np.array([d.size(i) for i in range(len(d))])
            for d in self.datasets
        ]
        return np.concatenate(parts)
