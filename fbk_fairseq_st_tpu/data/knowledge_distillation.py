"""Knowledge-distillation data: teacher top-k outputs as indexed datasets.

Counterpart of fairseq/data/knowledge_distillation.py: per-position top-k
teacher (idx, logit) pairs stored as 2-D TNT items written WITHOUT the Lua
shift (TeacherOutputDatasetBuilder :16-24 writes raw values);
``DatasetWithTeacherOutput`` injects ``teacher_output = (idxs, probs)``
padded to the batch target length at collate (:57-152).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .datasets import Dataset
from .indexed_dataset import IndexedDataset, IndexedDatasetBuilder


class TeacherOutputDatasetBuilder(IndexedDatasetBuilder):
    """2-D (T, k) writer, values stored verbatim."""

    lua_compat_shift = 0


class TeacherOutputDataset(IndexedDataset):
    """Reader returning (T, k) arrays in their stored dtype."""

    def __init__(self, prefix: str, dtype=None):
        super().__init__(prefix)
        self.out_dtype = dtype

    def __getitem__(self, i: int) -> np.ndarray:
        self.check_index(i)
        shape = tuple(self.sizes[self.dim_offsets[i]: self.dim_offsets[i + 1]])
        start = self.data_offsets[i]
        n = int(np.prod(shape))
        a = np.array(self._data()[start: start + n]).reshape(shape)
        if np.issubdtype(a.dtype, np.integer):
            return a.astype(np.int64)
        return a.astype(np.float32)

    @staticmethod
    def save_bin(prefix: str, data_list, dtype=np.float32) -> None:
        builder = TeacherOutputDatasetBuilder(prefix + ".bin", dtype)
        for d in data_list:
            builder.add_item(np.asarray(d, dtype=dtype))
        builder.finalize(prefix + ".idx")


class DatasetWithTeacherOutput(Dataset):
    def __init__(self, src, teacher_probs, teacher_idxs, tgt_dict, distill_k: int):
        self.src = src
        self.teacher_probs = teacher_probs
        self.teacher_idxs = teacher_idxs
        self.tgt_dict = tgt_dict
        self.distill_k = distill_k

    def __getitem__(self, index):
        item = self.src[index]
        item["teacher_output"] = (
            self.teacher_idxs[index],
            self.teacher_probs[index],
        )
        return item

    def __len__(self):
        return len(self.src)

    def num_tokens(self, index):
        return self.src.num_tokens(index)

    def size(self, index):
        return self.src.size(index)

    @property
    def sizes(self):
        return self.src.sizes

    def ordered_indices(self):
        return self.src.ordered_indices()

    def collater(self, samples, **pad_kwargs):
        batch = self.src.collater(samples, **pad_kwargs)
        if len(batch) == 0 or batch.get("target") is None:
            return batch
        tgt_len = batch["target"].shape[1]
        pad_idx = self.tgt_dict.pad()
        k = self.distill_k
        by_id = {}
        for s in samples:
            idxs, probs = s["teacher_output"]
            t = idxs.shape[0]
            padded_idxs = np.full((tgt_len, k), pad_idx, np.int64)
            padded_probs = np.zeros((tgt_len, k), np.float32)
            t_use = min(t, tgt_len)
            padded_idxs[:t_use] = idxs[:t_use, :k]
            padded_probs[:t_use] = probs[:t_use, :k]
            by_id[s["id"]] = (padded_idxs, padded_probs)
        n_rows = batch["target"].shape[0]
        teacher_idxs = np.full((n_rows, tgt_len, k), pad_idx, np.int64)
        teacher_probs = np.zeros((n_rows, tgt_len, k), np.float32)
        for row, s_id in enumerate(batch["id"].tolist()):
            if s_id in by_id:
                teacher_idxs[row], teacher_probs[row] = by_id[s_id]
        batch["teacher_idxs"] = teacher_idxs
        batch["teacher_probs"] = teacher_probs
        return batch
