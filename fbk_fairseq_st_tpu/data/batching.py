"""Token-budget batch packing + TPU shape bucketing.

``batch_by_size`` reproduces the reference algorithm exactly
(fairseq/data/data_utils_fast.pyx:27-68: grow the batch while
(len+1)*max_len <= max_tokens, respect max_sentences, split at the largest
multiple of bsz_mult) so batch composition — and therefore training curves —
match the fork. Like the reference (which compiles this loop with Cython
because packing millions of indices in interpreted code is a startup
bottleneck), the hot path is native: when ``num_tokens_fn`` is a
per-position length array, the C++ kernel in ``native/batching.cpp`` packs
it and the Python loop remains as the toolchain-free fallback (both are
cross-checked in tests/test_native.py).

``shape_bucket`` is the TPU layer on top: given a batch's raw (src_len,
tgt_len, bsz), pick padded targets from a geometric grid so the number of
distinct compiled shapes is O(log(max_len)^2) instead of O(#batches).
"""

from __future__ import annotations

import ctypes
import math
from typing import Callable, List, Optional, Sequence, Union

import numpy as np


def _is_batch_full(batch_len: int, num_tokens: int, max_tokens: int, max_sentences: int) -> bool:
    if batch_len == 0:
        return False
    if max_sentences > 0 and batch_len == max_sentences:
        return True
    if max_tokens > 0 and num_tokens > max_tokens:
        return True
    return False


def _batch_by_size_native(
    indices: np.ndarray,
    num_tokens_vec: np.ndarray,
    max_tokens: int,
    max_sentences: int,
    bsz_mult: int,
) -> Optional[List[List[int]]]:
    from ..native.build import load_library

    lib = load_library("batching")
    if lib is None:
        return None
    fn = lib.batch_by_size_fast
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    toks = np.ascontiguousarray(num_tokens_vec, dtype=np.int64)
    ends = np.empty(max(len(toks), 1), dtype=np.int64)
    n = fn(
        toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(toks),
        max_tokens,
        max_sentences,
        bsz_mult,
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n < 0:
        pos = -int(n) - 1
        raise AssertionError(
            f"sentence at index {int(indices[pos])} of size "
            f"{int(toks[pos])} exceeds max_tokens limit of {max_tokens}!"
        )
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    out, start = [], 0
    for end in ends[:n].tolist():
        out.append(idx[start:end].tolist())
        start = end
    return out


def batch_by_size(
    indices: Sequence[int],
    num_tokens_fn: Union[Callable[[int], int], np.ndarray],
    max_tokens: Optional[int] = None,
    max_sentences: Optional[int] = None,
    required_batch_size_multiple: int = 1,
) -> List[List[int]]:
    max_tokens = max_tokens if max_tokens is not None else -1
    max_sentences = max_sentences if max_sentences is not None else -1
    bsz_mult = required_batch_size_multiple

    pos_toks = None
    if not callable(num_tokens_fn):
        # per-POSITION length vector (aligned with `indices`) -> native path
        pos_toks = np.asarray(num_tokens_fn)
        assert pos_toks.shape == (len(indices),), (
            "vectorized num_tokens must align with indices"
        )
        native = _batch_by_size_native(
            np.asarray(indices), pos_toks, max_tokens, max_sentences,
            bsz_mult,
        )
        if native is not None:
            return native

    sample_len = 0
    sample_lens: List[int] = []
    batch: List[int] = []
    batches: List[List[int]] = []

    for pos, idx in enumerate(indices):
        idx = int(idx)
        num_tokens = (
            int(pos_toks[pos]) if pos_toks is not None else num_tokens_fn(idx)
        )
        sample_lens.append(num_tokens)
        sample_len = max(sample_len, num_tokens)
        assert max_tokens <= 0 or sample_len <= max_tokens, (
            f"sentence at index {idx} of size {sample_len} exceeds max_tokens "
            f"limit of {max_tokens}!"
        )
        num_tokens = (len(batch) + 1) * sample_len
        if _is_batch_full(len(batch), num_tokens, max_tokens, max_sentences):
            mod_len = max(
                bsz_mult * (len(batch) // bsz_mult),
                len(batch) % bsz_mult,
            )
            batches.append(batch[:mod_len])
            batch = batch[mod_len:]
            sample_lens = sample_lens[mod_len:]
            sample_len = max(sample_lens) if sample_lens else 0
        batch.append(idx)
    if batch:
        batches.append(batch)
    return batches


def _raise_invalid_size(idx, size, max_positions):
    raise Exception(
        f"Size of sample #{idx} is invalid (={size}) "
        f"since max_positions={max_positions}, skip this example with "
        f"--skip-invalid-size-inputs-valid-test"
    )


def filter_by_size_vec(
    indices: np.ndarray,
    src_sizes: np.ndarray,
    tgt_sizes: Optional[np.ndarray],
    max_positions,
    raise_exception: bool = False,
):
    """Vectorized twin of ``filter_by_size`` for datasets whose sizes live
    in arrays (the reference added the same fast path as
    filter_paired_dataset_indices_by_size). Returns (kept, ignored)."""
    if isinstance(max_positions, (int, float)):
        max_src = max_tgt = max_positions
    else:
        max_src = max_positions[0]
        max_tgt = max_positions[1] if len(max_positions) > 1 else None
    indices = np.asarray(indices, dtype=np.int64)
    src_sizes = np.asarray(src_sizes)
    keep = np.ones(len(indices), dtype=bool)
    if max_src is not None:
        keep &= src_sizes[indices] <= max_src
    if tgt_sizes is not None and max_tgt is not None:
        keep &= np.asarray(tgt_sizes)[indices] <= max_tgt
    ignored = indices[~keep].tolist()
    if ignored and raise_exception:
        first = ignored[0]
        size = (
            int(src_sizes[first])
            if tgt_sizes is None
            else (int(src_sizes[first]), int(np.asarray(tgt_sizes)[first]))
        )
        _raise_invalid_size(first, size, max_positions)
    return indices[keep], ignored


def filter_by_size(
    indices: np.ndarray,
    size_fn: Callable[[int], object],
    max_positions,
    raise_exception: bool = False,
):
    """Drop indices whose size exceeds max_positions (component-wise for
    tuple sizes; reference fairseq/data/data_utils.py:163-198)."""

    def check(idx) -> bool:
        size = size_fn(idx)
        if isinstance(size, (int, float, np.integer, np.floating)):
            mp = (
                max_positions
                if isinstance(max_positions, (int, float))
                else max_positions[0]
            )
            return size <= mp
        if isinstance(max_positions, (int, float)):
            return all(s <= max_positions for s in size)
        return all(
            s <= mp for s, mp in zip(size, max_positions) if mp is not None
        )

    keep, ignored = [], []
    for idx in indices:
        (keep if check(int(idx)) else ignored).append(int(idx))
    if ignored and raise_exception:
        _raise_invalid_size(ignored[0], size_fn(ignored[0]), max_positions)
    return np.array(keep, dtype=np.int64), ignored


class ShapeBucketer:
    """Round lengths up to a closed geometric grid of pad targets.

    Grid: {min_size * growth^k} clipped to max_size, plus max_size itself.
    growth=2^(1/2) keeps padding waste under ~30% worst case while bounding
    the distinct-shape count (and thus XLA compilations).
    """

    def __init__(self, min_size: int = 8, max_size: int = 4096, growth: float = 2 ** 0.5):
        sizes = []
        s = float(min_size)
        while s < max_size:
            sizes.append(int(math.ceil(s)))
            s *= growth
        sizes.append(int(max_size))
        # dedupe ascending
        self.sizes = sorted(set(sizes))

    def bucket(self, n: int) -> int:
        for s in self.sizes:
            if n <= s:
                return s
        return self.sizes[-1]


def num_shapes_estimate(bucketer: ShapeBucketer) -> int:
    return len(bucketer.sizes)
