"""Fixed factorized sparse attention (Child et al. 2019, "Generating Long
Sequences with Sparse Transformers").

Counterpart of reference fairseq/modules/sparse_multihead_attention.py:11:
A(1) attends within the current stride window, A(2) to an "expressivity"-
sized summary at the end of every window; unidirectional mode excludes
future positions. The reference materializes the pattern as an additive
0/-inf mask inside a subclassed MultiheadAttention; here the pattern is a
pure host-side mask precomputed once per (shape, config) — under jit the
sequence length is static, so the mask is a compile-time constant folded
into the attention logits, which is the TPU-friendly formulation (no
dynamic gather, MXU-shaped logits).
"""

from __future__ import annotations

import functools
import math

import numpy as np

NEG_INF = float("-inf")


def _checkpoint_index(word_index: int, stride: int, expressivity: int) -> int:
    if word_index % stride == 0 and word_index != 0:
        return word_index - expressivity
    return (
        math.floor(word_index / stride) * stride + stride - expressivity
    )


def _subset_summaries(absolute_max: int, stride: int, expressivity: int):
    checkpoint_index = _checkpoint_index(0, stride, expressivity)
    subset = set()
    while checkpoint_index <= absolute_max - 1:
        subset |= set(
            range(
                checkpoint_index,
                min(checkpoint_index + expressivity + 1, absolute_max),
            )
        )
        nxt = _checkpoint_index(
            checkpoint_index + stride, stride, expressivity
        )
        if nxt <= checkpoint_index:
            # stride == expressivity makes the reference's checkpoint
            # recurrence stationary (an infinite loop there); stop once no
            # progress is made
            break
        checkpoint_index = nxt
    return subset


def _fixed_subset(word_index: int, tgt_len: int, stride: int,
                  expressivity: int, bidirectional: bool):
    absolute_max = tgt_len if bidirectional else word_index + 1
    rounded = math.floor((word_index + stride) / stride) * stride
    if word_index % stride == 0 and word_index != 0:
        subset_one = set(
            range(word_index - stride, min(absolute_max, word_index + 1))
        )
    else:
        subset_one = set(
            range(max(0, rounded - stride), min(absolute_max, rounded + 1))
        )
    subset_two = set()
    if not bidirectional:
        subset_two = _subset_summaries(absolute_max, stride, expressivity)
    return subset_one | subset_two


@functools.lru_cache(maxsize=32)
def sparse_fixed_mask(
    tgt_len: int,
    src_len: int,
    stride: int = 32,
    expressivity: int = 8,
    bidirectional: bool = True,
) -> np.ndarray:
    """(tgt_len, src_len) additive mask: 0 at attended positions, -inf
    elsewhere — bit-for-bit the reference ``buffered_sparse_mask``."""
    assert stride > 0 and stride >= expressivity
    if tgt_len <= stride:
        # the reference asserts tgt_len > stride; degrade to full (or
        # causal) attention for short sequences instead of erroring
        mask = np.zeros((tgt_len, src_len), np.float32)
        if not bidirectional:
            mask[np.triu_indices(tgt_len, k=1)] = NEG_INF
        return mask
    mask = np.full((tgt_len, src_len), NEG_INF, np.float32)
    summaries = (
        _subset_summaries(tgt_len, stride, expressivity)
        if bidirectional
        else set()
    )
    for i in range(tgt_len):
        keep = _fixed_subset(i, tgt_len, stride, expressivity, bidirectional)
        keep |= summaries
        cols = [c for c in keep if c < src_len]
        mask[i, cols] = 0.0
    return mask
