"""Corpus BLEU scorer, output-identical to the reference libbleu.

Semantics replicated from fairseq/clib/libbleu/libbleu.cpp + fairseq/bleu.py:
  * refs have unk replaced by -999 before counting ("don't match unknown
    words", bleu.py:86-88);
  * both sides are left-trimmed of pad and right-trimmed of trailing
    eos/pad (libbleu.cpp bleu_trim);
  * clipped n-gram matching for n=1..4 counts each predicted n-gram at most
    as many times as it appears in the ref (bleu_addngram);
  * BLEU = brevity * exp(mean log precision) * 100 with brevity =
    min(1, e^(1-r/p)) (bleu.py score/brevity);
  * ``reset(one_init=True)`` seeds counts 2-4 and matches 2-4 with 1 for
    sentence-level smoothed BLEU (libbleu bleu_one_init).

A C++ twin (native/) can be dropped in transparently; the arithmetic here is
integer counting, so outputs are bit-identical either way.
"""

from __future__ import annotations

import ctypes
import math
from collections import Counter
from typing import List, Sequence

import numpy as np


class BleuStat:
    __slots__ = (
        "reflen", "predlen",
        "match1", "count1", "match2", "count2",
        "match3", "count3", "match4", "count4",
    )

    def __init__(self):
        for f in self.__slots__:
            setattr(self, f, 0)


def _trim(sent: np.ndarray, pad: int, eos: int) -> np.ndarray:
    start = 0
    n = len(sent)
    while start < n and sent[start] == pad:
        start += 1
    sent = sent[start:]
    end = len(sent) - 1
    while end > 0 and (sent[end] == eos or sent[end] == pad):
        end -= 1
    return sent[: end + 1]


def _ngrams(tokens: Sequence[int], n: int) -> Counter:
    return Counter(
        tuple(tokens[i: i + n]) for i in range(len(tokens) - n + 1)
    )


class _CBleuStat(ctypes.Structure):
    _fields_ = [
        ("reflen", ctypes.c_size_t),
        ("predlen", ctypes.c_size_t),
        ("match1", ctypes.c_size_t),
        ("count1", ctypes.c_size_t),
        ("match2", ctypes.c_size_t),
        ("count2", ctypes.c_size_t),
        ("match3", ctypes.c_size_t),
        ("count3", ctypes.c_size_t),
        ("match4", ctypes.c_size_t),
        ("count4", ctypes.c_size_t),
    ]


def _load_native():
    try:
        from ..native import load_library

        return load_library("libbleu")
    except Exception:
        return None


class Scorer:
    """fairseq/bleu.py:62-140. Counting runs in the native C++ core
    (native/libbleu.cpp) when a toolchain is available, else the pure-Python
    twin below — both integer-exact, so outputs are identical."""

    def __init__(self, pad: int, eos: int, unk: int):
        self.pad = pad
        self.eos = eos
        self.unk = unk
        self._lib = _load_native()
        self.reset()

    def reset(self, one_init: bool = False) -> None:
        if self._lib is not None:
            self.stat = _CBleuStat()
            if one_init:
                self._lib.bleu_one_init(ctypes.byref(self.stat))
            else:
                self._lib.bleu_zero_init(ctypes.byref(self.stat))
            return
        self.stat = BleuStat()
        if one_init:
            for f in ("count2", "count3", "count4", "match2", "match3", "match4"):
                setattr(self.stat, f, 1)

    def add(self, ref, pred) -> None:
        ref = np.asarray(ref).reshape(-1).astype(np.int64)
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        assert not (ref < 0).any()
        ref = np.where(ref == self.unk, -999, ref)  # don't match unknowns

        if self._lib is not None:
            rref = np.ascontiguousarray(ref, dtype=np.int32)
            rpred = np.ascontiguousarray(pred, dtype=np.int32)
            self._lib.bleu_add(
                ctypes.byref(self.stat),
                ctypes.c_size_t(rref.size),
                rref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                ctypes.c_size_t(rpred.size),
                rpred.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                ctypes.c_int(self.pad),
                ctypes.c_int(self.eos),
            )
            return

        ref = _trim(ref, self.pad, self.eos)
        pred = _trim(pred, self.pad, self.eos)
        self.stat.reflen += len(ref)
        self.stat.predlen += len(pred)

        rl = [int(x) for x in ref]
        pl = [int(x) for x in pred]
        for n in range(1, 5):
            if len(pl) < n:
                continue
            total = len(pl) - n + 1
            setattr(
                self.stat, f"count{n}", getattr(self.stat, f"count{n}") + total
            )
            if len(rl) < n:
                continue
            pred_counts = _ngrams(pl, n)
            ref_counts = _ngrams(rl, n)
            match = sum(
                min(c, ref_counts[g]) for g, c in pred_counts.items()
            )
            setattr(
                self.stat, f"match{n}", getattr(self.stat, f"match{n}") + match
            )

    def precision(self) -> List[float]:
        def ratio(a, b):
            return a / b if b > 0 else 0

        return [
            ratio(self.stat.match1, self.stat.count1),
            ratio(self.stat.match2, self.stat.count2),
            ratio(self.stat.match3, self.stat.count3),
            ratio(self.stat.match4, self.stat.count4),
        ]

    def brevity(self) -> float:
        r = self.stat.reflen / self.stat.predlen
        return min(1, math.exp(1 - r))

    def score(self, order: int = 4) -> float:
        psum = sum(
            math.log(p) if p > 0 else float("-Inf")
            for p in self.precision()[:order]
        )
        return self.brevity() * math.exp(psum / order) * 100

    def result_string(self, order: int = 4) -> str:
        assert order <= 4, "BLEU scores for order > 4 aren't supported"
        fmt = "BLEU{} = {:2.2f}, {:2.1f}"
        for _ in range(1, order):
            fmt += "/{:2.1f}"
        fmt += " (BP={:.3f}, ratio={:.3f}, syslen={}, reflen={})"
        bleup = [p * 100 for p in self.precision()[:order]]
        return fmt.format(
            order,
            self.score(order=order),
            *bleup,
            self.brevity(),
            self.stat.predlen / self.stat.reflen,
            self.stat.predlen,
            self.stat.reflen,
        )


class SacrebleuScorer:
    """String-level corpus BLEU via sacrebleu (fairseq/bleu.py:36-59)."""

    def __init__(self):
        import sacrebleu

        self.sacrebleu = sacrebleu
        self.reset()

    def reset(self, one_init: bool = False):
        if one_init:
            raise NotImplementedError
        self.ref = []
        self.sys = []

    def add_string(self, ref: str, pred: str):
        self.ref.append(ref)
        self.sys.append(pred)

    def score(self, order: int = 4) -> float:
        return self.result_string(order).score

    def result_string(self, order: int = 4):
        if order != 4:
            raise NotImplementedError
        return self.sacrebleu.corpus_bleu(self.sys, [self.ref])
