"""Native C++ components: build, load, and cross-check against the Python
twins (bit-identical counting)."""

import ctypes
import random

import numpy as np
import pytest

from fbk_fairseq_st_tpu.native import load_library
from fbk_fairseq_st_tpu.scoring import bleu


def test_native_libbleu_builds_and_matches_python():
    lib = load_library("libbleu")
    if lib is None:
        pytest.skip("no C++ toolchain")

    rng = random.Random(0)
    native = bleu.Scorer(1, 2, 3)
    assert native._lib is not None
    python = bleu.Scorer(1, 2, 3)
    python._lib = None
    python.reset()

    for _ in range(30):
        n_ref = rng.randint(1, 12)
        n_pred = rng.randint(1, 12)
        ref = [rng.randint(3, 10) for _ in range(n_ref)] + [2]
        pred = [rng.randint(3, 10) for _ in range(n_pred)] + [2]
        native.add(np.array(ref, np.int32), np.array(pred, np.int32))
        python.add(np.array(ref, np.int32), np.array(pred, np.int32))

    for f in ("reflen", "predlen", "match1", "count1", "match4", "count4"):
        assert getattr(native.stat, f) == getattr(python.stat, f), f
    assert abs(native.score() - python.score()) < 1e-12
    assert native.result_string() == python.result_string()


def test_native_edit_distance_matches_ops():
    lib = load_library("edit_dist")
    if lib is None:
        pytest.skip("no C++ toolchain")

    def ref_lev(a, b):
        d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            d[i][0] = i
        for j in range(len(b) + 1):
            d[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    rng = random.Random(1)
    for _ in range(25):
        a = [rng.randint(0, 5) for _ in range(rng.randint(0, 10))]
        b = [rng.randint(0, 5) for _ in range(rng.randint(0, 10))]
        ca = (ctypes.c_int * max(len(a), 1))(*(a or [0]))
        cb = (ctypes.c_int * max(len(b), 1))(*(b or [0]))
        got = lib.edit_distance(ca, len(a), cb, len(b))
        assert got == ref_lev(a, b), (a, b)

    # batch API
    bsz, ta, tb = 4, 6, 5
    a = np.zeros((bsz, ta), np.int32)
    b = np.zeros((bsz, tb), np.int32)
    a_lens = np.zeros((bsz,), np.int32)
    b_lens = np.zeros((bsz,), np.int32)
    rows = []
    for i in range(bsz):
        la, lb = rng.randint(0, ta), rng.randint(0, tb)
        ra = [rng.randint(0, 4) for _ in range(la)]
        rb = [rng.randint(0, 4) for _ in range(lb)]
        a[i, :la] = ra
        b[i, :lb] = rb
        a_lens[i], b_lens[i] = la, lb
        rows.append(ref_lev(ra, rb))
    out = np.zeros((bsz,), np.int32)
    lib.edit_distance_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        a_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bsz, ta, tb,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    np.testing.assert_array_equal(out, rows)

    # path backtracking: ops counts must reproduce the distance
    a1 = [1, 2, 3, 4]
    b1 = [1, 3, 5]
    ops = (ctypes.c_int * (len(a1) + len(b1)))()
    n = lib.suggested_path(
        (ctypes.c_int * len(a1))(*a1), len(a1),
        (ctypes.c_int * len(b1))(*b1), len(b1), ops,
    )
    path = [ops[i] for i in range(n)]
    # replaying the path transforms a into b
    cost = 0
    ai = bi = 0
    for op in path:
        if op == 0:
            cost += int(a1[ai] != b1[bi])
            ai += 1
            bi += 1
        elif op == 1:
            cost += 1
            bi += 1
        else:
            cost += 1
            ai += 1
    assert ai == len(a1) and bi == len(b1)
    assert cost == ref_lev(a1, b1)
