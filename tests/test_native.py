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


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_batch_by_size_matches_python(seed):
    """The C++ packer and the Python twin must produce IDENTICAL batch
    compositions for any (max_tokens, max_sentences, bsz_mult) draw —
    batch boundaries feed training curves, so this is a correctness
    surface, not a perf nicety."""
    from fbk_fairseq_st_tpu.data.batching import batch_by_size
    from fbk_fairseq_st_tpu.native import load_library

    if load_library("batching") is None:
        pytest.skip("no C++ toolchain")

    rng = np.random.RandomState(seed)
    for _ in range(25):
        n = int(rng.randint(0, 400))
        lens = rng.randint(1, 60, size=n).astype(np.int64)
        indices = rng.permutation(n + 10)[:n].astype(np.int64)
        max_tokens = int(rng.choice([-1, 64, 100, 300, 1000]))
        if max_tokens > 0:
            lens = np.minimum(lens, max_tokens)
        max_sentences = int(rng.choice([-1, 1, 3, 8]))
        bsz_mult = int(rng.choice([1, 2, 8]))
        via_vec = batch_by_size(
            indices, lens, max_tokens, max_sentences, bsz_mult
        )
        by_idx = {int(i): int(t) for i, t in zip(indices, lens)}
        via_fn = batch_by_size(
            indices, lambda i: by_idx[i], max_tokens, max_sentences, bsz_mult
        )
        assert via_vec == via_fn, (
            seed, n, max_tokens, max_sentences, bsz_mult
        )


def test_native_batch_by_size_oversize_raises_like_python():
    from fbk_fairseq_st_tpu.data.batching import batch_by_size
    from fbk_fairseq_st_tpu.native import load_library

    if load_library("batching") is None:
        pytest.skip("no C++ toolchain")

    lens = np.array([5, 9, 200, 3], np.int64)
    indices = np.array([10, 11, 12, 13], np.int64)
    with pytest.raises(AssertionError, match="index 12 of size 200"):
        batch_by_size(indices, lens, max_tokens=100)
    with pytest.raises(AssertionError, match="exceeds max_tokens"):
        batch_by_size(
            indices, lambda i: int(lens[i - 10]), max_tokens=100
        )


def test_dataset_num_tokens_vec_matches_scalar():
    """Default num_tokens_vec (base Dataset) and the LanguagePairDataset
    override must agree with per-index num_tokens."""
    from fbk_fairseq_st_tpu.data.language_pair_dataset import (
        LanguagePairDataset,
    )

    class _Toy:
        def __init__(self, sizes):
            self.sizes = np.asarray(sizes)

        def __len__(self):
            return len(self.sizes)

        def __getitem__(self, i):
            return np.arange(self.sizes[i])

    src = _Toy([4, 7, 2, 9, 5])
    tgt = _Toy([6, 3, 8, 1, 5])
    ds = LanguagePairDataset.__new__(LanguagePairDataset)
    ds.src_sizes = src.sizes
    ds.tgt_sizes = tgt.sizes
    idx = np.array([3, 0, 4, 1], np.int64)
    got = ds.num_tokens_vec(idx)
    want = [ds.num_tokens(int(i)) for i in idx]
    np.testing.assert_array_equal(got, want)


def test_native_token_block_complete_matches_python(monkeypatch):
    from fbk_fairseq_st_tpu.data import monolingual
    from fbk_fairseq_st_tpu.native import load_library

    if load_library("batching") is None:
        pytest.skip("no C++ toolchain")

    rng = np.random.RandomState(7)
    for _ in range(20):
        n = int(rng.randint(0, 300))
        sizes = rng.randint(1, 40, size=n).astype(np.int64)
        block = int(rng.choice([16, 64, 1, 37]))
        native = monolingual._complete_blocks(sizes, block)
        with monkeypatch.context() as m:
            m.setattr(
                "fbk_fairseq_st_tpu.native.build.load_library",
                lambda name: None,
            )
            python = monolingual._complete_blocks(sizes, block)
        np.testing.assert_array_equal(
            native.reshape(-1, 2), python.reshape(-1, 2)
        )


def test_filter_by_size_vec_matches_loop():
    from fbk_fairseq_st_tpu.data.batching import (
        filter_by_size,
        filter_by_size_vec,
    )

    rng = np.random.RandomState(3)
    for _ in range(20):
        n = int(rng.randint(1, 200))
        src = rng.randint(1, 50, size=n).astype(np.int64)
        tgt = rng.randint(1, 50, size=n).astype(np.int64)
        indices = rng.permutation(n).astype(np.int64)
        for max_positions in (30, (30, 40), (None, 25), (30,)):
            kept_v, ign_v = filter_by_size_vec(indices, src, tgt,
                                               max_positions)
            kept_l, ign_l = filter_by_size(
                indices, lambda i: (int(src[i]), int(tgt[i])),
                max_positions)
            np.testing.assert_array_equal(kept_v, kept_l)
            assert sorted(ign_v) == sorted(ign_l)
        # no-target datasets
        kept_v, _ = filter_by_size_vec(indices, src, None, 30)
        kept_l, _ = filter_by_size(indices, lambda i: int(src[i]), 30)
        np.testing.assert_array_equal(kept_v, kept_l)
