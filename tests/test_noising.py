"""Word-level noising + backtranslation dataset (reference
tests/test_noising.py role)."""

import numpy as np

from fbk_fairseq_st_tpu.data.dictionary import Dictionary
from fbk_fairseq_st_tpu.data.noising import (
    BacktranslationDataset,
    NoisingDataset,
    UnsupervisedMTNoising,
    WordDropout,
    WordNoising,
    WordShuffle,
)


def bpe_dictionary():
    d = Dictionary()
    for w in ["how", "are", "y@@", "ou", "hello", "wor@@", "ld"]:
        d.add_symbol(w)
    d.finalize(padding_factor=1)
    return d


def ids(d, words):
    return np.array([d.index(w) for w in words], dtype=np.int64)


def test_bpe_word_ids():
    d = bpe_dictionary()
    n = WordNoising(d)
    x = ids(d, ["how", "are", "y@@", "ou"])
    assert n.word_ids(x).tolist() == [0, 1, 2, 2]
    x = ids(d, ["wor@@", "ld", "hello"])
    assert n.word_ids(x).tolist() == [0, 0, 1]


def test_word_ids_no_bpe():
    d = bpe_dictionary()
    n = WordNoising(d, bpe_cont_marker=None)
    x = ids(d, ["how", "are", "y@@", "ou"])
    assert n.word_ids(x).tolist() == [0, 1, 2, 3]


def test_word_dropout_keeps_eos_and_whole_words():
    d = bpe_dictionary()
    drop = WordDropout(d)
    x = np.concatenate([ids(d, ["how", "are", "y@@", "ou"]), [d.eos()]])
    for seed in range(20):
        out = drop.noising(x, np.random.RandomState(seed), dropout_prob=0.5)
        assert out[-1] == d.eos()
        assert len(out) >= 2
        # BPE halves dropped together: y@@ present iff ou present
        has_y = d.index("y@@") in out
        has_ou = d.index("ou") in out
        assert has_y == has_ou


def test_word_blanking():
    d = bpe_dictionary()
    drop = WordDropout(d)
    x = np.concatenate([ids(d, ["how", "are", "y@@", "ou"]), [d.eos()]])
    out = drop.noising(
        x, np.random.RandomState(3), dropout_prob=0.5, blank_idx=d.unk()
    )
    assert len(out) == len(x)  # blanking replaces, never removes
    assert out[-1] == d.eos()
    changed = out != x
    assert np.all(out[changed] == d.unk())


def test_word_shuffle_bounded_distance():
    d = bpe_dictionary()
    shuf = WordShuffle(d)
    x = np.concatenate(
        [ids(d, ["how", "are", "hello", "ld", "ou"]), [d.eos()]]
    )
    for seed in range(20):
        out = shuf.noising(x, np.random.RandomState(seed), 3)
        assert out[-1] == d.eos()
        assert sorted(out.tolist()) == sorted(x.tolist())  # permutation
        # each word moved < max_shuffle_distance forward
        for pos, tok in enumerate(x[:-1]):
            new_pos = int(np.where(out == tok)[0][0])
            assert new_pos - pos < 3


def test_word_shuffle_keeps_word_intact():
    d = bpe_dictionary()
    shuf = WordShuffle(d)
    x = np.concatenate([ids(d, ["how", "y@@", "ou", "are"]), [d.eos()]])
    for seed in range(20):
        out = shuf.noising(x, np.random.RandomState(seed), 3).tolist()
        iy = out.index(d.index("y@@"))
        assert out[iy + 1] == d.index("ou")


def test_unsupervised_mt_noising_and_dataset_determinism():
    d = bpe_dictionary()

    class Src:
        def __init__(self):
            self.items = [
                np.concatenate([ids(d, ["how", "are", "y@@", "ou"]), [d.eos()]]),
                np.concatenate([ids(d, ["hello", "wor@@", "ld"]), [d.eos()]]),
            ]

        def __getitem__(self, i):
            return self.items[i]

        def __len__(self):
            return len(self.items)

        def num_tokens(self, i):
            return len(self.items[i])

        def size(self, i):
            return len(self.items[i])

        @property
        def sizes(self):
            return np.array([len(x) for x in self.items])

        def ordered_indices(self):
            return np.arange(len(self.items))

    ds = NoisingDataset(
        Src(), d, seed=7,
        max_word_shuffle_distance=3,
        word_dropout_prob=0.2,
        word_blanking_prob=0.2,
    )
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a, b)  # seeded per index
    assert ds[1][-1] == d.eos()
    assert len(ds) == 2


def test_backtranslation_dataset():
    from fbk_fairseq_st_tpu.data.language_pair_dataset import (
        LanguagePairDataset,
    )

    d = bpe_dictionary()
    items = [
        np.concatenate([ids(d, ["how", "are"]), [d.eos()]]),
        np.concatenate([ids(d, ["hello"]), [d.eos()]]),
    ]

    class L:
        def __getitem__(self, i):
            return items[i]

        def __len__(self):
            return len(items)

    sizes = [len(x) for x in items]
    tgt_ds = LanguagePairDataset(L(), sizes, d, shuffle=False)

    def fake_backtranslate(batch):
        # reverse each source as the "generated" backtranslation, batch
        # order = collater order (descending source length)
        hyp = []
        for row, n in zip(
            np.asarray(batch["net_input"]["src_tokens"]),
            np.asarray(batch["net_input"]["src_lengths"]),
        ):
            toks = row[-n:]  # left-padded sources
            hyp.append([{"tokens": toks[::-1].copy(), "score": 0.0}])
        return hyp

    bt = BacktranslationDataset(
        tgt_ds, d, backtranslation_fn=fake_backtranslate
    )
    assert bt.size(0) == (3, 3)
    batch = bt.collater([bt[0], bt[1]])
    # longer sentence sorts first; its source is the reversed original
    src = np.asarray(batch["net_input"]["src_tokens"])[0]
    src = src[src != d.pad()]
    np.testing.assert_array_equal(src, items[0][::-1])
    tgt = np.asarray(batch["target"])[0]
    np.testing.assert_array_equal(tgt[: len(items[0])], items[0])
