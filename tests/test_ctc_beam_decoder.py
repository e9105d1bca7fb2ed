"""CTC prefix beam search decoder tests (replaces the reference's external
wav2letter decoders, w2l_decoder.py:84-167, with a native implementation).

Golden checks: (a) hand-computed prefix-beam example; (b) exact-marginal
brute force over all label sequences on tiny inputs; (c) lexicon constraint;
(d) word-LM rescoring."""

import itertools
import math

import numpy as np
import pytest

from fbk_fairseq_st_tpu.generation.ctc_decoder import (
    CallableWordLM,
    CTCPrefixBeamDecoder,
    LexiconTrie,
    ctc_beam_decode_batch,
)

BLANK = 0


def _log_softmax(x):
    x = np.asarray(x, np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def _exact_ctc_logprob(log_probs, labels):
    """Sum over all alignments of ``labels`` (forward algorithm)."""
    T, V = log_probs.shape
    ext = [BLANK]
    for l in labels:
        ext += [l, BLANK]
    S = len(ext)
    alpha = np.full((T, S), -np.inf)
    alpha[0, 0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[0, 1] = log_probs[0, ext[1]]
    for t in range(1, T):
        for s in range(S):
            cands = [alpha[t - 1, s]]
            if s > 0:
                cands.append(alpha[t - 1, s - 1])
            if s > 1 and ext[s] != BLANK and ext[s] != ext[s - 2]:
                cands.append(alpha[t - 1, s - 2])
            alpha[t, s] = np.logaddexp.reduce(cands) + log_probs[t, ext[s]]
    finals = [alpha[T - 1, S - 1]]
    if S > 1:
        finals.append(alpha[T - 1, S - 2])
    return float(np.logaddexp.reduce(finals))


def test_hand_computed_two_frames():
    """T=2, V=3 (blank, a, b) with uniform-ish probs: verify the winning
    prefix's summed-alignment probability by hand."""
    p = np.log(
        np.array(
            [
                [0.2, 0.7, 0.1],  # frame 0 favors 'a'
                [0.3, 0.6, 0.1],  # frame 1 favors 'a'
            ]
        )
    )
    dec = CTCPrefixBeamDecoder(blank=BLANK, beam_size=16)
    hypos = dec.decode(p, n_best=3)
    # P(a) = a,a + a,- + -,a = .7*.6 + .7*.3 + .2*.6 = 0.75
    assert hypos[0]["tokens"].tolist() == [1]
    assert hypos[0]["score"] == pytest.approx(math.log(0.75), abs=1e-6)
    # P(aa) = a,a needs a blank between; impossible in 2 frames = 0
    # P(ab) = .7*.1 = 0.07 ; P(empty) = .2*.3 = 0.06
    assert hypos[1]["tokens"].tolist() == [1, 2]
    assert hypos[1]["score"] == pytest.approx(math.log(0.07), abs=1e-6)
    assert hypos[2]["tokens"].tolist() == []
    assert hypos[2]["score"] == pytest.approx(math.log(0.06), abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_exact_marginal_brute_force(seed):
    """With a full-width beam, the decoder's ranking and scores equal the
    exact per-labeling CTC marginals on tiny inputs."""
    rng = np.random.RandomState(seed)
    T, V = 5, 4
    lp = _log_softmax(rng.randn(T, V) * 2)
    dec = CTCPrefixBeamDecoder(blank=BLANK, beam_size=4096)
    hypos = dec.decode(lp, n_best=5)

    exact = {}
    for L in range(0, T + 1):
        for labels in itertools.product(range(1, V), repeat=L):
            # skip labelings that cannot fit (repeats need a blank)
            need = L + sum(
                1 for i in range(1, L) if labels[i] == labels[i - 1]
            )
            if need > T:
                continue
            exact[labels] = _exact_ctc_logprob(lp, labels)
    ranked = sorted(exact.items(), key=lambda kv: kv[1], reverse=True)
    for h, (labels, logp) in zip(hypos, ranked[:5]):
        assert tuple(h["tokens"].tolist()) == labels
        assert h["score"] == pytest.approx(logp, abs=1e-5)


def test_beam_vs_greedy_on_classic_example():
    """The classic case where best-path (greedy) and prefix beam differ:
    greedy picks blank; the summed mass of 'a' wins under prefix search."""
    p = np.log(
        np.array(
            [
                [0.4, 0.35, 0.25],
                [0.4, 0.35, 0.25],
            ]
        )
    )
    # greedy path: blank, blank -> empty
    assert p[0].argmax() == BLANK
    dec = CTCPrefixBeamDecoder(blank=BLANK, beam_size=8)
    hypos = dec.decode(p)
    # P(a) = .35*.35 + .35*.4 + .4*.35 = 0.4025 > P(empty)=0.16
    assert hypos[0]["tokens"].tolist() == [1]


def test_lexicon_constrained_decode():
    """Only lexicon words (unit paths in the trie) may be produced; the
    word-boundary unit closes a word."""
    # units: 0=blank, 1=a, 2=b, 3=c, 4=| (boundary)
    trie = LexiconTrie()
    trie.insert([1, 2], "ab")
    trie.insert([3, 2], "cb")
    # emissions strongly favor "a b |"
    logits = np.full((4, 5), -5.0)
    logits[0, 1] = 5.0
    logits[1, 2] = 5.0
    logits[2, 4] = 5.0
    logits[3, 0] = 5.0
    lp = _log_softmax(logits)
    dec = CTCPrefixBeamDecoder(
        blank=BLANK, beam_size=16, trie=trie, word_boundary=4, word_score=0.0
    )
    hypos = dec.decode(lp)
    assert hypos[0]["tokens"].tolist() == [1, 2, 4]
    assert hypos[0]["words"] == ["ab"]

    # an emission favoring a non-lexicon sequence (b a) cannot produce it
    logits2 = np.full((3, 5), -5.0)
    logits2[0, 2] = 5.0
    logits2[1, 1] = 5.0
    logits2[2, 4] = 5.0
    hypos2 = dec.decode(_log_softmax(logits2))
    produced = hypos2[0]["tokens"].tolist() if hypos2 else []
    assert produced != [2, 1, 4]


def test_word_lm_rescores_ambiguous_words():
    """Two lexicon words with near-equal acoustics: the LM decides."""
    trie = LexiconTrie()
    trie.insert([1, 2], "ab")
    trie.insert([3, 2], "cb")
    # acoustically 'a' and 'c' are nearly tied (slightly favor 'a')
    logits = np.full((3, 5), -5.0)
    logits[0, 1] = 3.0
    logits[0, 3] = 2.9
    logits[1, 2] = 5.0
    logits[2, 4] = 5.0
    lp = _log_softmax(logits)

    lm = CallableWordLM(lambda hist, w: 0.0 if w == "cb" else -10.0)
    dec = CTCPrefixBeamDecoder(
        blank=BLANK, beam_size=16, trie=trie, word_boundary=4,
        lm=lm, lm_weight=1.0, word_score=0.0,
    )
    hypos = dec.decode(lp)
    assert hypos[0]["words"] == ["cb"]

    # without the LM, acoustics win
    dec2 = CTCPrefixBeamDecoder(
        blank=BLANK, beam_size=16, trie=trie, word_boundary=4, word_score=0.0
    )
    assert dec2.decode(lp)[0]["words"] == ["ab"]


def test_batch_helper_and_length_masking():
    rng = np.random.RandomState(0)
    lp = _log_softmax(rng.randn(2, 6, 4))
    dec = CTCPrefixBeamDecoder(blank=BLANK, beam_size=64)
    out = ctc_beam_decode_batch(lp, np.array([6, 3]), dec)
    # the short utterance must equal decoding its trimmed emissions
    solo = dec.decode(lp[1, :3])
    assert out[1][0]["tokens"].tolist() == solo[0]["tokens"].tolist()
    assert out[1][0]["score"] == pytest.approx(solo[0]["score"])


def test_token_top_k_pruning_keeps_winner():
    rng = np.random.RandomState(3)
    lp = _log_softmax(rng.randn(5, 8) * 3)
    full = CTCPrefixBeamDecoder(blank=BLANK, beam_size=64).decode(lp)
    pruned = CTCPrefixBeamDecoder(
        blank=BLANK, beam_size=64, token_top_k=4
    ).decode(lp)
    assert pruned[0]["tokens"].tolist() == full[0]["tokens"].tolist()


def test_lexicon_rejects_oov_units(tmp_path):
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    d.add_symbol("a")
    lex = tmp_path / "lex.txt"
    lex.write_text("word\ta zz\n")
    with pytest.raises(ValueError, match="zz"):
        LexiconTrie.from_lexicon_file(str(lex), d)


def test_final_word_completes_without_trailing_boundary():
    """A hypothesis ending exactly at a word end (no trailing '|') must
    still record and score the word."""
    trie = LexiconTrie()
    trie.insert([1, 2], "ab")
    logits = np.full((3, 5), -5.0)
    logits[0, 1] = 5.0
    logits[1, 2] = 5.0
    logits[2, 0] = 5.0  # blank, no boundary emitted
    lp = _log_softmax(logits)
    dec = CTCPrefixBeamDecoder(
        blank=BLANK, beam_size=16, trie=trie, word_boundary=4, word_score=0.0
    )
    hypos = dec.decode(lp)
    assert hypos[0]["tokens"].tolist() == [1, 2]
    assert hypos[0]["words"] == ["ab"]


# ---------------------------------------------------------------------------
# ASG beam search
# ---------------------------------------------------------------------------


def test_asg_beam_matches_viterbi_brute_force():
    """Unconstrained ASG beam with full width == exhaustive best path
    (emissions + transitions, max semiring)."""
    from fbk_fairseq_st_tpu.generation.ctc_decoder import ASGBeamDecoder

    rng = np.random.RandomState(2)
    T, V = 5, 3
    em = rng.randn(T, V).astype(np.float32)
    trans = (rng.randn(V, V) * 0.5).astype(np.float32)

    best, best_score = None, -np.inf
    for path in itertools.product(range(V), repeat=T):
        s = em[0, path[0]]
        for t in range(1, T):
            s += em[t, path[t]] + trans[path[t], path[t - 1]]
        if s > best_score:
            best_score = s
            # collapse repeats: ASG output tokens are the run labels
            best = tuple(
                tok for j, tok in enumerate(path)
                if j == 0 or tok != path[j - 1]
            )
    dec = ASGBeamDecoder(trans, beam_size=4096)
    hypos = dec.decode(em)
    assert tuple(hypos[0]["tokens"].tolist()) == best
    assert hypos[0]["score"] == pytest.approx(best_score, abs=1e-5)


def test_asg_beam_lexicon_and_lm():
    from fbk_fairseq_st_tpu.generation.ctc_decoder import ASGBeamDecoder

    V = 5  # 1=a 2=b 3=c 4=| (no blank in ASG)
    trie = LexiconTrie()
    trie.insert([1, 2], "ab")
    trie.insert([3, 2], "cb")
    trans = np.zeros((V, V), np.float32)
    em = np.full((3, V), -5.0, np.float32)
    em[0, 1] = 3.0
    em[0, 3] = 2.9  # near-tie between a and c
    em[1, 2] = 5.0
    em[2, 4] = 5.0

    dec = ASGBeamDecoder(
        trans, beam_size=16, trie=trie, word_boundary=4, word_score=0.0
    )
    out = dec.decode(em)
    assert out[0]["words"] == ["ab"]  # acoustics win without an LM
    assert out[0]["tokens"].tolist() == [1, 2, 4]

    lm = CallableWordLM(lambda hist, w: 0.0 if w == "cb" else -10.0)
    dec_lm = ASGBeamDecoder(
        trans, beam_size=16, trie=trie, word_boundary=4,
        lm=lm, lm_weight=1.0, word_score=0.0,
    )
    assert dec_lm.decode(em)[0]["words"] == ["cb"]


def test_asg_beam_transitions_steer_the_path():
    """Transitions must influence decoding: boost 1->2 so the beam prefers
    extending over staying despite equal emissions."""
    from fbk_fairseq_st_tpu.generation.ctc_decoder import ASGBeamDecoder

    V = 3
    em = np.zeros((2, V), np.float32)  # all emissions equal
    trans = np.zeros((V, V), np.float32)
    trans[2, 1] = 5.0  # strong 1 -> 2
    dec = ASGBeamDecoder(trans, beam_size=64)
    hypos = dec.decode(em, n_best=3)
    assert hypos[0]["tokens"].tolist() == [1, 2]
