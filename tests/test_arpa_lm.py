"""Native ARPA n-gram LM tests.

The reference can only do LM-fused lexicon decoding through the external
kenlm binding (w2l_decoder.py:112); here ARPA text models load natively.
Goldens: hand-computed Katz back-off chains on a small trigram model, and
an integration decode where the LM flips the beam ranking.
"""

import gzip
import math

import numpy as np
import pytest

from fbk_fairseq_st_tpu.generation.arpa_lm import (
    ArpaLanguageModel,
    ArpaWordLM,
    load_word_lm,
)
from fbk_fairseq_st_tpu.generation.ctc_decoder import CTCPrefixBeamDecoder, LexiconTrie

LN10 = math.log(10.0)

# A small but complete trigram model. Back-off weights are the third column;
# n-grams without one back off with weight 1 (log 0).
ARPA = """\
\\data\\
ngram 1=6
ngram 2=5
ngram 3=2

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.4\ta\t-0.3
-0.6\tb\t-0.2
-0.9\tc\t-0.1
-2.0\t<unk>

\\2-grams:
-0.30\t<s> a\t-0.20
-0.50\ta b\t-0.10
-0.70\tb c
-0.80\tb </s>
-0.25\ta a

\\3-grams:
-0.20\t<s> a b
-0.35\ta b c

\\end\\
"""


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    p = tmp_path_factory.mktemp("arpa") / "test.arpa"
    p.write_text(ARPA)
    return ArpaLanguageModel(str(p))


@pytest.mark.quick
def test_direct_ngram_hits(lm):
    # trigram listed: P(b | <s> a) = 10^-0.20
    assert lm.logprob(("<s>", "a"), "b") == pytest.approx(-0.20 * LN10)
    # bigram listed: P(a | <s>) = 10^-0.30
    assert lm.logprob(("<s>",), "a") == pytest.approx(-0.30 * LN10)
    # unigram listed
    assert lm.logprob((), "c") == pytest.approx(-0.9 * LN10)


@pytest.mark.quick
def test_backoff_chains(lm):
    # P(c | <s> a): trigram "<s> a c" missing -> b(<s> a) * P(c | a);
    # bigram "a c" missing too -> b(<s> a) * b(a) * P(c)
    want = (-0.20 + -0.3 + -0.9) * LN10
    assert lm.logprob(("<s>", "a"), "c") == pytest.approx(want)
    # P(c | a b): trigram "a b c" listed -> direct
    assert lm.logprob(("a", "b"), "c") == pytest.approx(-0.35 * LN10)
    # P(</s> | a b): trigram missing -> b(a b) * P(</s> | b) = -0.10 + -0.80
    assert lm.logprob(("a", "b"), "</s>") == pytest.approx((-0.10 - 0.80) * LN10)
    # unlisted back-off context contributes weight 1: P(b | c a) ->
    # "c a b" missing, b(c a) unlisted (=1) -> P(b | a) = -0.50
    assert lm.logprob(("c", "a"), "b") == pytest.approx(-0.50 * LN10)


@pytest.mark.quick
def test_oov_scores_as_unk(lm):
    assert lm.logprob(("<s>",), "zzz") == pytest.approx(lm.logprob(("<s>",), "<unk>"))
    # with back-off: "<s> <unk>" missing -> b(<s>) + p(<unk>)
    assert lm.logprob(("<s>",), "zzz") == pytest.approx((-0.5 - 2.0) * LN10)


@pytest.mark.quick
def test_oov_floor_without_unk(tmp_path):
    arpa = ARPA.replace("-2.0\t<unk>\n", "").replace("ngram 1=6", "ngram 1=5")
    p = tmp_path / "nounk.arpa"
    p.write_text(arpa)
    m = ArpaLanguageModel(str(p))
    assert not m.has_unk
    assert m.logprob((), "zzz") == m.oov_penalty
    assert np.isfinite(m.logprob((), "zzz"))


@pytest.mark.quick
def test_context_truncation_and_state(lm):
    # longer-than-order context scores like its (order-1)-suffix
    assert lm.logprob(("b", "c", "a"), "b") == pytest.approx(
        lm.logprob(("c", "a"), "b")
    )
    # state shortening drops prefixes that are not listed n-grams —
    # score-preserving because valid ARPA lists every n-gram's prefix
    assert lm.next_state(("c",), "a") == ("a",)  # "c a" unlisted
    assert lm.next_state(("<s>",), "a") == ("<s>", "a")  # listed bigram


@pytest.mark.quick
def test_sentence_score_matches_manual(lm):
    # <s> a b c </s>:
    #   P(a|<s>) = -0.30
    #   P(b|<s> a) = -0.20
    #   P(c|a b) = -0.35
    #   P(</s>|b c): trigram missing, b(b c)=1 -> P(</s>|c): "c </s>"
    #     missing, b(c) = -0.1 -> P(</s>) = -1.2 => -1.3
    want = (-0.30 - 0.20 - 0.35 - 1.3) * LN10
    assert lm.score_sentence(["a", "b", "c"]) == pytest.approx(want)


@pytest.mark.quick
def test_word_lm_interface_accumulates_like_score_sentence(lm):
    wlm = ArpaWordLM(lm)
    state = wlm.start()
    total = 0.0
    for w in ["a", "b", "c"]:
        state, lp = wlm.score(state, w)
        total += lp
    total += wlm.finish(state)
    assert total == pytest.approx(lm.score_sentence(["a", "b", "c"]))


@pytest.mark.quick
def test_gzip_and_loader_dispatch(tmp_path):
    gz = tmp_path / "test.arpa.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write(ARPA)
    wlm = load_word_lm(str(gz))
    assert isinstance(wlm, ArpaWordLM)
    assert wlm.model.order == 3
    # non-ARPA bytes dispatch to the kenlm-binary path (not installed here)
    binpath = tmp_path / "model.bin"
    binpath.write_bytes(b"mmap lm \x00\x01binary")
    with pytest.raises(ImportError):
        load_word_lm(str(binpath))


class _Dict:
    """Minimal dictionary stub for LexiconTrie."""

    def __init__(self, units):
        self.indices = {u: i for i, u in enumerate(units)}

    def index(self, u):
        return self.indices[u]


@pytest.mark.quick
def test_lm_flips_beam_ranking(tmp_path):
    """Acoustically ambiguous emissions: the LM prior must decide.

    Units: blank=0, 'x'=1, 'y'=2, '|'=3 (word boundary). Lexicon: "ax" -> x |
    and "ay" -> y |. Emissions slightly favour y; an LM strongly preferring
    "ax" must flip the decode, and with the preference removed the acoustic
    winner must return.
    """
    arpa = """\
\\data\\
ngram 1=4

\\1-grams:
-99\t<s>
-0.5\t</s>
-0.05\tax
-5.0\tay

\\end\\
"""
    p = tmp_path / "lex.arpa"
    p.write_text(arpa)
    d = _Dict(["<blank>", "x", "y", "|"])
    trie = LexiconTrie()
    trie.insert([d.index("x")], "ax")
    trie.insert([d.index("y")], "ay")

    logits = np.full((4, 4), -5.0)
    logits[0, 1], logits[0, 2] = 2.0, 2.4  # y slightly ahead
    logits[1, 1], logits[1, 2] = 2.0, 2.4
    logits[2, 3] = 4.0
    logits[3, 0] = 4.0
    emissions = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    dec_lm = CTCPrefixBeamDecoder(
        blank=0, beam_size=8, trie=trie, lm=ArpaWordLM(str(p)),
        lm_weight=2.0, word_score=0.0, word_boundary=d.index("|"),
    )
    hyp = dec_lm.decode(emissions)[0]
    assert list(hyp["words"]) == ["ax"]

    dec_ac = CTCPrefixBeamDecoder(
        blank=0, beam_size=8, trie=trie, lm=None,
        lm_weight=0.0, word_score=0.0, word_boundary=d.index("|"),
    )
    hyp = dec_ac.decode(emissions)[0]
    assert list(hyp["words"]) == ["ay"]
