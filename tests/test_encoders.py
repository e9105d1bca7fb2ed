"""Tokenizer/BPE registry sweep: every registered encoder either round-trips
text or degrades to the documented ImportError (optional deps are gated at
build time, like the reference's encoders/).

HF-backed encoders run with HF_HUB_OFFLINE so a no-egress environment gets
the gating path deterministically instead of a network stall.
"""

import argparse
import os

import pytest

from fbk_fairseq_st_tpu.data.encoders import build_bpe, build_tokenizer
from fbk_fairseq_st_tpu.registry import BPES, TOKENIZERS

SENT = "Hello world , this is a test !"

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def _args(**kw):
    return argparse.Namespace(**kw)


def _build_or_gate(builder, args):
    """Build the encoder, or return None when its optional dependency is
    absent — asserting the error is the documented, actionable kind."""
    try:
        return builder(args)
    except ImportError as e:
        msg = str(e).lower()
        assert "install" in msg or "unavailable" in msg, msg
        return None


# -- tokenizers ---------------------------------------------------------------

def test_tokenizer_registry_complete():
    assert set(TOKENIZERS._entries) == {"space", "moses", "nltk"}


@pytest.mark.parametrize("name", ["space", "moses", "nltk"])
def test_tokenizer_roundtrip_or_gated(name):
    tok = _build_or_gate(build_tokenizer, _args(tokenizer=name))
    if tok is None:
        return
    try:
        enc = tok.encode(SENT)
    except LookupError:
        # nltk's tokenizer data (punkt) isn't downloaded in this
        # environment — the library gate passed, the data gate didn't;
        # same surfacing point as the reference
        pytest.skip("nltk data not installed")
    assert isinstance(enc, str) and enc
    dec = tok.decode(enc)
    assert "Hello" in dec and "world" in dec


# -- BPE schemes ---------------------------------------------------------------

def test_bpe_registry_complete():
    assert set(BPES._entries) == {
        "bytes", "characters", "sentencepiece", "subword_nmt",
        "gpt2", "bert", "fastbpe", "byte_bpe", "hf_byte_bpe",
    }


def test_bytes_and_characters_roundtrip():
    for name in ("bytes", "characters"):
        bpe = build_bpe(_args(bpe=name))
        enc = bpe.encode(SENT)
        assert bpe.decode(enc) == SENT, name


def test_sentencepiece_roundtrip_or_gated(tmp_path):
    try:
        import sentencepiece as spm
    except ImportError:
        assert _build_or_gate(
            build_bpe, _args(bpe="sentencepiece", sentencepiece_model="x")
        ) is None
        return
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "\n".join(["hello world this is a test"] * 20
                  + ["another line of text here"] * 20)
    )
    spm.SentencePieceTrainer.Train(
        f"--input={corpus} --model_prefix={tmp_path}/m --vocab_size=40"
        " --model_type=bpe"
    )
    bpe = build_bpe(_args(
        bpe="sentencepiece", sentencepiece_model=str(tmp_path / "m.model")
    ))
    enc = bpe.encode("hello world")
    assert " " in enc or enc  # pieces joined by spaces
    assert bpe.decode(enc) == "hello world"


def test_subword_nmt_roundtrip_or_gated(tmp_path):
    try:
        from subword_nmt import learn_bpe
    except ImportError:
        # constructor opens bpe_codes before the import in some versions;
        # provide a real file so the gate we hit is the documented one
        codes = tmp_path / "codes"
        codes.write_text("#version: 0.2\n")
        assert _build_or_gate(
            build_bpe, _args(bpe="subword_nmt", bpe_codes=str(codes))
        ) is None
        return
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["hello world this is a test"] * 50))
    codes = tmp_path / "codes"
    with open(corpus) as fin, open(codes, "w") as fout:
        learn_bpe.learn_bpe(fin, fout, num_symbols=30)
    bpe = build_bpe(_args(bpe="subword_nmt", bpe_codes=str(codes)))
    enc = bpe.encode("hello world")
    assert bpe.decode(enc) == "hello world"


@pytest.mark.parametrize("name", ["gpt2", "bert", "fastbpe", "hf_byte_bpe"])
def test_network_or_binary_bpes_gate_cleanly(tmp_path, name):
    """gpt2/bert/hf_byte_bpe need downloaded vocabs (offline here ->
    gated); fastBPE needs the external binary lib. Whatever the
    environment provides, build must either work or raise the documented
    ImportError."""
    kw = {"bpe": name}
    if name == "fastbpe":
        codes = tmp_path / "codes"
        codes.write_text("h e 1\n")
        kw["bpe_codes"] = str(codes)
    if name == "hf_byte_bpe":
        try:
            from tokenizers import ByteLevelBPETokenizer
        except ImportError:
            kw["bpe_vocab"] = str(tmp_path / "vocab.json")
            kw["bpe_merges"] = str(tmp_path / "merges.txt")
        else:  # train a real tiny byte-level vocab to round-trip
            corpus = tmp_path / "corpus.txt"
            corpus.write_text("\n".join(["hello world"] * 50))
            trainer = ByteLevelBPETokenizer()
            trainer.train([str(corpus)], vocab_size=300, min_frequency=1)
            trainer.save_model(str(tmp_path))
            kw["bpe_vocab"] = str(tmp_path / "vocab.json")
            kw["bpe_merges"] = str(tmp_path / "merges.txt")
    bpe = _build_or_gate(build_bpe, _args(**kw))
    if bpe is not None:
        enc = bpe.encode("hello world")
        assert isinstance(enc, str)
        assert "hello" in bpe.decode(enc).lower()


def test_byte_bpe_roundtrip_or_gated(tmp_path):
    """byte_bpe = sentencepiece over byte text (reference
    encoders/byte_bpe.py)."""
    try:
        import sentencepiece as spm
    except ImportError:
        assert _build_or_gate(
            build_bpe,
            _args(bpe="byte_bpe", sentencepiece_model_path="x"),
        ) is None
        return
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["hello world this is a test"] * 40))
    spm.SentencePieceTrainer.Train(
        f"--input={corpus} --model_prefix={tmp_path}/m --vocab_size=40"
        " --model_type=bpe"
    )
    bpe = build_bpe(_args(
        bpe="byte_bpe",
        sentencepiece_model_path=str(tmp_path / "m.model"),
    ))
    enc = bpe.encode("hello world")
    assert isinstance(enc, str) and enc
    assert "hello" in bpe.decode(enc)
