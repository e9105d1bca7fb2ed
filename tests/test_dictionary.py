"""Dictionary behavior parity tests (reference tests/test_dictionary.py
pattern plus the special-symbol contract from fairseq/data/dictionary.py)."""

import io

import numpy as np

from fbk_fairseq_st_tpu.data import Dictionary


def test_special_symbol_ids():
    d = Dictionary()
    assert d.bos() == 0
    assert d.pad() == 1
    assert d.eos() == 2
    assert d.unk() == 3
    assert d.nspecial == 4
    assert d[0] == "<s>" and d[1] == "<pad>" and d[2] == "</s>" and d[3] == "<unk>"


def test_finalize_sorts_and_pads():
    d = Dictionary()
    # add symbols with different counts
    d.add_symbol("low", n=1)
    d.add_symbol("high", n=10)
    d.add_symbol("mid", n=5)
    d.finalize(padding_factor=8)
    # sorted by count desc after specials
    assert d.symbols[4:7] == ["high", "mid", "low"]
    assert len(d) % 8 == 0
    assert any(s.startswith("madeupword") for s in d.symbols)


def test_encode_decode_roundtrip():
    d = Dictionary()
    ids = d.encode_line("hello world hello", add_if_not_exist=True)
    assert ids[-1] == d.eos()
    assert len(ids) == 4
    assert ids[0] == ids[2]  # repeated token, same id
    s = d.string(ids)
    assert s == "hello world hello"


def test_encode_unknown_maps_to_unk():
    d = Dictionary()
    d.add_symbol("known")
    ids = d.encode_line("known unknown", add_if_not_exist=False)
    assert ids[0] == d.index("known")
    assert ids[1] == d.unk()


def test_save_load_roundtrip(tmp_path):
    d = Dictionary()
    for w, n in [("apple", 7), ("banana", 3)]:
        d.add_symbol(w, n=n)
    f = io.StringIO()
    d.save(f)
    f.seek(0)
    d2 = Dictionary.load(f)
    assert d2 == d
    assert d2.count[4:] == d.count[4:]


def test_string_skips_pad_and_eos():
    d = Dictionary()
    a = d.add_symbol("a")
    ids = np.array([a, d.pad(), a, d.eos()])
    assert d.string(ids) == "a a"


def test_sentencepiece_postprocess():
    d = Dictionary()
    toks = ["▁he", "llo", "▁wo", "rld"]
    ids = np.array([d.add_symbol(t) for t in toks])
    assert d.string(ids, bpe_symbol="sentencepiece") == "he llo wo rld".replace(
        " ", ""
    ) or d.string(ids, bpe_symbol="sentencepiece") == "hello world"
    assert d.string(ids, bpe_symbol="sentencepiece") == "hello world"
