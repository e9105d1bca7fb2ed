"""Offline tooling (reference scripts/count_docs, shard_docs,
split_train_valid_docs, rm_pt, compare_namespaces, extract_phonemes)."""

import json
import os
import pickle

import pytest

from fbk_fairseq_st_tpu.scripts import doc_tools


def _write_docs(path, docs):
    with open(path, "w") as f:
        for i, doc in enumerate(docs):
            if i:
                f.write("\n")
            for line in doc:
                f.write(line + "\n")


def test_doc_tools_count(tmp_path, capsys):
    p = str(tmp_path / "corpus.txt")
    _write_docs(p, [["a b c", "d e"], ["f"], ["g h", "i j k", "l"]])
    doc_tools.cli_main(["count", p])
    out = capsys.readouterr().out
    assert "found 3 docs" in out
    assert "average num lines per doc: 2.0" in out
    assert "average num toks per doc: 4.0" in out


def test_doc_tools_shard_round_robin(tmp_path):
    p = str(tmp_path / "corpus.txt")
    docs = [[f"doc{i} line"] for i in range(5)]
    _write_docs(p, docs)
    doc_tools.cli_main(["shard", p, "--num-shards", "2"])
    shard0 = open(p + ".shard0").read()
    shard1 = open(p + ".shard1").read()
    assert "doc0" in shard0 and "doc2" in shard0 and "doc4" in shard0
    assert "doc1" in shard1 and "doc3" in shard1
    # all docs preserved across shards
    all_docs = shard0 + shard1
    assert all(f"doc{i}" in all_docs for i in range(5))


def test_doc_tools_split_reservoir(tmp_path):
    p = str(tmp_path / "corpus.txt")
    docs = [[f"doc{i}"] for i in range(10)]
    _write_docs(p, docs)
    train, valid = str(tmp_path / "train"), str(tmp_path / "valid")
    doc_tools.cli_main(["split", p, train, valid, "-k", "3", "--seed", "7"])
    t = [b for b in open(train).read().split("\n\n") if b.strip()]
    v = [b for b in open(valid).read().split("\n\n") if b.strip()]
    assert len(t) == 3 and len(v) == 7
    got = sorted(x.strip() for x in t + v)
    assert got == sorted(f"doc{i}" for i in range(10))


def test_prune_checkpoints(tmp_path):
    from fbk_fairseq_st_tpu.scripts import prune_checkpoints

    run = tmp_path / "run"
    run.mkdir()
    names = [
        "checkpoint1.pt", "checkpoint2.pt", "checkpoint3.pt",
        "checkpoint_3_300.pt", "checkpoint_best.pt", "checkpoint_last.pt",
        "unrelated.txt",
    ]
    for n in names:
        (run / n).write_bytes(b"x")
    # sharded checkpoint directory is handled too
    (run / "checkpoint4.pt").mkdir()
    (run / "checkpoint4.pt" / "meta.pkl").write_bytes(b"x")

    # dry run deletes nothing
    prune_checkpoints.cli_main([str(run), "--save-last", "1"])
    assert (run / "checkpoint1.pt").exists()

    prune_checkpoints.cli_main([str(run), "--save-last", "1", "--yes"])
    left = sorted(os.listdir(run))
    # epoch and update numbers share one ordering (reference semantics), so
    # update 300 outranks epoch 4; the sharded checkpoint4.pt DIRECTORY was
    # deleted like a file
    assert left == [
        "checkpoint_3_300.pt", "checkpoint_best.pt", "checkpoint_last.pt",
        "unrelated.txt",
    ]


def test_compare_namespaces(tmp_path, capsys):
    from fbk_fairseq_st_tpu.scripts import compare_namespaces

    a = str(tmp_path / "a.pt")
    b = str(tmp_path / "b.pt")
    with open(a, "wb") as f:
        pickle.dump({"args": {"lr": 0.1, "arch": "x", "only_a": 1}}, f)
    with open(b, "wb") as f:
        pickle.dump({"args": {"lr": 0.2, "arch": "x", "only_b": 2}}, f)
    compare_namespaces.cli_main([a, b])
    out = capsys.readouterr().out
    assert "only_a\t1" in out
    assert "only_b\t2" in out
    assert "lr\t0.1\t0.2" in out
    assert "arch" not in out.split("different values:")[1].split("\n\n")[0] \
        or "arch" not in out  # equal keys are not listed


def test_extract_phonemes(tmp_path, capsys):
    yaml = pytest.importorskip("yaml")
    from fbk_fairseq_st_tpu.scripts import extract_phonemes

    lexdict = str(tmp_path / "lex.txt")
    with open(lexdict, "w") as f:
        f.write("HELLO 1 HH AH L OW\n")
        f.write("A 1 AH\n")

    jdir = tmp_path / "gentle"
    jdir.mkdir()
    words = [
        {
            "case": "success", "word": "hello", "start": 10.0, "end": 10.4,
            "phones": [
                {"phone": "hh_B", "duration": 0.1},
                {"phone": "ah_I", "duration": 0.1},
                {"phone": "l_I", "duration": 0.1},
                {"phone": "ow_E", "duration": 0.1},
            ],
        },
        {"case": "not-found-in-audio", "word": "a"},
        {
            "case": "success", "word": "hello", "start": 10.8, "end": 11.2,
            "phones": [
                {"phone": "hh_B", "duration": 0.2},
                {"phone": "ow_E", "duration": 0.2},
            ],
        },
    ]
    (jdir / "talk1.json").write_text(json.dumps({"words": words}))

    seg = str(tmp_path / "segments.yaml")
    with open(seg, "w") as f:
        yaml.safe_dump(
            [{"wav": "talk1.wav", "offset": 10.0, "duration": 1.5}], f
        )

    prefix = str(tmp_path / "out")
    extract_phonemes.cli_main([lexdict, seg, str(jdir), prefix])
    ph = open(prefix + ".ph").read().strip().split()
    # aligned word 1, lexicon fallback for the unaligned word, aligned word 2
    assert ph == [
        "hh_B", "ah_I", "l_I", "ow_E", "AH_S", "hh_B", "ow_E",
    ]
    times = open(prefix + ".ph_times").read().strip().split()
    assert len(times) == len(ph)
    # the unaligned word's offsets are the "last/next" interval form
    assert "/" in times[4]


def test_bt_tools_extract_and_dedup(tmp_path, capsys):
    from fbk_fairseq_st_tpu.scripts import bt_tools

    gen = tmp_path / "gen.out"
    gen.write_text(
        "S-0\tdas haus\n"
        "H-0\t-0.1\tthe house\n"
        "H-0\t-0.5\tthe home\n"  # second hypothesis ignored
        "S-1\tkatze\n"
        "H-1\t-0.2\ta very long hypothesis that breaks the ratio filter\n"
        "S-2\thund\n"
        "H-2\t-0.3\tdog\n"
    )
    out = str(tmp_path / "bt")
    bt_tools.cli_main([
        "extract", "--output", out, "--srclang", "en", "--tgtlang", "de",
        "--ratio", "3.0", str(gen),
    ])
    src = open(out + ".en").read().splitlines()
    tgt = open(out + ".de").read().splitlines()
    assert src == ["the house", "dog"]
    assert tgt == ["das haus", "hund"]

    dup = tmp_path / "dup.txt"
    dup.write_text("a\nb\na\nc\nb\n")
    import contextlib
    import io

    buf = io.BytesIO()

    class _Out:
        buffer = buf

    with contextlib.redirect_stdout(_Out()):
        bt_tools.cli_main(["dedup", str(dup)])
    assert buf.getvalue() == b"a\nb\nc\n"


def test_wav2vec_manifest(tmp_path):
    import numpy as np

    from fbk_fairseq_st_tpu.scripts import wav2vec_manifest
    from .test_asr_json import write_wav

    root = tmp_path / "audio"
    (root / "sub").mkdir(parents=True)
    for i, n in enumerate([1600, 3200]):
        write_wav(
            str(root / "sub" / f"u{i}.wav"),
            np.zeros(n, np.float32),
        )
    dest = str(tmp_path / "manifest")
    wav2vec_manifest.cli_main(
        [str(root), "--dest", dest, "--valid-percent", "0.0"]
    )
    lines = open(os.path.join(dest, "train.tsv")).read().splitlines()
    assert lines[0] == str(root.resolve())
    rows = dict(l.split("\t") for l in lines[1:])
    assert rows["sub/u0.wav"] == "1600"
    assert rows["sub/u1.wav"] == "3200"


def test_build_sym_alignment(tmp_path):
    """Native grow-diag-final-and symmetrization (the reference needs
    mosesdecoder's symal binary; scripts/build_sym_alignment.py:84-96)."""
    from fbk_fairseq_st_tpu.scripts.build_sym_alignment import (
        parse_alignment,
        symmetrize,
    )

    fwd = parse_alignment("0-0 1-1 2-2")
    bwd = parse_alignment("0-0 1-1 3-2")
    # intersection keeps agreed points only
    assert symmetrize(fwd, bwd, 4, 3, "intersect") == {(0, 0), (1, 1)}
    # union keeps everything
    assert symmetrize(fwd, bwd, 4, 3, "union") == fwd | bwd
    # grow-diag adopts diagonal neighbors covering a new word (OR rule):
    # (2,2) neighbors (1,1); then (3,2) neighbors (2,2) with src 3 new
    gdfa = symmetrize(fwd, bwd, 4, 3, "grow-diag-final-and")
    assert gdfa == {(0, 0), (1, 1), (2, 2), (3, 2)}

    # final vs final-and: (3,1) is NOT grow-reachable (distance 2 from
    # (1,1)) and covers a new source but an already-covered target
    fwd2 = parse_alignment("0-0 1-1 3-1")
    bwd2 = parse_alignment("0-0 1-1")
    # final-and needs BOTH sides uncovered -> rejected
    assert (3, 1) not in symmetrize(fwd2, bwd2, 4, 2, "grow-diag-final-and")
    # plain final needs only one -> accepted
    assert (3, 1) in symmetrize(fwd2, bwd2, 4, 2, "grow-diag-final")
    # no-final variant never reaches it at all
    assert (3, 1) not in symmetrize(fwd2, bwd2, 4, 2, "grow-diag")

    # CLI end-to-end with precomputed directional files
    import subprocess
    import sys

    src = tmp_path / "s.txt"
    tgt = tmp_path / "t.txt"
    src.write_text("a b c d\n")
    tgt.write_text("x y z\n")
    (tmp_path / "fwd").write_text("0-0 1-1 2-2\n")
    (tmp_path / "bwd").write_text("0-0 1-1 3-2\n")
    out = tmp_path / "out"
    subprocess.run(
        [sys.executable, "-m",
         "fbk_fairseq_st_tpu.scripts.build_sym_alignment",
         "--source_file", str(src), "--target_file", str(tgt),
         "--forward", str(tmp_path / "fwd"),
         "--backward", str(tmp_path / "bwd"),
         "--output_dir", str(out)],
        check=True, cwd="/root/repo",
    )
    assert (out / "text.joined").read_text().strip() == "a b c d ||| x y z"
    sym = (out / "aligned.sym_heuristic").read_text().strip()
    assert "0-0" in sym and "1-1" in sym and "2-2" in sym
