"""WSC / WinoGrande / CommonsenseQA fine-tuning tasks + criterions
(reference examples/roberta/wsc/, examples/roberta/commonsense_qa/)."""

import json
import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import train as train_cli


def _write_dict(path, words):
    with open(path, "w") as f:
        for w in words:
            f.write(f"{w} 1\n")


WORDS = [
    "the", "city", "councilmen", "refused", "demonstrators", "a", "permit",
    "because", "they", "feared", "violence", "john", "moved", "couch",
    "is", "strong", "trophy", "suitcase", "q:", "a:", "what", "do", "you",
    "use", "to", "eat", "fork", "spoon", "hammer", ".", ",",
]


def test_heuristic_noun_chunks():
    from fbk_fairseq_st_tpu.tasks.roberta_wsc import _heuristic_noun_chunks

    chunks = _heuristic_noun_chunks(
        "The city councilmen refused the demonstrators a permit because "
        "John feared violence."
    )
    # determiner-led phrases and the capitalized proper noun are candidates
    joined = " | ".join(c.lower() for c in chunks)
    assert "the city" in joined
    assert "john" in joined
    # pronouns are never candidates
    assert all(c.lower() not in ("they", "it") for c in chunks)


def _wsc_jsonl(path, n=6):
    text = (
        "The city councilmen refused the demonstrators a permit "
        "because they feared violence ."
    )
    rows = []
    for i in range(n):
        rows.append(
            {
                "text": text,
                "target": {
                    "span1_index": 0,
                    "span1_text": "The city councilmen",
                    "span2_index": 9,
                    "span2_text": "they",
                },
                "label": bool(i % 2),
                # precomputed candidates (the spaCy-free path)
                "candidates": ["the demonstrators", "a permit"],
            }
        )
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _winogrande_jsonl(path, n=6):
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "sentence": "John moved the couch because _ is strong .",
                        "option1": "John",
                        "option2": "the couch",
                        "answer": "1" if i % 2 == 0 else "2",
                    }
                )
                + "\n"
            )


def _cqa_jsonl(path, n=6):
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "answerKey": "ABC"[i % 3],
                        "question": {
                            "stem": "what do you use to eat",
                            "choices": [
                                {"label": "A", "text": "fork"},
                                {"label": "B", "text": "spoon"},
                                {"label": "C", "text": "hammer"},
                            ],
                        },
                    }
                )
                + "\n"
            )


_TINY_ROBERTA = [
    "--arch", "roberta",
    "--encoder-layers", "1", "--encoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
    "--optimizer", "adam", "--lr", "0.0005", "--lr-scheduler", "fixed",
    "--max-sentences", "4", "--max-epoch", "1", "--log-format", "none",
    "--disable-validation",
]


@pytest.mark.parametrize("use_ce", [False, True])
def test_wsc_end_to_end(tmp_path, use_ce):
    data = str(tmp_path / "data")
    os.makedirs(data)
    _write_dict(os.path.join(data, "dict.txt"), WORDS)
    _wsc_jsonl(os.path.join(data, "train.jsonl"))
    argv = [
        data, "--save-dir", str(tmp_path / "ckpt"),
        "--task", "wsc", "--criterion", "wsc", "--init-token", "0",
    ] + _TINY_ROBERTA
    if use_ce:
        argv.append("--wsc-cross-entropy")
    train_cli.cli_main(argv)
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint_last.pt"))


def test_winogrande_end_to_end(tmp_path):
    data = str(tmp_path / "data")
    os.makedirs(data)
    _write_dict(os.path.join(data, "dict.txt"), WORDS)
    _winogrande_jsonl(os.path.join(data, "train.jsonl"))
    train_cli.cli_main(
        [
            data, "--save-dir", str(tmp_path / "ckpt"),
            "--task", "winogrande", "--criterion", "winogrande",
            "--init-token", "0",
        ]
        + _TINY_ROBERTA
    )
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint_last.pt"))


def test_commonsense_qa_end_to_end(tmp_path):
    data = str(tmp_path / "data")
    os.makedirs(data)
    _write_dict(os.path.join(data, "dict.txt"), WORDS)
    _cqa_jsonl(os.path.join(data, "train.jsonl"))
    train_cli.cli_main(
        [
            data, "--save-dir", str(tmp_path / "ckpt"),
            "--task", "commonsense_qa", "--criterion", "sentence_ranking",
            "--num-classes", "3", "--init-token", "0",
        ]
        + _TINY_ROBERTA
    )
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint_last.pt"))


def test_wsc_margin_loss_matches_reference_formula():
    """The batched margin loss must equal the reference's per-example
    broadcasted expression (wsc_criterion.py:55-67)."""
    import argparse

    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.criterions.wsc import WSCCriterion

    class _T:
        mask = 5
        target_dictionary = None

    args = argparse.Namespace(
        wsc_margin_alpha=1.5, wsc_margin_beta=0.4, wsc_cross_entropy=False
    )
    crit = WSCCriterion.__new__(WSCCriterion)
    crit.alpha, crit.beta, crit.use_ce = 1.5, 0.4, False

    q = jnp.array([-1.0, -2.0])
    c = jnp.array([[-0.5, -3.0], [-1.0, -9.9]])
    valid = jnp.array([[True, True], [True, False]])
    got = crit._pair_loss(q, c, valid)
    # reference: sum over candidates of (-q + alpha*clamp(c - q + beta, 0))
    exp0 = (1.0 + 1.5 * max(-0.5 + 1 + 0.4, 0)) + (
        1.0 + 1.5 * max(-3.0 + 1 + 0.4, 0)
    )
    exp1 = 2.0 + 1.5 * max(-1.0 + 2 + 0.4, 0)
    np.testing.assert_allclose(np.asarray(got), [exp0, exp1], rtol=1e-6)

    # cross-entropy form: -q + logsumexp([q, valid candidates])
    crit.use_ce = True
    got_ce = np.asarray(crit._pair_loss(q, c, valid))
    exp_ce0 = -(-1.0) + np.logaddexp.reduce([-1.0, -0.5, -3.0])
    exp_ce1 = -(-2.0) + np.logaddexp.reduce([-2.0, -1.0])
    np.testing.assert_allclose(got_ce, [exp_ce0, exp_ce1], rtol=1e-5)
