"""Noisy-channel reranking (examples/noisychannel role): forward n-best +
channel-model rescoring + weight combination, via the rerank CLI."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import rerank as rerank_cli
from fbk_fairseq_st_tpu.cli import train as train_cli
from fbk_fairseq_st_tpu.noisychannel import get_score

from .test_translation import create_translation_data

SMALL = [
    "--arch", "transformer",
    "--criterion", "label_smoothed_cross_entropy", "--label-smoothing", "0.1",
    "--optimizer", "adam", "--lr", "0.001", "--lr-scheduler", "fixed",
    "--max-tokens", "200", "--max-epoch", "1",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--max-source-positions", "64", "--max-target-positions", "64",
    "--log-format", "none",
]


def test_get_score_matches_reference_formula():
    # spot values against the hand-evaluated reference formula
    s = get_score(1.0, 0.5, 0.0, target_len=4, bitext_score1=-8.0,
                  bitext_score2=-6.0, lm_score=0.0, lenpen=1.0,
                  src_len=5, tgt_len=4, bitext2_backwards=True)
    np.testing.assert_allclose(s, (-8.0 + 0.5 * -6.0) / 4.0)
    s = get_score(1.0, 1.0, 1.0, target_len=2, bitext_score1=-4.0,
                  bitext_score2=-2.0, lm_score=-3.0, lenpen=None,
                  src_len=5, tgt_len=4, bitext2_backwards=True,
                  normalize=True)
    np.testing.assert_allclose(s, -4.0 / 4 + -2.0 / 5 + -3.0 / 5)


def test_rerank_cli(tmp_path):
    data_dir = str(tmp_path / "data")
    create_translation_data(data_dir)
    fwd_dir, bwd_dir = str(tmp_path / "fwd"), str(tmp_path / "bwd")
    train_cli.cli_main(
        [data_dir, "--save-dir", fwd_dir, "--task", "translation",
         "-s", "en", "-t", "de"] + SMALL
    )
    # channel model: trained in the reverse direction on the same bitext
    train_cli.cli_main(
        [data_dir, "--save-dir", bwd_dir, "--task", "translation",
         "-s", "de", "-t", "en"] + SMALL
    )
    scorer = rerank_cli.cli_main(
        [
            data_dir, "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(fwd_dir, "checkpoint_last.pt"),
            "--score-model", os.path.join(bwd_dir, "checkpoint_last.pt"),
            "--num-rescore", "2", "--weight1", "1.0", "--weight2", "0.5",
            "--weight3", "0.0", "--lenpen", "1.0",
            "--gen-subset", "valid", "--max-tokens", "200", "--max-len-b", "8",
            "--log-format", "none",
        ]
    )
    assert np.isfinite(scorer.score())


def test_rerank_tune(tmp_path):
    data_dir = str(tmp_path / "data")
    create_translation_data(data_dir)
    fwd_dir = str(tmp_path / "fwd")
    train_cli.cli_main(
        [data_dir, "--save-dir", fwd_dir, "--task", "translation",
         "-s", "en", "-t", "de"] + SMALL
    )
    scorer = rerank_cli.cli_main(
        [
            data_dir, "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(fwd_dir, "checkpoint_last.pt"),
            "--num-rescore", "2", "--tune", "--tune-iterations", "4",
            "--weight2", "0.0", "--weight3", "0.0", "--lenpen", "1.0",
            "--gen-subset", "valid", "--max-tokens", "200", "--max-len-b", "8",
            "--log-format", "none",
        ]
    )
    assert np.isfinite(scorer.score())
