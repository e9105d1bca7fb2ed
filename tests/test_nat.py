"""CMLM NAT: noised training + iterative mask-predict decoding e2e."""

import os

import numpy as np

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_translation import create_translation_data


def test_cmlm_train_and_iterative_decode(tmp_path):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir, n=16)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation_lev", "-s", "en", "-t", "de",
            "--noise", "random_mask",
            "--arch", "cmlm_transformer",
            "--criterion", "nat_loss",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)

    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation_lev", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "16",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0
