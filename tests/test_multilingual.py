"""Multilingual ST: round-robin training over language pairs, langtok
merging (concat/sum), decoder langtok bos, inference for one pair."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_binaries import create_dummy_speech_data


def create_multilingual_data(data_dir, n=8, vocab=12, seed=0):
    # en-de data (audio + de text + dict.de)
    create_dummy_speech_data(data_dir, n=n, vocab=vocab, seed=seed)
    # add a second target language 'nl' over the same audio
    rng = np.random.RandomState(seed + 7)
    for split, count in [("train", n), ("valid", 4), ("test", 4)]:
        with open(os.path.join(data_dir, f"{split}_raw.nl"), "w") as f:
            for _ in range(count):
                length = rng.randint(2, 6)
                f.write(
                    " ".join(f"nl{rng.randint(vocab)}" for _ in range(length)) + "\n"
                )
    preprocess_cli.cli_main(
        [
            "--target-lang", "nl",
            "--trainpref", os.path.join(data_dir, "train_raw"),
            "--validpref", os.path.join(data_dir, "valid_raw"),
            "--testpref", os.path.join(data_dir, "test_raw"),
            "--destdir", data_dir,
            "--dataset-impl", "cached",
        ]
    )
    # audio 'source' dict for langtok purposes is not required (audio input)


ML_ARGS = [
    "--task", "multilingual_speech_translation",
    "--lang-pairs", "audio-de,audio-nl",
    "--arch", "multilingual_conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1",
    "--encoder-langtok", "tgt",
    "--decoder-langtok",
    "--share-encoders",
    "--optimizer", "adam", "--lr", "0.001",
    "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
    "--max-tokens", "400", "--max-epoch", "1",
    "--encoder-layers", "2", "--decoder-layers", "2",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--encoder-convolutions", "[(4, 3, 3)] * 2",
    "--input-feat-per-channel", "8",
    "--max-source-positions", "64", "--max-target-positions", "32",
    "--log-format", "none",
]


@pytest.fixture(scope="module", params=["concat", "sum"])
def ml_trained(tmp_path_factory, request):
    root = tmp_path_factory.mktemp(f"ml_{request.param}")
    data_dir, save_dir = str(root / "data"), str(root / "ckpt")
    create_multilingual_data(data_dir)
    train_cli.cli_main(
        [data_dir, "--save-dir", save_dir,
         "--langtok-merge-strategy", request.param] + ML_ARGS
    )
    return data_dir, save_dir, request.param


def test_multilingual_train(ml_trained):
    _, save_dir, _ = ml_trained
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_multilingual_generate_one_pair(ml_trained, capsys):
    data_dir, save_dir, merge = ml_trained
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "multilingual_speech_translation",
            "--lang-pairs", "audio-de,audio-nl",
            "-s", "audio", "-t", "de",
            "--langtok-merge-strategy", merge,
            "--encoder-langtok", "tgt",
            "--decoder-langtok",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "400",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0
