"""End-to-end CLI integration tests (reference tests/test_binaries.py
pattern): create tiny synthetic data, run the real preprocess -> train (2
epochs) -> generate mains, and validate registry wiring, checkpoint
round-trip and decode output validity."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import preprocess_audio as preprocess_audio_cli
from fbk_fairseq_st_tpu.cli import train as train_cli


def create_dummy_speech_data(data_dir, n=24, n_mels=8, vocab=12, seed=0):
    """Synthetic fbank + target text, written through the real CLIs."""
    rng = np.random.RandomState(seed)
    os.makedirs(data_dir, exist_ok=True)

    for split, count in [("train", n), ("valid", 4), ("test", 4)]:
        # raw .npz stream (reference preprocess_audio input format)
        npz_path = os.path.join(data_dir, f"{split}_raw.npz")
        feats = [
            rng.randn(rng.randint(8, 20), n_mels).astype(np.float32)
            for _ in range(count)
        ]
        with open(npz_path, "wb") as f:
            np.save(f, np.array([len(feats)]))
            for feat in feats:
                np.save(f, feat)
        preprocess_audio_cli.cli_main(
            [
                "--audio-features", npz_path,
                "--format", "npz",
                "--output", os.path.join(data_dir, f"{split}.npz"),
            ]
        )
        # target text
        with open(os.path.join(data_dir, f"{split}_raw.de"), "w") as f:
            for _ in range(count):
                length = rng.randint(2, 6)
                f.write(
                    " ".join(f"tok{rng.randint(vocab)}" for _ in range(length))
                    + "\n"
                )

    preprocess_cli.cli_main(
        [
            "--target-lang", "de",
            "--trainpref", os.path.join(data_dir, "train_raw"),
            "--validpref", os.path.join(data_dir, "valid_raw"),
            "--testpref", os.path.join(data_dir, "test_raw"),
            "--destdir", data_dir,
            "--dataset-impl", "cached",
        ]
    )
    # rename binarized outputs to the <split>.<lang> names the task expects
    # (preprocess writes them directly with those names)
    assert os.path.exists(os.path.join(data_dir, "dict.de.txt"))
    assert os.path.exists(os.path.join(data_dir, "train.de.bin"))
    assert os.path.exists(os.path.join(data_dir, "train.npz.bin"))


TRAIN_ARGS = [
    "--task", "speech_recognition",
    "--target-lang", "de",
    "--arch", "conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1",
    "--optimizer", "adam",
    "--lr", "0.001",
    "--lr-scheduler", "inverse_sqrt",
    "--warmup-updates", "4",
    "--max-tokens", "400",
    "--max-epoch", "2",
    "--encoder-layers", "2",
    "--decoder-layers", "2",
    "--encoder-embed-dim", "16",
    "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32",
    "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2",
    "--decoder-attention-heads", "2",
    "--encoder-convolutions", "[(4, 3, 3)] * 2",
    "--input-feat-per-channel", "8",
    "--max-source-positions", "64",
    "--max-target-positions", "32",
    "--log-format", "none",
    "--num-workers", "0",
]


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = str(root / "data")
    save_dir = str(root / "ckpt")
    create_dummy_speech_data(data_dir)
    train_cli.cli_main([data_dir, "--save-dir", save_dir] + TRAIN_ARGS)
    return data_dir, save_dir


def test_train_creates_checkpoints(trained_dir):
    data_dir, save_dir = trained_dir
    files = os.listdir(save_dir)
    assert "checkpoint_last.pt" in files
    assert "checkpoint_best.pt" in files
    assert "checkpoint1.pt" in files and "checkpoint2.pt" in files


def test_resume_training(trained_dir):
    """Mid-training restart continues from checkpoint_last (reference
    load_checkpoint semantics)."""
    data_dir, save_dir = trained_dir
    argv = [data_dir, "--save-dir", save_dir] + TRAIN_ARGS
    argv[argv.index("--max-epoch") + 1] = "3"
    train_cli.cli_main(argv)
    assert "checkpoint3.pt" in os.listdir(save_dir)


def test_generate_beam(trained_dir, capsys):
    data_dir, save_dir = trained_dir
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition",
            "--target-lang", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2",
            "--max-tokens", "400",
            "--gen-subset", "test",
            "--max-len-b", "10",
            "--skip-invalid-size-inputs-valid-test",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    # the fork's record format
    assert "T-0" in out or "T-1" in out
    assert any(line.startswith("H-") for line in out.splitlines())
    assert any(line.startswith("P-") for line in out.splitlines())
    assert scorer.stat.predlen > 0


def test_generate_quantized_weights(trained_dir, capsys):
    """--quantize-weights int8 through the generate CLI: the weight-only
    serving path must decode the test set end to end."""
    data_dir, save_dir = trained_dir
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition",
            "--target-lang", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2",
            "--max-tokens", "400",
            "--gen-subset", "test",
            "--max-len-b", "10",
            "--skip-invalid-size-inputs-valid-test",
            "--quantize-weights", "int8",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())
    assert scorer.stat.predlen > 0


def test_generate_scoring_reference(trained_dir):
    data_dir, save_dir = trained_dir
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition",
            "--target-lang", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--score-reference",
            "--max-tokens", "400",
            "--gen-subset", "test",
            "--log-format", "none",
            "--quiet",
        ]
    )
    assert scorer.stat.reflen > 0
