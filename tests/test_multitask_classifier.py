"""speech_translation_multitask: classification-head training + classifier
dump CLI (COLING 2020 speaker-gender tagging)."""

import os

import numpy as np

from fbk_fairseq_st_tpu.cli import generate_multitask_classifier as clf_cli
from fbk_fairseq_st_tpu.cli import train as train_cli
from fbk_fairseq_st_tpu.data.indexed_dataset import IndexedDatasetBuilder

from .test_binaries import create_dummy_speech_data


def test_multitask_classifier_pipeline(tmp_path, capsys):
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_dummy_speech_data(data_dir, n=8)
    # auxiliary class labels (binary) for each utterance
    rng = np.random.RandomState(3)
    for split, count in [("train", 8), ("valid", 4), ("test", 4)]:
        b = IndexedDatasetBuilder(
            os.path.join(data_dir, f"{split}.de.gender.bin")
        )
        for _ in range(count):
            b.add_item(np.array([rng.randint(2)], dtype=np.int64))
        b.finalize(os.path.join(data_dir, f"{split}.de.gender.idx"))

    argv = [
        data_dir, "--save-dir", save_dir,
        "--task", "speech_translation_multitask",
        "--auxiliary-suffix", "gender",
        "-t", "de",
        "--arch", "multitask_conv_transformer",
        "--additional-output-size", "2",
        "--criterion", "cross_entropy_multi_task",
        "--label-smoothing", "0.1",
        "--auxiliary-loss-weight", "0.5",
        "--auxiliary-loss-class-weights", "1.0", "2.0",
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
    train_cli.cli_main(argv)
    assert "checkpoint_last.pt" in os.listdir(save_dir)

    results = clf_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition",
            "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test",
            "--max-tokens", "400",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert len(results) == 4
    assert any(line.startswith("CLASS-") for line in out.splitlines())
    for p in results.values():
        np.testing.assert_allclose(np.sum(p), 1.0, atol=1e-4)
