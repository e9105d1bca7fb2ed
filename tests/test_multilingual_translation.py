"""Text multilingual translation: round-robin pairs, langtok EOS/BOS
replacement, shared encoders/decoders (reference
tests/test_binaries.py multilingual cases role)."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import train as train_cli


def create_data(data_dir, pairs=(("en", "de"), ("en", "fr")), n=12, vocab=10,
                seed=0):
    rng = np.random.RandomState(seed)
    raw = os.path.join(data_dir, "raw")
    os.makedirs(raw, exist_ok=True)
    for src, tgt in pairs:
        for split, count in [("train", n), ("valid", 4), ("test", 4)]:
            for lang in (src, tgt):
                with open(
                    os.path.join(raw, f"{split}.{src}-{tgt}.{lang}"), "w"
                ) as f:
                    for _ in range(count):
                        length = rng.randint(2, 6)
                        f.write(
                            " ".join(
                                f"{lang}{rng.randint(vocab)}"
                                for _ in range(length)
                            ) + "\n"
                        )
        preprocess_cli.cli_main(
            [
                "--source-lang", src, "--target-lang", tgt,
                "--trainpref", os.path.join(raw, f"train.{src}-{tgt}"),
                "--validpref", os.path.join(raw, f"valid.{src}-{tgt}"),
                "--testpref", os.path.join(raw, f"test.{src}-{tgt}"),
                "--destdir", data_dir,
                "--dataset-impl", "mmap",
            ]
        )


ML_ARGS = [
    "--task", "multilingual_translation",
    "--lang-pairs", "en-de,en-fr",
    "--arch", "multilingual_transformer_iwslt_de_en",
    "--criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1",
    "--encoder-langtok", "tgt", "--decoder-langtok",
    "--share-encoders",
    "--optimizer", "adam", "--lr", "0.001",
    "--lr-scheduler", "fixed",
    "--max-tokens", "200", "--max-epoch", "1",
    "--encoder-layers", "2", "--decoder-layers", "2",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--max-source-positions", "64", "--max-target-positions", "64",
    "--log-format", "none",
]


@pytest.fixture(scope="module")
def mlt_trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("mlt")
    data_dir, save_dir = str(root / "data"), str(root / "ckpt")
    create_data(data_dir)
    train_cli.cli_main([data_dir, "--save-dir", save_dir] + ML_ARGS)
    return data_dir, save_dir


def test_multilingual_translation_train(mlt_trained):
    _, save_dir = mlt_trained
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_multilingual_translation_generate(mlt_trained, capsys):
    data_dir, save_dir = mlt_trained
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "multilingual_translation",
            "--lang-pairs", "en-de,en-fr",
            "-s", "en", "-t", "fr",
            "--encoder-langtok", "tgt", "--decoder-langtok",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0


def test_langtok_replacement(tmp_path):
    """The collated batch carries language tokens in place of EOS/BOS."""
    import argparse

    from fbk_fairseq_st_tpu.registry import TASKS
    from fbk_fairseq_st_tpu.tasks.multilingual_translation import (
        _lang_token_index,
    )

    data_dir = str(tmp_path)
    create_data(data_dir)
    args = argparse.Namespace(
        data=data_dir, lang_pairs="en-de,en-fr",
        source_lang=None, target_lang=None,
        left_pad_source="True", left_pad_target="False",
        max_source_positions=64, max_target_positions=64,
        upsample_primary=1, encoder_langtok="tgt", decoder_langtok=True,
        dataset_impl=None, seed=1,
    )
    task = TASKS["multilingual_translation"].setup_task(args)
    task.load_dataset("train")
    ds = task.dataset("train")
    batch = ds.collater([ds[0], ds[1]])
    sub = batch["en-de"]
    de_tok = _lang_token_index(task.dicts["de"], "de")
    src = np.asarray(sub["net_input"]["src_tokens"])
    # left-padded source rows end in the target-language token
    assert (src[:, -1] == de_tok).all()
    prev = np.asarray(sub["net_input"]["prev_output_tokens"])
    assert (prev[:, 0] == de_tok).all()


def test_semisupervised_translation_train(tmp_path):
    """Parallel + online backtranslation + denoising multitask."""
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_data(data_dir, pairs=(("en", "de"),))
    # monolingual target data ({split}.de files via --only-source layout)
    raw = os.path.join(data_dir, "raw")
    preprocess_cli.cli_main(
        [
            "--only-source", "--source-lang", "de",
            "--srcdict", os.path.join(data_dir, "dict.de.txt"),
            "--trainpref", os.path.join(raw, "train.en-de"),
            "--destdir", data_dir,
            "--dataset-impl", "mmap",
        ]
    )
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "semisupervised_translation",
            "--lang-pairs", "en-de",
            "--lambda-parallel-config", "1.0",
            "--lambda-otf-bt-config", "0.5",
            "--lambda-denoising-config", "0.5",
            "--bt-beam-size", "1",
            "--encoder-langtok", "tgt", "--decoder-langtok",
            "--arch", "multilingual_transformer_iwslt_de_en",
            "--share-encoders", "--share-decoders",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "150", "--max-epoch", "1", "--max-update", "3",
            "--encoder-layers", "1", "--decoder-layers", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_semisupervised_scheduled_lambdas(tmp_path):
    """Per-update lambda schedules (reference semisupervised_translation.py
    :40-59 linear interpolation) enter the jitted step as traced scalars —
    the schedule changes every update without retracing."""
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_data(data_dir, pairs=(("en", "de"),))
    raw = os.path.join(data_dir, "raw")
    preprocess_cli.cli_main(
        [
            "--only-source", "--source-lang", "de",
            "--srcdict", os.path.join(data_dir, "dict.de.txt"),
            "--trainpref", os.path.join(raw, "train.en-de"),
            "--destdir", data_dir,
            "--dataset-impl", "mmap",
        ]
    )
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "semisupervised_translation",
            "--lang-pairs", "en-de",
            "--lambda-parallel-config", "0:1,10:0.2",
            "--lambda-otf-bt-config", "0.5",
            "--lambda-denoising-config", "0:0.8,4:0.0",
            "--bt-beam-size", "1",
            "--encoder-langtok", "tgt", "--decoder-langtok",
            "--arch", "multilingual_transformer_iwslt_de_en",
            "--share-encoders", "--share-decoders",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "150", "--max-epoch", "1", "--max-update", "3",
            "--encoder-layers", "1", "--decoder-layers", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_lambda_schedule_interpolation():
    """lambda_at matches the reference's piecewise-linear schedule."""
    from fbk_fairseq_st_tpu.tasks.semisupervised_translation import (
        lambda_at,
        parse_lambda_config,
    )

    v0, cfg = parse_lambda_config("0:1,10:0.2,20:0.0")
    assert v0 == 1.0
    assert lambda_at(cfg, 0) == 1.0
    assert abs(lambda_at(cfg, 5) - 0.6) < 1e-9
    assert abs(lambda_at(cfg, 10) - 0.2) < 1e-9
    assert abs(lambda_at(cfg, 15) - 0.1) < 1e-9
    assert lambda_at(cfg, 25) == 0.0
