"""Benchmark dummy tasks, hub interface, NaN detector."""

import os

import numpy as np
import pytest


def test_dummy_speech_benchmark_task():
    from fbk_fairseq_st_tpu.cli import train as train_cli

    import tempfile

    with tempfile.TemporaryDirectory() as save_dir:
        train_cli.cli_main(
            [
                "",  # data positional unused
                "--task", "dummy_speech",
                "--dataset-size", "8", "--src-frames", "24",
                "--tgt-len", "6", "--input-feat", "8", "--dict-size", "16",
                "--arch", "conv_transformer",
                "--criterion", "label_smoothed_cross_entropy",
                "--label-smoothing", "0.1",
                "--optimizer", "adam", "--lr", "0.001",
                "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
                "--max-tokens", "200", "--max-epoch", "1",
                "--encoder-layers", "1", "--decoder-layers", "1",
                "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
                "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
                "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
                "--encoder-convolutions", "[(4, 3, 3)] * 2",
                "--input-feat-per-channel", "8",
                "--disable-validation",
                "--save-dir", save_dir,
                "--log-format", "none",
            ]
        )
        assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_hub_interface(tmp_path):
    from fbk_fairseq_st_tpu import hub_utils
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import TRANSLATION_ARGS, create_translation_data

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir, n=8)
    argv = [data_dir, "--save-dir", save_dir] + TRANSLATION_ARGS
    argv[argv.index("--max-epoch") + 1] = "1"
    train_cli.cli_main(argv)

    hub = hub_utils.from_pretrained(
        save_dir, "checkpoint_last.pt", data_name_or_path=data_dir,
        beam=2, max_len_b=8,
    )
    out = hub.translate("e1 e2 e3", beam=2, max_len_b=8)
    assert isinstance(out, str)
    outs = hub.translate(["e1 e2", "e3 e4 e5"], beam=2, max_len_b=8)
    assert len(outs) == 2


def test_nan_detector_finds_bad_leaves():
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.train.nan_detector import NanDetector, check_tree

    tree = {"a": jnp.ones((2, 2)), "b": {"c": jnp.array([1.0, jnp.nan])}}
    bad = check_tree(tree, "params")
    assert len(bad) == 1 and "b/c" in bad[0]

    with NanDetector() as nd:
        nd.check(tree, "params")
    assert nd.findings


@pytest.mark.quick
def test_fp16_parity_flags_accepted():
    """Fork training commands carrying the fp16 loss-scaler flags must parse
    unmodified (reference options.py:30-45); --memory-efficient-fp16 maps to
    bf16 compute like --fp16."""
    from fbk_fairseq_st_tpu import options

    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, [
        "/data", "--task", "translation", "--arch", "transformer",
        "--optimizer", "adam", "--lr", "0.0005",
        "--memory-efficient-fp16", "--fp16-init-scale", "128",
        "--fp16-scale-window", "256", "--fp16-scale-tolerance", "0.0",
        "--min-loss-scale", "0.0001", "--threshold-loss-scale", "1.0",
    ])
    assert args.memory_efficient_fp16
