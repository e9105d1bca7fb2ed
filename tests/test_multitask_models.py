"""Multi-decoder family tests: dualdecoder/triangle/2stage forward +
criterion + two-phase generation end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.cli import generate_dualdecoder as gen_dd_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_st_ctc import create_st_data
from .utils import dummy_dictionary, model_args

SMALL = dict(
    encoder_layers=2,
    decoder_layers=2,
    encoder_embed_dim=16,
    decoder_embed_dim=16,
    encoder_ffn_embed_dim=32,
    decoder_ffn_embed_dim=32,
    encoder_attention_heads=2,
    decoder_attention_heads=2,
    encoder_convolutions="[(4,3,3)]*2",
    input_feat_per_channel=8,
    max_source_positions=64,
    max_target_positions=32,
)


class _Task:
    def __init__(self):
        self.source_dictionary = dummy_dictionary(10)
        self.target_dictionary = dummy_dictionary(24)


def _batch(rng):
    return {
        "src_tokens": jnp.asarray(rng.randn(2, 24, 8), jnp.float32),
        "src_lengths": jnp.array([24, 15]),
        "prev_output_tokens": jnp.array([[2, 5, 6, 7], [2, 8, 9, 1]]),
        "target": jnp.array([[5, 6, 7, 2], [8, 9, 2, 1]]),
        "transcript_prev_output_tokens": jnp.array([[2, 4, 5], [2, 6, 1]]),
        "transcript_target": jnp.array([[4, 5, 2], [6, 2, 1]]),
        "transcript_target_lengths": jnp.array([3, 2]),
    }


@pytest.mark.parametrize(
    "arch",
    ["conv_transformer_dualdecoder", "conv_transformer_triangle", "conv_transformer_2stage"],
)
def test_multitask_forward_and_criterion(arch):
    task = _Task()
    args = model_args(arch, **SMALL)
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    batch = _batch(np.random.RandomState(0))
    (dec_out, aux_out), _ = m.forward(v, batch)
    assert dec_out[0].shape == (2, 4, len(task.target_dictionary))
    assert aux_out[0].shape == (2, 3, len(task.source_dictionary))

    import argparse

    crit = registry.CRITERIONS["cross_entropy_dualdecoder"].build_criterion(
        argparse.Namespace(
            label_smoothing=0.1, sentence_avg=False,
            primary_loss_weight=0.8, auxiliary_loss_weight=0.2,
        ),
        task,
    )
    loss, sample_size, logging, _ = crit(m, v, batch)
    assert np.isfinite(float(loss))
    assert "auxiliary_nll_loss" in logging


@pytest.mark.parametrize(
    "arch",
    ["conv_transformer_dualdecoder", "conv_transformer_triangle", "conv_transformer_2stage"],
)
def test_twophase_generation(arch):
    from fbk_fairseq_st_tpu.generation.twophase_sequence_generator import (
        TwoPhaseSequenceGenerator,
    )

    task = _Task()
    args = model_args(arch, **SMALL)
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    sample = {
        "net_input": {
            "src_tokens": rng.randn(2, 24, 8).astype(np.float32),
            "src_lengths": np.array([24, 16]),
        },
        "target": None,
        "id": np.array([0, 1]),
    }
    gen = TwoPhaseSequenceGenerator(
        task.source_dictionary,
        task.target_dictionary,
        beam_size=2,
        max_len_b=6,
    )
    hypos = gen.generate([(m, v)], sample)
    assert len(hypos) == 2
    for sent in hypos:
        assert len(sent) >= 1
        for h in sent:
            assert h["tokens"][-1] == task.target_dictionary.eos()
            assert "transcript_tokens" in h
            assert len(h["transcript_tokens"]) >= 1
            # joint score includes the transcript offset and is finite
            assert np.isfinite(h["score"])
        # sorted descending
        scores = [h["score"] for h in sent]
        assert scores == sorted(scores, reverse=True)


def test_dualdecoder_train_and_generate_cli(tmp_path):
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_st_data(data_dir, n=8)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_translation_dualdecoding",
            "-s", "en", "-t", "de",
            "--arch", "conv_transformer_triangle",
            "--criterion", "cross_entropy_dualdecoder",
            "--label-smoothing", "0.1",
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
    )
    scorer = gen_dd_cli.cli_main(
        [
            data_dir,
            "--task", "speech_translation_dualdecoding",
            "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "400",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0
