"""Context-aware ST tests: model forward (tgt/src context, positions,
gating modes), ctxreg criterion, stateful context-chained generation,
pretrained load + freeze, and the train CLI end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_binaries import create_dummy_speech_data
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
        self.source_dictionary = None
        self.target_dictionary = dummy_dictionary(24)


def _build(**over):
    task = _Task()
    args = model_args("conv_transformer_context", **{**SMALL, **over})
    registry.apply_architecture(args)
    return registry.build_model(args, task), task


def _batch(rng, ctx_audio=False):
    b = {
        "src_tokens": jnp.asarray(rng.randn(2, 24, 8), jnp.float32),
        "src_lengths": jnp.array([24, 15]),
        "prev_output_tokens": jnp.array([[2, 5, 6, 7], [2, 8, 9, 1]]),
        "target": jnp.array([[5, 6, 7, 2], [8, 9, 2, 1]]),
    }
    if ctx_audio:
        b["context_tokens"] = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
        b["context_lengths"] = jnp.array([16, 10])
    else:
        b["context_tokens"] = jnp.array([[4, 5, 2], [6, 2, 1]])
        b["context_lengths"] = jnp.array([3, 2])
    return b


@pytest.mark.parametrize("attn_type", ["sequential", "parallel"])
def test_context_model_forward_tgt(attn_type):
    m, task = _build(context_type="tgt", context_decoder_attention_type=attn_type)
    v = m.init(jax.random.PRNGKey(0))
    batch = _batch(np.random.RandomState(0))
    (logits, extra), _ = m.forward(v, batch)
    assert logits.shape == (2, 4, len(task.target_dictionary))
    if attn_type == "parallel":
        assert len(extra["ctx_gates"]) == 2  # one gate per decoder layer
    else:
        assert extra["ctx_gates"] == []


def test_context_changes_output():
    m, _ = _build(context_type="tgt")
    v = m.init(jax.random.PRNGKey(0))
    batch = _batch(np.random.RandomState(0))
    (l1, _), _ = m.forward(v, batch)
    batch2 = dict(batch)
    batch2["context_tokens"] = jnp.array([[9, 8, 2], [7, 2, 1]])
    (l2, _), _ = m.forward(v, batch2)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_ctxreg_criterion():
    import argparse

    m, task = _build(context_type="tgt", context_decoder_attention_type="parallel")
    v = m.init(jax.random.PRNGKey(0))
    batch = _batch(np.random.RandomState(0))
    crit = registry.CRITERIONS["label_smoothed_cross_entropy_ctxreg"].build_criterion(
        argparse.Namespace(label_smoothing=0.1, ctx_reg_alpha=0.0, sentence_avg=False),
        task,
    )
    loss0, _, _, _ = crit(m, v, batch)
    crit2 = registry.CRITERIONS["label_smoothed_cross_entropy_ctxreg"].build_criterion(
        argparse.Namespace(label_smoothing=0.1, ctx_reg_alpha=0.5, sentence_avg=False),
        task,
    )
    loss1, _, _, _ = crit2(m, v, batch)
    # gate penalty strictly increases the loss
    assert float(loss1) > float(loss0)


def test_context_chained_generation():
    from fbk_fairseq_st_tpu.generation.sequence_generator_with_context import (
        TargetContextAwareSequenceGenerator,
    )

    m, task = _build(context_type="tgt")
    v = m.init(jax.random.PRNGKey(0))
    gen = TargetContextAwareSequenceGenerator(
        task.target_dictionary, beam_size=2, max_len_b=5
    )
    rng = np.random.RandomState(1)
    for i in range(3):  # consecutive utterances, chained
        sample = {
            "net_input": {
                "src_tokens": rng.randn(1, 24, 8).astype(np.float32),
                "src_lengths": np.array([24]),
            },
            "id": np.array([i]),
            "target": None,
        }
        hypos = gen.generate([(m, v)], sample)
        assert hypos[0][0]["tokens"][-1] == task.target_dictionary.eos()
    # buffer holds the last best hypo
    np.testing.assert_array_equal(gen.buffer[0], hypos[0][0]["tokens"])


def test_pretrained_load_and_freeze(tmp_path):
    """Train a plain conv_transformer briefly, load it into the context
    model, check pretrained weights transferred and are frozen."""
    import pickle

    base_task = _Task()
    args = model_args("conv_transformer", **SMALL)
    registry.apply_architecture(args)
    base = registry.build_model(args, base_task)
    bv = base.init(jax.random.PRNGKey(7))
    ckpt = {
        "args": vars(args),
        "model": jax.tree_util.tree_map(np.asarray, bv["params"]),
        "model_state": jax.tree_util.tree_map(np.asarray, bv["state"]),
    }
    path = str(tmp_path / "pre.pt")
    with open(path, "wb") as f:
        pickle.dump(ckpt, f)

    m, _ = _build(context_type="tgt", pretrained_model=path, freeze_pretrained="encoder")
    v = m.init(jax.random.PRNGKey(0))
    # fc3 weights must equal the pretrained ones
    np.testing.assert_array_equal(
        np.asarray(v["params"]["encoder"]["fc3"]["w"]),
        np.asarray(bv["params"]["encoder"]["fc3"]["w"]),
    )
    assert m.frozen_param_filter("encoder/fc3/w") is True
    assert m.frozen_param_filter("decoder/embed_tokens/w") is False
    assert m.frozen_param_filter("encoder/layers/0/context_attn/q/w") is False


def test_context_train_cli(tmp_path):
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_dummy_speech_data(data_dir, n=8)
    # previous-target context: shift the target text by one line
    import shutil

    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli

    for split in ("train", "valid"):
        lines = open(os.path.join(data_dir, f"{split}_raw.de")).read().splitlines()
        ctx = ["</s>"] + lines[:-1]
        ctx_file = os.path.join(data_dir, f"{split}_ctxraw.de")
        with open(ctx_file, "w") as f:
            f.write("\n".join(ctx) + "\n")
    preprocess_cli.cli_main(
        [
            "--target-lang", "de",
            "--trainpref", os.path.join(data_dir, "train_ctxraw"),
            "--validpref", os.path.join(data_dir, "valid_ctxraw"),
            "--destdir", os.path.join(data_dir, "ctxbin"),
            "--tgtdict", os.path.join(data_dir, "dict.de.txt"),
            "--dataset-impl", "cached",
        ]
    )
    for split in ("train", "valid"):
        for ext in ("bin", "idx"):
            shutil.copy(
                os.path.join(data_dir, "ctxbin", f"{split}.de.{ext}"),
                os.path.join(data_dir, f"{split}.context.de.{ext}"),
            )

    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition_context",
            "--context-type", "tgt",
            "-t", "de",
            "--arch", "conv_transformer_context",
            "--context-decoder-attention-type", "parallel",
            "--criterion", "label_smoothed_cross_entropy_ctxreg",
            "--label-smoothing", "0.1", "--ctx-reg-alpha", "0.1",
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
    assert "checkpoint_last.pt" in os.listdir(save_dir)
