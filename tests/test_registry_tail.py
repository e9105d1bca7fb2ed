"""Smoke coverage for the last registry rows with no dedicated tests:
the dummy benchmark tasks (dummy_lm / dummy_masked_lm / dummy_seq2seq +
dummy_model), translation_from_pretrained_xlm, and composite_loss."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_translation import TRANSLATION_ARGS, create_translation_data

TINY_MODEL = ["--embed-dim", "16", "--num-layers", "1"]
COMMON = [
    "--optimizer", "sgd", "--lr", "0.01", "--lr-scheduler", "fixed",
    "--max-sentences", "8", "--max-epoch", "1",
    "--dict-size", "24", "--dataset-size", "16",
    "--disable-validation", "--log-format", "none",
    "--device-prefetch", "0", "--num-workers", "0",
]


@pytest.mark.parametrize("task,extra", [
    ("dummy_lm", ["--tokens-per-sample", "12"]),
    ("dummy_masked_lm", ["--tokens-per-sample", "12"]),
])
def test_dummy_bench_tasks_train(tmp_path, task, extra):
    """The no-disk benchmark tasks drive a dummy_model epoch through the
    real train CLI (reference fairseq/benchmark counterparts)."""
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        ["", "--save-dir", save_dir, "--task", task,
         "--arch", "dummy_model", "--criterion", "cross_entropy"]
        + TINY_MODEL + extra + COMMON
    )
    assert "checkpoint1.pt" in os.listdir(save_dir)


def test_dummy_seq2seq_trains_transformer(tmp_path):
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        ["", "--save-dir", save_dir, "--task", "dummy_seq2seq",
         "--arch", "transformer", "--criterion",
         "label_smoothed_cross_entropy", "--label-smoothing", "0.1",
         "--src-len", "10", "--tgt-len", "10",
         "--encoder-layers", "1", "--decoder-layers", "1",
         "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
         "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
         "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
         "--max-source-positions", "32", "--max-target-positions", "32"]
        + COMMON
    )
    assert "checkpoint1.pt" in os.listdir(save_dir)


def test_translation_from_pretrained_xlm_task(tmp_path):
    """The XLM-style task loads dictionaries as MaskedLMDictionary (adds
    <mask>) and trains the standard transformer through the CLI."""
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_translation_data(data_dir)
    argv = [data_dir, "--save-dir", save_dir] + TRANSLATION_ARGS
    argv[argv.index("--task") + 1] = "translation_from_pretrained_xlm"
    argv[argv.index("--max-epoch") + 1] = "1"
    train_cli.cli_main(argv)
    assert "checkpoint1.pt" in os.listdir(save_dir)

    from fbk_fairseq_st_tpu import options
    from fbk_fairseq_st_tpu.registry import TASKS

    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, argv)
    task = TASKS[args.task].setup_task(args)
    assert "<mask>" in task.target_dictionary.symbols


def test_composite_loss_averages_multi_output():
    """composite_loss averages the underlying criterion over a model's
    list of outputs with matching per-output targets."""
    import argparse

    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.registry import CRITERIONS

    from .utils import dummy_dictionary

    d = dummy_dictionary(vocab_size=8)

    class Task:
        target_dictionary = d

    args = argparse.Namespace(
        underlying_criterion="cross_entropy", sentence_avg=False
    )
    comp = CRITERIONS["composite_loss"].build_criterion(args, Task())
    under = CRITERIONS["cross_entropy"].build_criterion(args, Task())

    rng = np.random.RandomState(0)
    b, t, v = 3, 5, len(d)
    logits = [jnp.asarray(rng.randn(b, t, v).astype(np.float32))
              for _ in range(2)]
    targets = [jnp.asarray(rng.randint(4, v, size=(b, t)))
               for _ in range(2)]

    class MultiModel:
        def forward(self, variables, batch, rng=None, training=False):
            return (logits, None), {}

        def get_normalized_probs(self, net_output, log_probs=True):
            import jax

            return jax.nn.log_softmax(
                net_output[0].astype(jnp.float32), axis=-1
            )

    batch = {"target": targets, "src_lengths": jnp.full((b,), t)}
    loss, ss, logs, _ = comp(MultiModel(), {"params": {}}, batch)

    # hand-average the underlying criterion over the two outputs
    per = []
    for lg, tg in zip(logits, targets):
        class One:
            def forward(self, variables, batch, rng=None, training=False):
                return (lg, None), {}

            get_normalized_probs = MultiModel.get_normalized_probs

        l, s, _, _ = under(One(), {"params": {}},
                           {"target": tg, "src_lengths": batch["src_lengths"]})
        per.append((float(l), float(s)))
    np.testing.assert_allclose(
        float(loss), np.mean([p[0] for p in per]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(ss), np.mean([p[1] for p in per]), rtol=1e-6
    )
