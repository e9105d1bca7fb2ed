"""Every registered optimizer (and every LR scheduler) trains end-to-end.

The reference covers this in tests/test_binaries.py:734 (run each
optimizer on a tiny translation task); here each optimizer is paired
with a different scheduler so both registries sweep in one pass through
the real train CLI on the no-disk dummy_speech task. The assertion is
the integration one: an epoch completes, checkpoints write, and the
parameters actually moved.
"""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import train as train_cli
from fbk_fairseq_st_tpu.registry import LR_SCHEDULERS, OPTIMIZERS
from fbk_fairseq_st_tpu.train import checkpoint as checkpoint_utils

BASE = [
    "--task", "dummy_speech",
    "--dict-size", "32", "--dataset-size", "16",
    "--src-frames", "16", "--tgt-len", "6", "--input-feat", "8",
    "--arch", "conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--max-sentences", "8", "--max-epoch", "1",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--encoder-convolutions", "[(4, 3, 3)]",
    "--max-source-positions", "32", "--max-target-positions", "16",
    "--input-feat-per-channel", "8",
    "--disable-validation", "--log-format", "none",
    "--device-prefetch", "0", "--num-workers", "0",
]

# every optimizer paired with a distinct scheduler (extra flags where the
# scheduler requires them), so one sweep covers both registries
CASES = [
    ("adam", ["--adam-betas", "(0.9, 0.98)"], "inverse_sqrt",
     ["--warmup-updates", "2"]),
    ("adadelta", [], "fixed", []),
    ("adafactor", [], "polynomial_decay", ["--total-num-update", "10"]),
    ("adagrad", [], "reduce_lr_on_plateau", []),
    ("adamax", [], "cosine",
     ["--max-lr", "0.002", "--lr-period-updates", "4"]),
    ("lamb", [], "tri_stage",
     ["--warmup-steps", "2", "--hold-steps", "2", "--decay-steps", "4"]),
    ("nag", ["--momentum", "0.9"], "triangular", ["--max-lr", "0.002"]),
    ("sgd", [], "fixed", []),
]


def test_sweep_covers_whole_registries():
    assert {c[0] for c in CASES} == set(OPTIMIZERS._entries), (
        "new optimizer registered without a sweep case"
    )
    assert {c[2] for c in CASES} == set(LR_SCHEDULERS._entries), (
        "new LR scheduler registered without a sweep case"
    )


@pytest.mark.parametrize(
    "opt,opt_flags,sched,sched_flags",
    CASES,
    ids=[f"{c[0]}+{c[2]}" for c in CASES],
)
def test_optimizer_trains(tmp_path, opt, opt_flags, sched, sched_flags):
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        ["", "--save-dir", save_dir, "--optimizer", opt, "--lr", "0.001",
         "--lr-scheduler", sched] + opt_flags + sched_flags + BASE
    )
    state = checkpoint_utils.load_checkpoint_to_cpu(
        os.path.join(save_dir, "checkpoint1.pt")
    )
    assert state["num_updates"] == 2  # 16 samples / batch 8
    # parameters moved and stayed finite
    import jax

    leaves = jax.tree_util.tree_leaves(state["model"])
    assert all(np.isfinite(np.asarray(p)).all() for p in leaves)
    total = sum(float(np.abs(np.asarray(p)).sum()) for p in leaves)
    assert np.isfinite(total) and total > 0
