"""Preemption-safe training: SIGTERM mid-epoch -> checkpoint_last + clean
exit, and the resumed run continues from the exact mid-epoch position.

Preemptible TPU pods deliver SIGTERM with a short grace window; the
reference train loop simply dies, losing everything since the last
epoch/interval save. Here cli/train installs handlers
(--save-on-interrupt, default on) that finish the in-flight update,
write checkpoint_last (no validation — grace is short), and return.
"""

import os
import signal

import numpy as np

from fbk_fairseq_st_tpu.cli import train as train_cli
from fbk_fairseq_st_tpu.train import checkpoint as checkpoint_utils
from fbk_fairseq_st_tpu.train.trainer import Trainer

ARGS = [
    "--task", "dummy_speech",
    "--dict-size", "32", "--dataset-size", "64",
    "--src-frames", "16", "--tgt-len", "6", "--input-feat", "8",
    "--arch", "conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--optimizer", "adam", "--lr", "0.001", "--lr-scheduler", "fixed",
    "--max-sentences", "8",
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


def test_sigterm_saves_midepoch_checkpoint_and_resumes(tmp_path, monkeypatch):
    save_dir = str(tmp_path / "ckpt")

    # deliver a real SIGTERM to ourselves after the 3rd optimizer update —
    # deterministic, no timing games; the handler cli/train installs must
    # turn it into a checkpoint + clean return instead of a kill
    real_step = Trainer.train_step
    calls = {"n": 0}

    def counting_step(self, samples, *a, **kw):
        out = real_step(self, samples, *a, **kw)
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    monkeypatch.setattr(Trainer, "train_step", counting_step)
    train_cli.cli_main([
        "", "--save-dir", save_dir, "--max-epoch", "50",
    ] + ARGS)

    # we got here: the signal did NOT kill the process
    assert calls["n"] == 3, "training should stop at the interrupted update"
    files = os.listdir(save_dir)
    assert "checkpoint_last.pt" in files
    assert "checkpoint1.pt" not in files, "epoch 1 must not have completed"
    state = checkpoint_utils.load_checkpoint_to_cpu(
        os.path.join(save_dir, "checkpoint_last.pt")
    )
    itr_state = state["extra_state"]["train_iterator"]
    assert itr_state["epoch"] == 1
    assert itr_state.get("iterations_in_epoch", 0) == 3

    # resume WITHOUT the signal: epoch 1 completes from update 4 onward
    # (64 samples / batch 8 = 8 updates per epoch: 3 before the signal +
    # 5 after + 8 in epoch 2 = 16 total)
    monkeypatch.setattr(Trainer, "train_step", real_step)
    train_cli.cli_main([
        "", "--save-dir", save_dir, "--max-epoch", "2",
    ] + ARGS)
    files = os.listdir(save_dir)
    assert "checkpoint1.pt" in files and "checkpoint2.pt" in files
    state = checkpoint_utils.load_checkpoint_to_cpu(
        os.path.join(save_dir, "checkpoint1.pt")
    )
    itr1 = state["extra_state"]["train_iterator"]
    assert itr1["epoch"] == 1
    # at the boundary the saved iterator shows the COMPLETE epoch (8/8
    # consumed), not a mid-epoch position like the interrupted save's 3
    assert itr1["iterations_in_epoch"] in (0, 8), itr1
    final = checkpoint_utils.load_checkpoint_to_cpu(
        os.path.join(save_dir, "checkpoint2.pt")
    )
    assert final["num_updates"] == 16


def test_sigint_handler_restored_after_training(tmp_path):
    """cli_main must restore the process's previous signal handlers."""
    before_term = signal.getsignal(signal.SIGTERM)
    before_int = signal.getsignal(signal.SIGINT)
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main([
        "", "--save-dir", save_dir, "--max-epoch", "1",
    ] + ARGS)
    assert signal.getsignal(signal.SIGTERM) is before_term
    assert signal.getsignal(signal.SIGINT) is before_int
    assert "checkpoint1.pt" in os.listdir(save_dir)
