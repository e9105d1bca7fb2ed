"""N-step data-parallel trajectory equivalence on the virtual mesh.

The DP analog of tests/test_tensor_parallel_step.py: training on the
8-device 'data' mesh for two epochs — SpecAugment on, update_freq 2, a
checkpoint after epoch 1 and a resumed continuation — must land on the SAME
parameters as a single-device run consuming the identical global batches
(the reference's guarantee from global sample_size grad normalization,
trainer.py:423-433, exercised by its Gloo spawn test tests/test_bmuf.py).
"""

import os
import pickle

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_binaries import create_dummy_speech_data

BASE_ARGS = [
    "--task", "speech_recognition", "-t", "de",
    "--arch", "conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    # SGD, not Adam: attention k-biases have mathematically zero gradient
    # (softmax shift invariance); Adam's v-normalization amplifies the
    # 8-way-vs-1-way float reduction-order noise on them to O(lr), while
    # SGD keeps every leaf at float-epsilon deviation
    "--optimizer", "sgd", "--lr", "0.05", "--lr-scheduler", "fixed",
    "--max-sentences", "8", "--update-freq", "2",
    "--input-feat-per-channel", "8",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-convolutions", "[(4, 3, 3)]",
    "--max-source-positions", "64", "--max-target-positions", "32",
    # augmentation ON: SpecAugment masks must be sharding-invariant
    # (threefry), or DP and single-device runs see different inputs
    "--specaugment", "--specaugment-rate", "1.0",
    "--frequency-masking-pars", "2", "--time-masking-pars", "2",
    "--prng-impl", "threefry2x32",
    "--log-format", "none", "--disable-validation",
    "--device-prefetch", "0",
]


def _params(path):
    with open(path, "rb") as f:
        return pickle.load(f)["model"]


def _leaves(tree):
    import jax

    return [
        (str(k), np.asarray(v))
        for k, v in jax.tree_util.tree_leaves_with_path(tree)
    ]


def _run(data_dir, save_dir, world, max_epoch):
    train_cli.cli_main(
        [data_dir, "--save-dir", save_dir, "--max-epoch", str(max_epoch),
         "--distributed-world-size", str(world)] + BASE_ARGS
    )


@pytest.mark.slow
def test_dp8_matches_single_device_with_midway_resume(tmp_path):
    data_dir = str(tmp_path / "data")
    create_dummy_speech_data(data_dir, n=32)

    # A: 8-device DP, 2 epochs straight through
    save_a = str(tmp_path / "dp8")
    _run(data_dir, save_a, world=8, max_epoch=2)

    # B: 8-device DP, 1 epoch, then RESUME for epoch 2 (checkpoint +
    # mid-trajectory restart must not perturb the trajectory)
    save_b = str(tmp_path / "dp8_resume")
    _run(data_dir, save_b, world=1 * 8, max_epoch=1)
    _run(data_dir, save_b, world=1 * 8, max_epoch=2)

    # C: single device, identical global batches (update-accumulated)
    save_c = str(tmp_path / "dp1")
    _run(data_dir, save_c, world=1, max_epoch=2)

    pa = dict(_leaves(_params(os.path.join(save_a, "checkpoint_last.pt"))))
    pb = dict(_leaves(_params(os.path.join(save_b, "checkpoint_last.pt"))))
    pc = dict(_leaves(_params(os.path.join(save_c, "checkpoint_last.pt"))))
    assert pa.keys() == pb.keys() == pc.keys()

    # resume must be EXACT vs straight-through (same device layout)
    for k in pa:
        assert np.array_equal(pa[k], pb[k]), f"resume diverged at {k}"

    # DP vs single device: identical math, different reduction order;
    # required to agree to float-accumulation noise on every leaf
    for k in pa:
        np.testing.assert_allclose(
            pa[k], pc[k], rtol=2e-5, atol=1e-6, err_msg=k
        )
