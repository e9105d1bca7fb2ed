"""Multi-host (multi-process) launch path.

The reference trains multi-node via env:///SLURM torch.distributed init
(distributed_utils.py:30-143) and tests multi-rank behavior in-process with
a Gloo spawn test (tests/test_bmuf.py). The TPU-native analog: two REAL
launcher processes, each driving 4 virtual CPU devices, stitched into one
8-device mesh by ``jax.distributed.initialize`` (Gloo cross-process
collectives), training through the actual CLI — then the resulting
parameters are compared against a single-process 8-device run with the
identical config. This validates the whole multi-host contract: init glue,
identical global iterators, process-local batch transfer
(parallel/mesh.py place_global_array), process-0-only checkpointing with
cross-host barriers.
"""

import os
import pickle
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from .test_binaries import create_dummy_speech_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


TRAIN_ARGS = [
    "--task", "speech_recognition", "-t", "de",
    "--arch", "conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    # SGD, not Adam: attention k-biases have mathematically zero gradient
    # (softmax shift invariance), and Adam's v-normalization amplifies the
    # cross-topology float-reduction noise on such params to O(lr) — SGD
    # keeps the noise at float-epsilon scale so a tight tolerance is valid
    "--optimizer", "sgd", "--lr", "0.05", "--lr-scheduler", "fixed",
    "--max-sentences", "8", "--max-epoch", "2",
    "--input-feat-per-channel", "8",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-convolutions", "[(4, 3, 3)]",
    "--max-source-positions", "64", "--max-target-positions", "32",
    "--dropout", "0", "--attention-dropout", "0",
    # the conv frontend forces dropout >= .1 (reference
    # conv_transformer.py:212-214), so dropout stays ACTIVE in this test;
    # threefry keys are sharding-invariant, the default rbg hardware RNG
    # is not — masks must agree between the 1x8 and 2x4 topologies
    "--prng-impl", "threefry2x32",
    "--log-format", "none", "--disable-validation",
    "--device-prefetch", "0",
]

_DRIVER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fbk_fairseq_st_tpu.cli import train as train_cli
    train_cli.cli_main({argv!r})
    """
)


def _run_multihost(data_dir, save_dir, n_procs=2, extra=()):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        argv = [data_dir, "--save-dir", save_dir] + TRAIN_ARGS + list(extra) + [
            "--distributed-coordinator", f"127.0.0.1:{port}",
            "--distributed-num-processes", str(n_procs),
            "--distributed-process-id", str(pid),
        ]
        script = _DRIVER.format(repo=REPO, argv=argv)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-4000:]}"
    return outs


def _run_singlehost(data_dir, save_dir, extra=()):
    """Same config, one process, all 8 virtual devices — run in a
    subprocess too so both sides see identical library state."""
    argv = [data_dir, "--save-dir", save_dir] + TRAIN_ARGS + list(extra)
    script = _DRIVER.format(repo=REPO, argv=argv).replace(
        "device_count=4", "device_count=8"
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, cwd=REPO,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr.decode()[-4000:]


def _load_params(path):
    with open(path, "rb") as f:
        return pickle.load(f)["model"]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    data_dir = str(tmp_path / "data")
    create_dummy_speech_data(data_dir, n=16)

    save_multi = str(tmp_path / "ckpt_multi")
    save_single = str(tmp_path / "ckpt_single")
    _run_multihost(data_dir, save_multi, n_procs=2)
    _run_singlehost(data_dir, save_single)

    multi = _load_params(os.path.join(save_multi, "checkpoint_last.pt"))
    single = _load_params(os.path.join(save_single, "checkpoint_last.pt"))

    import jax

    flat_m = jax.tree_util.tree_leaves_with_path(multi)
    flat_s = dict(
        (str(k), v) for k, v in jax.tree_util.tree_leaves_with_path(single)
    )
    assert len(flat_m) == len(flat_s)
    max_abs = 0.0
    for k, v in flat_m:
        ref = flat_s[str(k)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=2e-5, atol=1e-6,
            err_msg=str(k),
        )
        max_abs = max(max_abs, float(np.abs(v - ref).max()))
    # the residual is cross-topology float-reduction order noise
    print(f"max abs param deviation 2-proc vs 1-proc: {max_abs:.2e}")


@pytest.mark.slow
def test_two_process_bitwise_identical_without_dropout(tmp_path):
    """With a dropout-free model (dummy_model: pure matmul stack) the
    2-process and 1-process runs must agree BITWISE — isolating the
    process-local batch formation + collective path from RNG/reduction
    noise entirely."""
    argv_base = [
        "--task", "dummy_lm", "--arch", "dummy_model",
        "--num-layers", "1", "--embed-dim", "16",
        "--dict-size", "32", "--dataset-size", "16",
        "--tokens-per-sample", "8",
        "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "0.01", "--lr-scheduler", "fixed",
        "--max-sentences", "8", "--max-epoch", "1",
        "--log-format", "none", "--disable-validation",
        "--device-prefetch", "0",
    ]
    save_multi = str(tmp_path / "multi")
    save_single = str(tmp_path / "single")

    port = _free_port()
    procs = []
    for pid in range(2):
        argv = argv_base + [
            "--save-dir", save_multi,
            "--distributed-coordinator", f"127.0.0.1:{port}",
            "--distributed-num-processes", "2",
            "--distributed-process-id", str(pid),
        ]
        script = _DRIVER.format(repo=REPO, argv=argv)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=REPO,
            )
        )
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-4000:]

    script = _DRIVER.format(
        repo=REPO, argv=argv_base + ["--save-dir", save_single]
    ).replace("device_count=4", "device_count=8")
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, cwd=REPO, timeout=600)
    assert out.returncode == 0, out.stderr.decode()[-4000:]

    import jax

    multi = _load_params(os.path.join(save_multi, "checkpoint_last.pt"))
    single = _load_params(os.path.join(save_single, "checkpoint_last.pt"))
    for m, s in zip(jax.tree_util.tree_leaves(multi),
                    jax.tree_util.tree_leaves(single)):
        assert np.array_equal(np.asarray(m), np.asarray(s))


@pytest.mark.slow
def test_two_process_run_writes_single_checkpoint_set(tmp_path):
    """Process-0-only checkpoint writes: the run above must leave exactly
    the expected files (no per-rank duplicates, no stale tmp dirs)."""
    data_dir = str(tmp_path / "data")
    create_dummy_speech_data(data_dir, n=16)
    save_dir = str(tmp_path / "ckpt")
    _run_multihost(data_dir, save_dir, n_procs=2)
    files = sorted(os.listdir(save_dir))
    assert "checkpoint_last.pt" in files
    assert not any(f.endswith(".tmp") for f in files)


@pytest.mark.slow
@pytest.mark.parametrize(
    "extra",
    [
        ["--model-parallel-size", "2"],
        ["--fsdp", "--fsdp-min-shard-size", "1"],
        ["--dcn-data-parallel", "2"],
    ],
    ids=["tp2", "fsdp", "dcn2"],
)
def test_two_process_composed_parallelism_matches_single_process(
    tmp_path, extra
):
    """The last untested cell of the parallelism matrix: 2 REAL processes x
    4 devices with a NON-TRIVIAL mesh — (data x model) tensor parallelism,
    ZeRO-3 FSDP sharding, and the multi-slice DCN axis — each compared
    parameter-for-parameter against the single-process 8-device run with
    the identical config. This is exactly where process-local global-array
    formation (parallel/mesh.py place_global_array) can silently go wrong:
    the rows a process contributes must land in the right mesh coordinates
    regardless of how the axes factor across hosts."""
    data_dir = str(tmp_path / "data")
    create_dummy_speech_data(data_dir, n=16)

    save_multi = str(tmp_path / "ckpt_multi")
    save_single = str(tmp_path / "ckpt_single")
    _run_multihost(data_dir, save_multi, n_procs=2, extra=extra)
    _run_singlehost(data_dir, save_single, extra=extra)

    multi = _load_params(os.path.join(save_multi, "checkpoint_last.pt"))
    single = _load_params(os.path.join(save_single, "checkpoint_last.pt"))

    import jax

    flat_m = jax.tree_util.tree_leaves_with_path(multi)
    flat_s = dict(
        (str(k), v) for k, v in jax.tree_util.tree_leaves_with_path(single)
    )
    assert len(flat_m) == len(flat_s)
    max_abs = 0.0
    for k, v in flat_m:
        ref = flat_s[str(k)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=2e-5, atol=1e-6,
            err_msg=f"{extra}: {k}",
        )
        max_abs = max(max_abs, float(np.abs(v - ref).max()))
    print(f"max abs param deviation 2-proc vs 1-proc {extra}: {max_abs:.2e}")


@pytest.mark.slow
def test_two_process_fsdp_resume(tmp_path):
    """Restore under multi-host FSDP: the second launch must re-place the
    host-gathered checkpoint onto cross-process sharded placements
    (trainer.load_trainer_state device_put with the FSDP param shardings)
    and train one more epoch."""
    data_dir = str(tmp_path / "data")
    create_dummy_speech_data(data_dir, n=16)
    save_dir = str(tmp_path / "ckpt")
    fsdp = ["--fsdp", "--fsdp-min-shard-size", "1"]
    _run_multihost(data_dir, save_dir, n_procs=2, extra=fsdp)
    assert "checkpoint2.pt" in os.listdir(save_dir)
    _run_multihost(
        data_dir, save_dir, n_procs=2, extra=fsdp + ["--max-epoch", "3"]
    )
    assert "checkpoint3.pt" in os.listdir(save_dir)
