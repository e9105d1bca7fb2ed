"""Native ASG criterion tests (reference criterions/ASG_loss.py needs the
external wav2letter library; ops/asg.py implements the loss in-repo).

Golden checks: replabel pack/unpack parity vs the reference transforms,
brute-force FCC/FAL enumeration on tiny inputs, gradients through the
transition matrix, Viterbi best-path parity, and an end-to-end w2l+ASG
training run through the CLI."""

import itertools
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fbk_fairseq_st_tpu.data.dictionary import Dictionary
from fbk_fairseq_st_tpu.data.replabels import pack_replabels, unpack_replabels
from fbk_fairseq_st_tpu.ops.asg import asg_loss, asg_viterbi_decode

REFERENCE = "/root/reference"


def _dict_with_replabels(extra=("a", "b", "c", "|")):
    d = Dictionary()
    for s in extra:
        d.add_symbol(s)
    for i in (1, 2, 3):
        d.add_symbol(str(i))
    return d


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
@pytest.mark.parametrize("max_reps", [1, 2, 3])
def test_replabels_match_reference(max_reps):
    # load the single reference file standalone (the package __init__ pulls
    # in the whole torch stack)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_replabels",
        os.path.join(
            REFERENCE, "examples/speech_recognition/data/replabels.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_pack, ref_unpack = mod.pack_replabels, mod.unpack_replabels

    d = _dict_with_replabels()
    a = d.index("a")
    b = d.index("b")
    cases = [
        [a, a, b],
        [a, a, a, a, b, b],
        [a, b, a],
        [a] * 7,
        [],
        [b, b, b, b],
    ]
    for toks in cases:
        mine = pack_replabels(toks, d, max_reps)
        ref = ref_pack(list(toks), d, max_reps)
        assert mine == ref, (toks, mine, ref)
        assert unpack_replabels(mine, d, max_reps) == ref_unpack(
            list(ref), d, max_reps
        )
        # round trip restores the original
        assert unpack_replabels(mine, d, max_reps) == toks


def _brute_fcc(em, trans):
    T, V = em.shape
    scores = []
    for path in itertools.product(range(V), repeat=T):
        s = em[0, path[0]]
        for t in range(1, T):
            s += em[t, path[t]] + trans[path[t], path[t - 1]]
        scores.append(s)
    return np.logaddexp.reduce(scores)


def _brute_fal(em, trans, tgt):
    T = em.shape[0]
    L = len(tgt)
    scores = []
    # monotonic alignments: l_0 = 0, l_T-1 = L-1, steps in {0, +1}
    for steps in itertools.product([0, 1], repeat=T - 1):
        ls = [0]
        for st in steps:
            ls.append(ls[-1] + st)
        if ls[-1] != L - 1 or max(ls) > L - 1:
            continue
        s = em[0, tgt[0]]
        for t in range(1, T):
            s += em[t, tgt[ls[t]]] + trans[tgt[ls[t]], tgt[ls[t - 1]]]
        scores.append(s)
    return np.logaddexp.reduce(scores)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asg_loss_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    T, V = 5, 4
    em = rng.randn(T, V).astype(np.float32)
    trans = (rng.randn(V, V) * 0.5).astype(np.float32)
    tgt = [1, 3, 2]

    expected = _brute_fcc(em, trans) - _brute_fal(em, trans, tgt)
    got = asg_loss(
        jnp.asarray(em)[None],
        jnp.asarray(trans),
        jnp.asarray([tgt], jnp.int32),
        jnp.asarray([T]),
        jnp.asarray([len(tgt)]),
        scale_mode="none",
    )
    np.testing.assert_allclose(float(got[0]), expected, rtol=1e-5)


def test_asg_loss_batch_length_masking():
    """Padded batch rows must equal their solo-trimmed computation."""
    rng = np.random.RandomState(3)
    V = 4
    em = rng.randn(2, 6, V).astype(np.float32)
    trans = (rng.randn(V, V) * 0.3).astype(np.float32)
    tgt = np.array([[1, 2, 3], [2, 1, 0]], np.int32)
    loss = asg_loss(
        jnp.asarray(em), jnp.asarray(trans), jnp.asarray(tgt),
        jnp.asarray([6, 4]), jnp.asarray([3, 2]), scale_mode="none",
    )
    solo = asg_loss(
        jnp.asarray(em[1:2, :4]), jnp.asarray(trans),
        jnp.asarray(tgt[1:2, :2]), jnp.asarray([4]), jnp.asarray([2]),
        scale_mode="none",
    )
    np.testing.assert_allclose(float(loss[1]), float(solo[0]), rtol=1e-5)


def test_asg_gradients_flow_through_transitions():
    rng = np.random.RandomState(0)
    V = 4
    em = jnp.asarray(rng.randn(1, 5, V).astype(np.float32))

    def f(trans):
        return asg_loss(
            em, trans, jnp.asarray([[1, 2]], jnp.int32),
            jnp.asarray([5]), jnp.asarray([2]),
        ).sum()

    g = jax.grad(f)(jnp.zeros((V, V)))
    assert float(jnp.abs(g).max()) > 0


def test_asg_viterbi_matches_brute_force_best_path():
    rng = np.random.RandomState(1)
    T, V = 4, 3
    em = rng.randn(T, V).astype(np.float32)
    trans = (rng.randn(V, V) * 0.5).astype(np.float32)
    best, best_score = None, -np.inf
    for path in itertools.product(range(V), repeat=T):
        s = em[0, path[0]]
        for t in range(1, T):
            s += em[t, path[t]] + trans[path[t], path[t - 1]]
        if s > best_score:
            best, best_score = path, s
    paths, scores = asg_viterbi_decode(
        jnp.asarray(em)[None], jnp.asarray(trans), jnp.asarray([T])
    )
    assert tuple(np.asarray(paths[0]).tolist()) == best
    np.testing.assert_allclose(float(scores[0]), best_score, rtol=1e-5)


def test_w2l_asg_end_to_end(tmp_path):
    """Train asr_w2l_conv_glu_encoder with asg_loss through the real CLI
    (the reference cannot run this path without wav2letter)."""
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_binaries import create_dummy_speech_data

    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_dummy_speech_data(data_dir, n=8)
    # ASG needs replabel symbols in the dictionary
    # the task itself adds replabel symbols for asg_loss; only the
    # silence token needs to exist in the corpus dictionary
    with open(os.path.join(data_dir, "dict.de.txt"), "a") as f:
        f.write("| 1\n")
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition", "-t", "de",
            "--arch", "asr_w2l_conv_glu_encoder",
            "--criterion", "asg_loss",
            "--max-replabel", "2",
            "--linseg-updates", "2",
            "--optimizer", "adadelta", "--lr", "0.5",
            "--lr-scheduler", "fixed",
            "--max-tokens", "400", "--max-epoch", "1",
            "--input-feat-per-channel", "8",
            "--conv-enc-config", "[(8, 3, 1, 0.0), (8, 3, 1, 0.0)]",
            "--max-source-positions", "64", "--max-target-positions", "32",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
    # the learned transition matrix is in the checkpoint
    from fbk_fairseq_st_tpu.train.checkpoint import load_checkpoint_to_cpu

    state = load_checkpoint_to_cpu(
        os.path.join(save_dir, "checkpoint_last.pt")
    )
    assert "asg_transitions" in state["model"]


def test_infer_asg_viterbi_end_to_end(tmp_path):
    """infer --w2l-decoder viterbi on an ASG model decodes through the
    native ASG Viterbi (learned transitions + replabel unpacking) instead
    of mislabeling it as blank-CTC."""
    from fbk_fairseq_st_tpu.cli import infer as infer_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_binaries import create_dummy_speech_data

    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    results = str(tmp_path / "results")
    create_dummy_speech_data(data_dir, n=8)
    # the task itself adds replabel symbols for asg_loss; only the
    # silence token needs to exist in the corpus dictionary
    with open(os.path.join(data_dir, "dict.de.txt"), "a") as f:
        f.write("| 1\n")
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition", "-t", "de",
            "--arch", "asr_w2l_conv_glu_encoder",
            "--criterion", "asg_loss",
            "--max-replabel", "2",
            "--optimizer", "adadelta", "--lr", "0.5",
            "--lr-scheduler", "fixed",
            "--max-tokens", "400", "--max-epoch", "1",
            "--input-feat-per-channel", "8",
            "--conv-enc-config", "[(8, 3, 1, 0.0), (8, 3, 1, 0.0)]",
            "--max-source-positions", "64", "--max-target-positions", "32",
            "--log-format", "none",
        ]
    )
    infer_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition", "-t", "de",
            "--criterion", "asg_loss",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test",
            "--results-path", results,
            "--w2l-decoder", "viterbi",
            "--max-tokens", "400",
            "--log-format", "none",
        ]
    )
    files = os.listdir(results)
    hypo_file = [f for f in files if f.startswith("hypo.units")][0]
    content = open(os.path.join(results, hypo_file)).read()
    assert "(" in content
    # replabels must have been expanded away in the output
    for line in content.splitlines():
        sent = line.rsplit("(", 1)[0].split()
        assert "1" not in sent and "2" not in sent, sent


def test_infer_asg_beam_end_to_end(tmp_path):
    """--ctc-decoding beam on an ASG model runs the native ASG beam search
    (unnormalized scores + learned transitions), unpacking replabels."""
    from fbk_fairseq_st_tpu.cli import infer as infer_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_binaries import create_dummy_speech_data

    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    results = str(tmp_path / "results")
    create_dummy_speech_data(data_dir, n=8)
    # the task itself adds replabel symbols for asg_loss; only the
    # silence token needs to exist in the corpus dictionary
    with open(os.path.join(data_dir, "dict.de.txt"), "a") as f:
        f.write("| 1\n")
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition", "-t", "de",
            "--arch", "asr_w2l_conv_glu_encoder",
            "--criterion", "asg_loss",
            "--optimizer", "adadelta", "--lr", "0.5",
            "--lr-scheduler", "fixed",
            "--max-tokens", "400", "--max-epoch", "1",
            "--input-feat-per-channel", "8",
            "--conv-enc-config", "[(8, 3, 1, 0.0), (8, 3, 1, 0.0)]",
            "--max-source-positions", "64", "--max-target-positions", "32",
            "--log-format", "none",
        ]
    )
    infer_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition", "-t", "de",
            "--criterion", "asg_loss",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test",
            "--results-path", results,
            "--ctc-decoding", "beam",
            "--ctc-beam-size", "8",
            "--max-tokens", "400",
            "--log-format", "none",
        ]
    )
    hypo_file = [
        f for f in os.listdir(results) if f.startswith("hypo.units")
    ][0]
    content = open(os.path.join(results, hypo_file)).read()
    assert "(" in content
    for line in content.splitlines():
        sent = line.rsplit("(", 1)[0].split()
        assert "1" not in sent and "2" not in sent, sent


def test_linseg_not_applied_during_validation():
    """ADVICE r02: the reference's linseg_step() returns False when not
    training, so validation targets in the warmup window must stay
    unstretched (else val losses are not comparable for best-ckpt logic)."""
    import argparse

    from fbk_fairseq_st_tpu.criterions.asg import ASGCriterion

    d = _dict_with_replabels()

    class _Task:
        target_dictionary = d

    args = argparse.Namespace(
        max_replabel=2, linseg_updates=100, hide_linseg_messages=True,
        silence_token="|", asg_scale_mode="target_sz_sqrt",
    )
    crit = ASGCriterion(_Task(), args)
    tgt = np.array([[d.index("a"), d.index("b"), d.pad()]], np.int32)
    sample = {
        "target": tgt,
        "target_lengths": np.array([2], np.int32),
        "net_input": {"src_lengths": np.array([8], np.int32)},
        "ntokens": 2,
    }
    train_out = crit.prepare_sample(dict(sample), num_updates=0,
                                    training=True)
    valid_out = crit.prepare_sample(dict(sample), num_updates=0,
                                    training=False)
    # LinSeg stretches the target over all 8 frames in training...
    assert int(train_out["asg_target_lengths"][0]) == 8
    # ...but validation keeps the raw (replabel-packed) target
    assert int(valid_out["asg_target_lengths"][0]) == 2
