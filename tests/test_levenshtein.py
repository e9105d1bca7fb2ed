"""Levenshtein transformer: fixed-width edit ops, device label generation,
end-to-end train + iterative refinement decode (reference
tests/test_binaries.py levenshtein case role)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fbk_fairseq_st_tpu.models.nat import (
    apply_del_words,
    apply_ins_masks,
    apply_ins_words,
    get_del_targets,
    get_ins_targets,
)

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def test_apply_del_words():
    tokens = jnp.array([[BOS, 5, 6, 7, EOS, PAD]])
    scores = jnp.arange(6, dtype=jnp.float32)[None]
    # delete positions 1 and 3 (tokens 5 and 7); bos/eos protected even if
    # marked
    del_pred = jnp.array([[True, True, False, True, True, False]])
    out, out_s = apply_del_words(tokens, scores, del_pred, PAD, BOS, EOS)
    assert out.tolist() == [[BOS, 6, EOS, PAD, PAD, PAD]]
    assert out_s.tolist()[0][:3] == [0.0, 2.0, 4.0]


def test_apply_ins_masks_and_words():
    tokens = jnp.array([[BOS, 5, EOS, PAD, PAD, PAD]])
    scores = jnp.ones((1, 6), jnp.float32)
    ins = jnp.array([[2, 1, 0, 0, 0]])  # 2 unks after bos, 1 after 5
    out, out_s = apply_ins_masks(tokens, scores, ins, PAD, UNK, EOS)
    assert out.tolist() == [[BOS, UNK, UNK, 5, UNK, EOS]]
    # fill words
    pred = jnp.full((1, 6), 9, jnp.int32)
    pred_s = jnp.full((1, 6), -0.5, jnp.float32)
    out2, out2_s = apply_ins_words(out, out_s, pred, pred_s, UNK)
    assert out2.tolist() == [[BOS, 9, 9, 5, 9, EOS]]
    np.testing.assert_allclose(np.asarray(out2_s[0])[[1, 2, 4]], -0.5)


def test_apply_ins_masks_budget_clip():
    """Insertions beyond the fixed width are greedily dropped."""
    tokens = jnp.array([[BOS, 5, EOS, PAD]])
    scores = jnp.zeros((1, 4), jnp.float32)
    ins = jnp.array([[5, 5, 0]])
    out, _ = apply_ins_masks(tokens, scores, ins, PAD, UNK, EOS)
    assert out.shape == (1, 4)
    assert out.tolist() == [[BOS, UNK, 5, EOS]]  # only 1 slot of budget


def test_get_ins_targets():
    # prev = subsequence of tgt (random_delete style)
    prev = jnp.array([[BOS, 5, 8, EOS, PAD, PAD]])
    tgt = jnp.array([[BOS, 5, 6, 7, 8, EOS]])
    masks, masked_tokens, ins_tgt = get_ins_targets(prev, tgt, PAD, UNK)
    # 6 and 7 are insertions after prev position 1 (token 5)
    assert masks.tolist() == [[False, False, True, True, False, False]]
    assert masked_tokens.tolist() == [[BOS, 5, UNK, UNK, 8, EOS]]
    assert ins_tgt.tolist() == [[0, 2, 0, 0, 0]]


def test_get_del_targets():
    pred = jnp.array([[BOS, 5, 9, 6, EOS, PAD]])
    tgt = jnp.array([[BOS, 5, 6, EOS, PAD, PAD]])
    del_tgt = get_del_targets(pred, tgt, PAD)
    # 9 must be deleted; pads are 0
    assert del_tgt.tolist() == [[0, 0, 1, 0, 0, 0]]


def test_get_ins_targets_fuzz_roundtrip():
    """Applying the ins targets to prev reconstructs the target skeleton."""
    rng = np.random.RandomState(0)
    L = 12
    for _ in range(25):
        tl = rng.randint(4, L)
        tgt_row = np.full(L, PAD)
        tgt_row[0] = BOS
        tgt_row[1: tl - 1] = rng.randint(4, 20, size=tl - 2)
        tgt_row[tl - 1] = EOS
        # random subsequence keeping bos/eos
        keep = np.zeros(L, bool)
        keep[0] = keep[tl - 1] = True
        for i in range(1, tl - 1):
            keep[i] = rng.rand() > 0.5
        prev_row = np.full(L, PAD)
        kept = tgt_row[keep]
        prev_row[: len(kept)] = kept

        prev = jnp.asarray(prev_row[None])
        tgt = jnp.asarray(tgt_row[None])
        masks, masked_tokens, ins_tgt = get_ins_targets(prev, tgt, PAD, UNK)
        # apply the oracle insertions to prev -> must equal masked_tokens
        out, _ = apply_ins_masks(
            prev, jnp.zeros_like(prev, jnp.float32),
            ins_tgt, PAD, UNK, EOS,
        )
        np.testing.assert_array_equal(
            np.asarray(out[0]), np.asarray(masked_tokens[0])
        )


@pytest.fixture(scope="module")
def lev_trained(tmp_path_factory):
    import os

    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    root = tmp_path_factory.mktemp("lev")
    data_dir, save_dir = str(root / "data"), str(root / "ckpt")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation_lev",
            "-s", "en", "-t", "de",
            "--noise", "random_delete",
            "--arch", "levenshtein_transformer",
            "--criterion", "nat_loss",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--early-exit", "2,2,2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    return data_dir, save_dir


def test_levenshtein_train(lev_trained):
    import os

    _, save_dir = lev_trained
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_levenshtein_generate(lev_trained, capsys):
    import os

    from fbk_fairseq_st_tpu.cli import generate as generate_cli

    data_dir, save_dir = lev_trained
    generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation_lev",
            "-s", "en", "-t", "de",
            "--noise", "random_delete",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "16",
            "--iter-decode-max-iter", "3",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    h_lines = [l for l in out.splitlines() if l.startswith("H-")]
    assert h_lines, "no hypotheses generated"


import pytest as _pytest


@_pytest.mark.parametrize(
    "arch,extra_args,noise",
    [
        ("nonautoregressive_transformer", ["--src-embedding-copy"],
         "full_mask"),
        ("iterative_nonautoregressive_transformer",
         ["--train-step", "2", "--stochastic-approx"], "full_mask"),
        ("insertion_transformer", ["--label-tau", "1.0"], "random_delete"),
        ("nacrf_transformer",
         ["--crf-lowrank-approx", "4", "--crf-beam-approx", "4",
          "--word-ins-loss-factor", "0.5"], "full_mask"),
    ],
)
def test_nat_variants_train_and_decode(tmp_path, arch, extra_args, noise,
                                       capsys):
    import os

    from fbk_fairseq_st_tpu.cli import generate as generate_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation_lev",
            "-s", "en", "-t", "de",
            "--noise", noise,
            "--arch", arch,
            "--criterion", "nat_loss",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ] + extra_args
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
    generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation_lev",
            "-s", "en", "-t", "de",
            "--noise", noise,
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "16",
            "--iter-decode-max-iter", "2",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())


def test_levenshtein_ensemble_decode(lev_trained, capsys):
    """EnsembleLevT: two model copies, averaged edit heads."""
    import os

    from fbk_fairseq_st_tpu.cli import generate as generate_cli

    data_dir, save_dir = lev_trained
    ckpt = os.path.join(save_dir, "checkpoint_last.pt")
    generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation_lev",
            "-s", "en", "-t", "de",
            "--noise", "random_delete",
            "--path", f"{ckpt}:{ckpt}",
            "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "16",
            "--iter-decode-max-iter", "2",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())
