"""translation_moe task (Shen et al. 2019): EM mixture losses (all four
methods), gating network, expert-token BOS generation — via the train CLI
and the criterion API."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_translation import create_translation_data

ARGS = [
    "--task", "translation_moe", "-s", "en", "-t", "de",
    "--num-experts", "2",
    "--arch", "transformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1",
    "--optimizer", "adam", "--lr", "0.001", "--lr-scheduler", "fixed",
    "--max-tokens", "200", "--max-epoch", "1",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--max-source-positions", "64", "--max-target-positions", "64",
    "--log-format", "none",
]


@pytest.mark.parametrize("method", ["hMoEup", "sMoEup", "hMoElp", "sMoElp"])
def test_moe_train(tmp_path, method):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir)
    extra = ["--method", method]
    if method.endswith("lp"):
        extra += ["--mean-pool-gating-network"]
    train_cli.cli_main([data_dir, "--save-dir", save_dir] + ARGS + extra)
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_moe_generate_expert_bos(tmp_path, capsys):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [data_dir, "--save-dir", save_dir] + ARGS + ["--method", "hMoEup"]
    )
    generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation_moe", "-s", "en", "-t", "de",
            "--num-experts", "2", "--method", "hMoEup", "--gen-expert", "1",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "200", "--gen-subset", "valid",
            "--max-len-b", "8", "--quiet", "--log-format", "none",
        ]
    )


def test_logsumexp_moe_backward():
    """Forward = logsumexp; backward routes grads via the posterior."""
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.tasks.translation_moe import logsumexp_moe

    logp = jnp.asarray([[0.5, -1.0, 2.0]])
    posterior = jnp.asarray([[0.2, 0.3, 0.5]])
    val = logsumexp_moe(logp, posterior, 1)
    np.testing.assert_allclose(
        float(val[0]),
        float(jax.scipy.special.logsumexp(logp, axis=1)[0]),
        rtol=1e-6,
    )
    g = jax.grad(lambda x: logsumexp_moe(x, posterior, 1).sum())(logp)
    np.testing.assert_allclose(np.asarray(g), np.asarray(posterior), rtol=1e-6)
