"""In-training iterative product quantization driven by
--quantization-config-path (reference quantization_utils.Quantizer +
tests/transformer_quantization_config.yaml)."""

import os
import pickle

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_translation import TRANSLATION_ARGS, create_translation_data

CONFIG_YAML = """\
n_centroids:
    Linear:
        key: in_features
        value: {"*": 4}
    Embedding:
        key: embedding_dim
        value: {"*": 4}

block_sizes:
  Linear:
      key: fuzzy_name
      value: {fc: 8, attn: 4, emb: 4}
  Embedding:
      key: fuzzy_name
      value: {emb: 8}

layers_to_quantize:
    - decoder\\.layers\\.\\d+\\.fc[12]
    - decoder\\.layers\\.\\d+\\.self_attn\\.(k_proj|v_proj|q_proj|out_proj)
"""


@pytest.mark.quick
def test_config_parsing(tmp_path):
    from fbk_fairseq_st_tpu.quantization.quantizer import load_config

    path = tmp_path / "q.yaml"
    path.write_text(CONFIG_YAML)
    config = load_config(str(path))
    assert config["n_centroids"]["Linear"] == ("in_features", {"*": 4})
    assert config["block_sizes"]["Linear"][1]["attn"] == 4
    assert len(config["layers_to_quantize"]) == 2
    # defaults (reference quantization_options.parse_config_yaml)
    default = load_config(None)
    assert default["n_centroids"]["Linear"][1]["*"] == 256


@pytest.mark.quick
def test_pq_reconstruction_matches_decode():
    """weight_of's in-graph reconstruction == PQ.decode, and gradients
    flow to the centroids only (codes are frozen assignments)."""
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.core import weight_of
    from fbk_fairseq_st_tpu.quantization.pq import PQ

    rng = np.random.RandomState(0)
    W = rng.randn(16, 24).astype(np.float32)  # our (in, out) layout
    pq = PQ(W.T, block_size=4, n_centroids=8, n_iter=10)
    pq.encode()
    codes = pq.assignments.reshape(-1, 24).astype(np.float32)
    leaf = {
        "w_codes": jnp.asarray(codes),
        "w_centroids": jnp.asarray(pq.centroids),
    }
    np.testing.assert_allclose(
        np.asarray(weight_of(leaf, jnp.float32)), pq.decode().T, rtol=1e-6
    )

    def loss(leaf):
        return jnp.sum(weight_of(leaf, jnp.float32) ** 2)

    grads = jax.grad(loss)(leaf)
    assert float(jnp.max(jnp.abs(grads["w_centroids"]))) > 0
    # the float->int cast has a structurally-zero gradient
    assert float(jnp.max(jnp.abs(grads["w_codes"]))) == 0.0


def test_iterative_pq_training_e2e(tmp_path):
    """Two-stage iPQ over a tiny transformer: stage boundaries rewrite the
    scheduled layers into codes+centroids, training continues (centroids
    move, codes don't), the checkpoint round-trips, and generation decodes
    from the quantized checkpoint."""
    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir, n=12)
    config = tmp_path / "q.yaml"
    config.write_text(CONFIG_YAML)

    args = [data_dir, "--save-dir", save_dir,
            "--quantization-config-path", str(config)] + TRANSLATION_ARGS
    # epoch schedule: 2 epochs / 2 layer groups -> one group per epoch
    assert args[args.index("--max-epoch") + 1] == "2"
    train_cli.cli_main(args)

    with open(os.path.join(save_dir, "checkpoint_last.pt"), "rb") as f:
        state = pickle.load(f)
    dec_layers = state["model"]["decoder"]["layers"]
    layer0 = dec_layers["0"] if "0" in dec_layers else dec_layers[0]
    for name in ("fc1", "fc2"):
        assert "w_codes" in layer0[name], f"{name} not quantized"
        assert "w" not in layer0[name]
        # fc block size 8, n_centroids 4 (from the config)
        assert layer0[name]["w_centroids"].shape == (4, 8)
    # second stage (self_attn, via the reference's *_proj aliases)
    assert "w_codes" in layer0["self_attn"]["q"]
    assert layer0["self_attn"]["q"]["w_centroids"].shape[1] == 4
    # encoder untouched
    enc_layers = state["model"]["encoder"]["layers"]
    enc0 = enc_layers["0"] if "0" in enc_layers else enc_layers[0]
    assert "w" in enc0["fc1"]

    # resume from the quantized checkpoint: structure restores, codes stay
    # bit-identical (frozen), centroids keep training
    codes_before = np.asarray(layer0["fc1"]["w_codes"])
    cents_before = np.asarray(layer0["fc1"]["w_centroids"])
    args[args.index("--max-epoch") + 1] = "4"
    train_cli.cli_main(args)
    with open(os.path.join(save_dir, "checkpoint_last.pt"), "rb") as f:
        state2 = pickle.load(f)
    dec2 = state2["model"]["decoder"]["layers"]
    layer0b = dec2["0"] if "0" in dec2 else dec2[0]
    np.testing.assert_array_equal(
        np.asarray(layer0b["fc1"]["w_codes"]), codes_before
    )
    assert not np.array_equal(
        np.asarray(layer0b["fc1"]["w_centroids"]), cents_before
    ), "centroids did not train"

    # decode from the quantized checkpoint through the generate CLI
    scorer = generate_cli.cli_main(
        [
            data_dir, "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test", "--beam", "2", "--max-tokens", "200",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0
