"""LightConv/DynamicConv: conv math vs direct NumPy, Pallas vs XLA,
incremental decode equivalence, and train+generate e2e."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.ops.lightconv import (
    _unfold,
    dynamic_conv,
    init_dynamic_conv,
    init_lightweight_conv,
    lightweight_conv,
)

from .utils import dummy_dictionary, model_args


def test_unfold_matches_manual():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 6, 2)
    win = np.asarray(_unfold(x, kernel_size=3, padding_l=2))  # causal
    xn = np.asarray(x)
    for t in range(6):
        for k in range(3):
            src = t + k - 2
            want = xn[0, src] if src >= 0 else np.zeros(2)
            np.testing.assert_array_equal(win[0, t, k], want)


def test_lightweight_conv_matches_manual():
    rng = np.random.RandomState(0)
    b, t, c, h, k = 2, 5, 4, 2, 3
    params = init_lightweight_conv(jax.random.PRNGKey(0), c, k, h)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    out = np.asarray(
        lightweight_conv(params, x, k, h, padding_l=k - 1, weight_softmax=True)
    )
    w = np.asarray(jax.nn.softmax(params["weight"], -1))
    xn = np.asarray(x)
    for bi in range(b):
        for ti in range(t):
            for ci in range(c):
                head = ci // (c // h)
                want = sum(
                    w[head, kk] * (xn[bi, ti + kk - (k - 1), ci] if ti + kk - (k - 1) >= 0 else 0.0)
                    for kk in range(k)
                )
                np.testing.assert_allclose(out[bi, ti, ci], want, atol=1e-5)


def test_dynamic_conv_pallas_equals_xla():
    rng = np.random.RandomState(1)
    b, t, c, h, k = 2, 128, 128, 4, 7
    params = init_dynamic_conv(jax.random.PRNGKey(0), c, k, h)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    xla = dynamic_conv(params, x, k, h, padding_l=k - 1, use_pallas=False)
    pallas = dynamic_conv(params, x, k, h, padding_l=k - 1, use_pallas=True)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(pallas), atol=1e-4)


@pytest.mark.parametrize("arch", ["lightconv_iwslt_de_en", "dynamicconv_iwslt_de_en"])
def test_lightconv_incremental_matches_full(arch):
    d = dummy_dictionary(20)

    class T:
        source_dictionary = d
        target_dictionary = d

    args = model_args(
        arch,
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_conv_dim=16, decoder_conv_dim=16,
        encoder_kernel_size_list="[3, 5]",
        decoder_kernel_size_list="[3, 5]",
    )
    registry.apply_architecture(args)
    m = registry.build_model(args, T())
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randint(4, 20, size=(2, 7)))
    prev = jnp.asarray(rng.randint(4, 20, size=(2, 5)))
    prev = prev.at[:, 0].set(2)
    enc, _ = m.encode(v, src, jnp.array([7, 7]))
    (full, _), _ = m.forward(
        v,
        {"src_tokens": src, "src_lengths": jnp.array([7, 7]),
         "prev_output_tokens": prev},
    )
    cache = m.init_cache(v, 2, 5, enc)
    steps = []
    for i in range(5):
        lg, cache, _ = m.decode_step(v, prev[:, i: i + 1], cache, jnp.int32(i), enc)
        steps.append(lg)
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-4)


def test_dynamicconv_train_generate(tmp_path):
    from fbk_fairseq_st_tpu.cli import generate as generate_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir, n=12)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--arch", "dynamicconv_iwslt_de_en",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--encoder-conv-dim", "16", "--decoder-conv-dim", "16",
            "--encoder-kernel-size-list", "[3, 5]",
            "--decoder-kernel-size-list", "[3, 5]",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0
