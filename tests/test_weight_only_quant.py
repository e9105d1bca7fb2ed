"""Weight-only int8 quantization (serving path) unit tests.

The reference's scalar quantization only EMULATES int8 in fp32 (modules/
quantization/scalar/ops.py); this framework additionally ships a real
weight-only int8 inference path (quantization/weight_only.py + the w_q
branch of ops/core.linear). Checks: placement policy, dequant error
bounds, linear() dispatch, and model-level logit agreement."""

import numpy as np
import pytest

from fbk_fairseq_st_tpu.quantization.weight_only import (
    dequantize_linear_weights,
    quantize_linear_weights,
    quantize_weight,
)


def _tree():
    rng = np.random.RandomState(0)
    return {
        "encoder": {
            "embed_tokens": {"w": rng.randn(100, 64).astype(np.float32)},
            "layers": [
                {
                    "self_attn": {
                        "q": {
                            "w": rng.randn(64, 64).astype(np.float32),
                            "b": np.zeros(64, np.float32),
                        }
                    },
                    "fc1": {"w": rng.randn(64, 128).astype(np.float32)},
                    "conv": {
                        "w": rng.randn(3, 3, 1, 64).astype(np.float32),
                        "b": np.zeros(64, np.float32),
                    },
                    "tiny": {"w": rng.randn(4, 4).astype(np.float32)},
                }
            ],
        },
        "decoder": {
            "adaptive_softmax": {
                "projs": [{"w": rng.randn(64, 64).astype(np.float32)}]
            },
        },
    }


@pytest.mark.quick
def test_placement_policy():
    q, stats = quantize_linear_weights(_tree(), min_size=1024)
    layer = q["encoder"]["layers"][0]
    # linear weights quantized, bias preserved
    assert "w_q" in layer["self_attn"]["q"] and "b" in layer["self_attn"]["q"]
    assert layer["self_attn"]["q"]["w_q"].dtype == np.int8
    assert "w_q" in layer["fc1"]
    # embeddings, convs (rank), tiny (size), adaptive trees untouched
    assert "w" in q["encoder"]["embed_tokens"]
    assert "w" in layer["conv"] and layer["conv"]["w"].ndim == 4
    assert "w" in layer["tiny"]
    assert "w" in q["decoder"]["adaptive_softmax"]["projs"][0]
    assert stats["quantized"] == 2
    assert stats["bytes_after"] < stats["bytes_before"]


@pytest.mark.quick
def test_dequant_error_bound_and_roundtrip():
    rng = np.random.RandomState(1)
    w = rng.randn(128, 256).astype(np.float32)
    q = quantize_weight(w)
    deq = q["w_q"].astype(np.float32) * q["w_scale"]
    # symmetric per-channel: error <= scale/2 per element
    assert np.all(np.abs(deq - w) <= q["w_scale"] / 2 + 1e-7)
    # zero columns quantize losslessly (scale guard)
    w2 = w.copy()
    w2[:, 3] = 0.0
    q2 = quantize_weight(w2)
    assert np.all(q2["w_q"][:, 3] == 0)
    # round trip through dequantize_linear_weights restores the contract
    tree, _ = quantize_linear_weights({"fc": {"w": w}}, min_size=1)
    back = dequantize_linear_weights(tree)
    assert np.allclose(back["fc"]["w"], deq)


@pytest.mark.quick
def test_linear_dispatch_matches_full_precision():
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.core import linear

    rng = np.random.RandomState(2)
    w = rng.randn(64, 96).astype(np.float32) * 0.1
    b = rng.randn(96).astype(np.float32) * 0.1
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    full = linear({"w": jnp.asarray(w), "b": jnp.asarray(b)}, x)
    qp, _ = quantize_linear_weights({"w": w, "b": b}, min_size=1)
    quant = linear(
        {k: jnp.asarray(v) for k, v in qp.items()}, x
    )
    # int8 per-channel round-off: small relative error on the output
    denom = np.maximum(np.abs(np.asarray(full)), 1e-3)
    rel = np.abs(np.asarray(quant) - np.asarray(full)) / denom
    assert np.median(rel) < 0.02, np.median(rel)


def test_model_logits_close_after_quantization():
    """Full conv_transformer forward: quantized vs fp32 teacher-forced
    logits agree closely enough to preserve decodes at test scale."""
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from .utils import DummyTask, dummy_dictionary, model_args

    task = DummyTask(dummy_dictionary(20))
    args = model_args(
        "conv_transformer",
        input_feat_per_channel=8,
        encoder_convolutions="[(4,3,3)]*2",
        encoder_layers=2,
        decoder_layers=2,
        encoder_embed_dim=32,
        decoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        decoder_ffn_embed_dim=64,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        max_source_positions=64,
        max_target_positions=32,
        dropout=0.0,
    )
    registry.apply_architecture(args)
    model = registry.build_model(args, task)
    variables = model.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    b, t, tgt = 4, 24, 6
    batch = {
        "src_tokens": jnp.asarray(rng.randn(b, t, 8).astype(np.float32)),
        "src_lengths": jnp.asarray(np.full((b,), t, np.int32)),
        "prev_output_tokens": jnp.asarray(
            rng.randint(4, 20, size=(b, tgt)).astype(np.int32)
        ),
    }
    (logits, _), _ = model.forward(variables, batch, training=False)

    qparams, stats = quantize_linear_weights(
        variables["params"], min_size=512
    )
    assert stats["quantized"] > 5
    qvars = {**variables, "params": qparams}
    (qlogits, _), _ = model.forward(qvars, batch, training=False)

    lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    qlp = jax.nn.log_softmax(np.asarray(qlogits, np.float32), axis=-1)
    # distributions stay close; argmax (greedy path) unchanged
    assert float(np.abs(np.asarray(lp) - np.asarray(qlp)).max()) < 0.2
    assert np.array_equal(
        np.argmax(np.asarray(lp), -1), np.argmax(np.asarray(qlp), -1)
    )
