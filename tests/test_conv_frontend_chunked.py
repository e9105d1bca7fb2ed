"""Chunked conv-frontend (batch-time rechunking for long inputs) must be
an exact reformulation of the plain conv pipeline.

The chunked path folds haloed 512-frame chunks into the batch axis so the
frontend runs at lane-friendly shapes (see conv_frontend.py); these tests
pin the transform's exactness against the unchunked loop: same outputs,
same lengths, same BatchNorm batch statistics (stats come from the center
slice, halo rows excluded), with the global-edge masking reproducing the
unchunked conv's output-level zero padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# the ops package re-exports the conv_frontend FUNCTION under the same
# name, so attribute-style module imports resolve to the function
CF = importlib.import_module("fbk_fairseq_st_tpu.ops.conv_frontend")
from fbk_fairseq_st_tpu.ops.conv_frontend import (
    ConvFrontendConfig,
    conv_frontend,
    init_conv_frontend,
)

pytestmark = pytest.mark.quick


def _run(cfg, x, lengths, chunked, training):
    params, state = init_conv_frontend(jax.random.PRNGKey(0), cfg)
    old = CF._CHUNK_MIN_T
    CF._CHUNK_MIN_T = 0 if chunked else 10 ** 9
    try:
        assert CF._chunk_eligible(cfg, x.shape[1]) == chunked
        out, ln, st = conv_frontend(
            params, state, cfg, x, lengths,
            deterministic=True, training=training,
        )
    finally:
        CF._CHUNK_MIN_T = old
    return np.asarray(out), np.asarray(ln), st


@pytest.mark.parametrize("n_convs", [2, 3])
@pytest.mark.parametrize("training", [False, True])
def test_chunked_matches_unchunked(n_convs, training):
    cfg = ConvFrontendConfig(
        convolutions=((8, 3, 3),) * n_convs, audio_features=20,
        attn_2d=False, dropout=0.0,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2048, 20).astype(np.float32))
    lengths = jnp.asarray([2048, 1500], jnp.int32)

    ref, ln_ref, st_ref = _run(cfg, x, lengths, chunked=False,
                               training=training)
    got, ln_got, st_got = _run(cfg, x, lengths, chunked=True,
                               training=training)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(ln_got, ln_ref)
    # training mode recomputes BN batch statistics from the center slice:
    # same element set, different reduction order -> ~3e-5 float noise
    # through two rsqrt normalizations (eval mode is ~1e-6)
    tol = 2e-4 if training else 2e-5
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)
    # BN running stats (training mode: batch stats from the center slice
    # must equal the full unchunked statistics)
    for a, b in zip(
        jax.tree.leaves(st_got["bns"]), jax.tree.leaves(st_ref["bns"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_chunk_gate():
    cfg = ConvFrontendConfig(attn_2d=False)
    assert not CF._chunk_eligible(cfg, 512)        # too short
    assert not CF._chunk_eligible(cfg, 2050)       # not chunk-aligned
    assert CF._chunk_eligible(cfg, 2048)
    assert CF._chunk_eligible(cfg, 8192)
    # even time kernels / other strides fall back to the plain loop
    assert not CF._chunk_eligible(
        ConvFrontendConfig(convolutions=((8, 2, 3),), attn_2d=False), 2048
    )
    assert not CF._chunk_eligible(
        ConvFrontendConfig(stride=3, attn_2d=False), 2048
    )


def test_chunked_full_frontend_with_attn2d_eval():
    """End-to-end conv_frontend (convs + ConvAttention2D) at a chunked
    length in eval mode: the attention blocks consume the reassembled
    full-sequence tensor, so their outputs must match too."""
    cfg = ConvFrontendConfig(audio_features=20, attn_2d=True,
                             attn_2d_heads=2, dropout=0.0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2048, 20).astype(np.float32))
    lengths = jnp.asarray([2048], jnp.int32)
    ref, ln_ref, _ = _run(cfg, x, lengths, chunked=False, training=False)
    got, ln_got, _ = _run(cfg, x, lengths, chunked=True, training=False)
    np.testing.assert_array_equal(ln_got, ln_ref)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_chunked_frontend_composes_with_ring_attention():
    """Interaction check: the chunked frontend's batch-time reshapes of a
    pjit-sharded batch must compose with --ring-attention's sequence
    sharding (ppermute inside shard_map) in one fused train step on the
    8-device CPU mesh. T=2048 activates BOTH paths (the ring test module
    itself runs at T=64, below the chunk gate)."""
    import importlib

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.parallel.mesh import make_mesh
    from fbk_fairseq_st_tpu.train.trainer import Trainer

    from .utils import DummyTask, dummy_dictionary, model_args

    task = DummyTask(dummy_dictionary(20))
    args = model_args(
        "conv_transformer", input_feat_per_channel=8,
        encoder_convolutions="[(4,3,3)]*2", encoder_layers=1,
        decoder_layers=1, encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=2048, max_target_positions=32,
        criterion="label_smoothed_cross_entropy", label_smoothing=0.1,
        optimizer="adam", lr=[0.01], lr_scheduler="fixed", seed=3,
        dropout=0.0, attention_dropout=0.0, model_parallel_size=2,
        ring_attention=True,
    )
    registry.apply_architecture(args)
    args.dropout = 0.0
    model = registry.build_model(args, task)
    criterion = registry.CRITERIONS[args.criterion].build_criterion(
        args, task
    )
    trainer = Trainer(args, task, model, criterion, mesh=make_mesh(model=2))
    assert trainer._ring_attention
    CF2 = importlib.import_module("fbk_fairseq_st_tpu.ops.conv_frontend")
    assert CF2._chunk_eligible(
        CF2.ConvFrontendConfig(
            convolutions=((4, 3, 3),) * 2, audio_features=8
        ),
        2048,
    )

    B, T = 4, 2048
    rng = np.random.RandomState(0)
    prev = rng.randint(4, 19, size=(B, 16)).astype(np.int32)
    sample = {
        "net_input": {
            "src_tokens": rng.randn(B, T, 8).astype(np.float32),
            "src_lengths": np.full((B,), T, np.int64),
            "prev_output_tokens": prev,
        },
        "target": np.concatenate(
            [prev[:, 1:], np.full((B, 1), 2)], 1
        ).astype(np.int32),
        "ntokens": B * 16,
        "nsentences": B,
    }
    trainer.train_step([sample])
    jax.block_until_ready(trainer.train_state["params"])
    # reaching here means the composed program compiled and executed
