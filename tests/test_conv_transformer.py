"""conv_transformer model tests: forward contract, incremental decode
equivalence, CTC compression inside the encoder, arch presets.

Closes the reference's test gap: none of the FBK models had tests there
(SURVEY.md §4 note)."""

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.ops.core import RngStream

from .utils import DummyTask, dummy_dictionary, model_args, random_fbank_batch


def build(arch="conv_transformer", src_dict=None, **over):
    task = DummyTask(dummy_dictionary(24), src_dict)
    args = model_args(arch, **over)
    registry.apply_architecture(args)
    model = registry.build_model(args, task)
    return model, task


SMALL = dict(
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
)


def test_forward_shapes_and_subsampling():
    model, task = build(**SMALL)
    variables = model.init(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, random_fbank_batch(np.random.RandomState(0)))
    (logits, extra), new_state = model.forward(variables, batch, training=False)
    b, t_tgt = batch["prev_output_tokens"].shape
    assert logits.shape == (b, t_tgt, len(task.target_dictionary))
    enc = extra["encoder_out"]
    # two stride-2 convs: T' = ceil(T/4); lengths updated per conv
    assert enc.encoder_out.shape[1] == 8  # ceil(32/2)/2
    np.testing.assert_array_equal(
        np.asarray(enc.src_lengths),
        np.ceil(np.ceil(np.asarray(batch["src_lengths"]) / 2) / 2).astype(int),
    )
    # padding mask consistent with lengths
    np.testing.assert_array_equal(
        np.asarray(enc.encoder_padding_mask.sum(axis=1)),
        enc.encoder_out.shape[1] - np.asarray(enc.src_lengths),
    )


def test_train_forward_with_rng_and_bn_state_update():
    model, _ = build(**SMALL)
    variables = model.init(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, random_fbank_batch(np.random.RandomState(1)))
    rng = RngStream(jax.random.PRNGKey(42))
    (_, _), new_state = model.forward(variables, batch, rng=rng, training=True)
    # BN running stats must have moved away from init
    old_mean = variables["state"]["encoder"]["frontend"]["bns"][0]["mean"]
    new_mean = new_state["encoder"]["frontend"]["bns"][0]["mean"]
    assert not np.allclose(np.asarray(old_mean), np.asarray(new_mean))


def test_incremental_decode_matches_full():
    model, _ = build(**SMALL)
    variables = model.init(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, random_fbank_batch(np.random.RandomState(2)))
    enc_out, _ = model.encode(variables, batch["src_tokens"], batch["src_lengths"])

    prev = batch["prev_output_tokens"]
    full_logits, _ = model.decoder(
        variables["params"]["decoder"],
        prev,
        encoder_out=enc_out.encoder_out,
        encoder_padding_mask=enc_out.encoder_padding_mask,
    )

    b, t = prev.shape
    cache = model.init_cache(variables, b, t, enc_out)
    steps = []
    for i in range(t):
        logits, cache, _ = model.decode_step(
            variables, prev[:, i: i + 1], cache, jnp.int32(i), enc_out
        )
        steps.append(logits)
    inc_logits = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(inc_logits), atol=2e-4
    )


def test_ctc_compression_in_encoder():
    src_dict = dummy_dictionary(10)
    model, _ = build(
        src_dict=src_dict,
        ctc_compress_out=True,
        ctc_encoder_layer=1,
        ctc_compress_strategy="avg",
        criterion="ctc_multi_loss",
        **SMALL,
    )
    variables = model.init(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, random_fbank_batch(np.random.RandomState(3)))
    enc_out, _ = model.encode(variables, batch["src_tokens"], batch["src_lengths"])
    assert enc_out.ctc_out is not None
    assert enc_out.ctc_out.shape[-1] == len(src_dict)
    # compressed lengths can only shrink
    assert np.all(np.asarray(enc_out.src_lengths) <= np.asarray(enc_out.ctc_lengths))


def test_arch_presets_fill_expected_dims():
    import argparse

    for arch, dim, ffn, heads in [
        ("conv_transformer", 256, 768, 4),
        ("conv_transformer_big", 512, 1024, 8),
        ("conv_transformer_big2", 512, 2048, 8),
        ("conv_transformer_giant", 1024, 4096, 16),
    ]:
        args = argparse.Namespace(arch=arch)
        registry.apply_architecture(args)
        assert args.encoder_embed_dim == dim
        assert args.encoder_ffn_embed_dim == ffn
        assert args.encoder_attention_heads == heads
        assert args.encoder_convolutions == "[(64, 3, 3)] * 2"


def test_jit_forward_compiles_once():
    model, _ = build(**SMALL)
    variables = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(variables, batch):
        (logits, _), _ = model.forward(variables, batch, training=False)
        return logits

    b1 = jax.tree_util.tree_map(jnp.asarray, random_fbank_batch(np.random.RandomState(4)))
    b2 = jax.tree_util.tree_map(jnp.asarray, random_fbank_batch(np.random.RandomState(5)))
    l1 = fwd(variables, b1)
    l2 = fwd(variables, b2)
    assert fwd._cache_size() == 1
    assert l1.shape == l2.shape
