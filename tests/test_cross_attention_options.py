"""--cross-self-attention / --no-cross-attention parity with the reference
transformer (fairseq/models/transformer.py:155-158, wired at :583/:740 and
modules/transformer_layer.py:286-307): ported weights -> identical
teacher-forced logits and identical beam decodes (which exercises the
pre-seeded incremental self-attention buffer)."""

import argparse

import numpy as np
import pytest

from .test_reference_equivalence import _load_reference, make_dict


def _build_pair(cross_self: bool, no_cross: bool, seed: int = 0):
    import torch

    import jax

    _load_reference()
    from fairseq.data.dictionary import Dictionary as RefDictionary
    from fairseq.models.transformer import (
        TransformerModel as RefTransformer,
        base_architecture as ref_base,
    )

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = d_ref

    args = argparse.Namespace(
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=64,
        dropout=0.0, encoder_layerdrop=0, decoder_layerdrop=0,
        share_decoder_input_output_embed=False, share_all_embeddings=False,
        encoder_learned_pos=False, decoder_learned_pos=False,
        encoder_layers_to_keep=None, decoder_layers_to_keep=None,
        quant_noise_pq=0, quant_noise_pq_block_size=8, quant_noise_scalar=0,
        cross_self_attention=cross_self, no_cross_attention=no_cross,
    )
    ref_base(args)
    args.cross_self_attention = cross_self
    args.no_cross_attention = no_cross
    torch.manual_seed(seed)
    ref_model = RefTransformer.build_model(args, RT())
    ref_model.eval()

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = d_my

    my_args = argparse.Namespace(
        arch="transformer",
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=64,
        cross_self_attention=cross_self, no_cross_attention=no_cross,
    )
    registry.apply_architecture(my_args)
    my_args.cross_self_attention = cross_self
    my_args.no_cross_attention = no_cross
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    # port weights
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    p = variables["params"]

    def lin(dst, prefix):
        dst["w"] = jnp.asarray(sd[prefix + ".weight"].T)
        if prefix + ".bias" in sd:
            dst["b"] = jnp.asarray(sd[prefix + ".bias"])

    def ln(dst, prefix):
        dst["scale"] = jnp.asarray(sd[prefix + ".weight"])
        dst["bias"] = jnp.asarray(sd[prefix + ".bias"])

    def attn(dst, prefix):
        for mine, ref in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                          ("out", "out_proj")):
            lin(dst[mine], f"{prefix}.{ref}")

    for side, n_layers in (("encoder", 2), ("decoder", 2)):
        tree = p[side]
        tree["embed_tokens"]["w"] = jnp.asarray(
            sd[f"{side}.embed_tokens.weight"]
        )
        for i in range(n_layers):
            lp = tree["layers"][i]
            pre = f"{side}.layers.{i}"
            attn(lp["self_attn"], pre + ".self_attn")
            ln(lp["self_attn_ln"], pre + ".self_attn_layer_norm")
            if side == "decoder" and "encoder_attn" in lp:
                attn(lp["encoder_attn"], pre + ".encoder_attn")
                ln(lp["encoder_attn_ln"], pre + ".encoder_attn_layer_norm")
            lin(lp["fc1"], pre + ".fc1")
            lin(lp["fc2"], pre + ".fc2")
            ln(lp["final_ln"], pre + ".final_layer_norm")
    if "decoder.output_projection.weight" in sd:
        p["decoder"]["embed_out"] = jnp.asarray(
            sd["decoder.output_projection.weight"]
        )
    return ref_model, d_ref, my_model, variables, d_my


@pytest.mark.parametrize(
    "cross_self,no_cross",
    [(True, False), (False, True), (True, True)],
    ids=["cross-self", "no-cross", "cross-self+no-cross"],
)
def test_cross_attention_option_logits(cross_self, no_cross):
    import torch

    ref_model, d_ref, my_model, variables, _ = _build_pair(
        cross_self, no_cross
    )
    rng = np.random.RandomState(7)
    src = rng.randint(4, 20, size=(3, 9)).astype(np.int64)
    src[:, -1] = 2  # eos
    src[2, 6:] = d_ref.pad()  # one padded row exercises the padding concat
    src[2, 5] = 2
    lengths = np.array([9, 9, 6], np.int64)
    prev = rng.randint(4, 20, size=(3, 5)).astype(np.int64)
    prev[:, 0] = 2

    with torch.no_grad():
        ref_logits = ref_model(
            torch.tensor(src), torch.tensor(lengths), torch.tensor(prev)
        )[0].numpy()
    (my_logits, _), _ = my_model.forward(
        variables,
        {"src_tokens": src, "src_lengths": lengths,
         "prev_output_tokens": prev},
    )
    np.testing.assert_allclose(
        np.asarray(my_logits), ref_logits, rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize(
    "cross_self,no_cross", [(True, False)], ids=["cross-self"]
)
def test_cross_self_attention_beam_decode(cross_self, no_cross):
    """Beam-3 decode identity proves the pre-seeded incremental buffer
    (encoder rows at [0, S), decode writes at S + step) matches the
    reference's first-step cat(encoder_out, x) seeding."""
    import torch

    ref_model, d_ref, my_model, variables, d_my = _build_pair(
        cross_self, no_cross
    )
    rng = np.random.RandomState(3)
    src = rng.randint(4, 20, size=(2, 7)).astype(np.int64)
    src[:, -1] = 2
    lengths = np.array([7, 7], np.int64)

    from fairseq.sequence_generator import SequenceGenerator as RefGen

    ref_gen = RefGen([ref_model], d_ref, beam_size=3, max_len_b=8)
    with torch.no_grad():
        ref_hypos = ref_gen.generate(
            [ref_model],
            {"net_input": {"src_tokens": torch.tensor(src),
                           "src_lengths": torch.tensor(lengths)}},
        )

    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    my_gen = SequenceGenerator(d_my, beam_size=3, max_len_b=8)
    my_hypos = my_gen.generate(
        [(my_model, variables)],
        {"net_input": {"src_tokens": src, "src_lengths": lengths},
         "id": np.arange(2)},
    )
    for b in range(2):
        assert (
            np.asarray(my_hypos[b][0]["tokens"]).tolist()
            == ref_hypos[b][0]["tokens"].numpy().tolist()
        ), b
