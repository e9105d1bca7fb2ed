"""Numerical equivalence against the reference torch implementation.

The BLEU-identical north star, provable at test scale: build the
reference's ConvolutionalTransformerModel (torch CPU, loaded straight from
/root/reference with import shims), port its weights into this framework,
and assert that (a) teacher-forced logits match and (b) beam search decodes
the identical token sequences."""

import argparse
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


def _load_reference():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # removed numpy aliases the reference still uses; keep numpy scalar
    # types so numpy.testing keeps working
    np.float = np.float64
    np.double = np.float64
    np.int = np.int64
    np.bool = np.bool_
    np.object = object
    for name in [
        "fairseq.data.data_utils_fast",
        "fairseq.data.token_block_utils_fast",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    from fairseq.models.fairseq_encoder import EncoderOut

    if not hasattr(EncoderOut, "_field_types"):  # removed in py3.9
        EncoderOut._field_types = EncoderOut.__annotations__
    from examples.speech_recognition.models import conv_transformer as ref_ct

    return ref_ct


def make_dict(cls):
    d = cls()
    for i in range(16):
        d.add_symbol(f"w{i}")
    return d


TINY = dict(
    input_feat_per_channel=8,
    max_source_positions=64,
    max_target_positions=32,
    encoder_convolutions="[(4, 3, 3)] * 2",
    criterion="label_smoothed_cross_entropy",
    encoder_layers=2,
    decoder_layers=2,
    encoder_embed_dim=16,
    decoder_embed_dim=16,
    encoder_ffn_embed_dim=32,
    decoder_ffn_embed_dim=32,
    encoder_attention_heads=2,
    decoder_attention_heads=2,
)


def build_reference_model(attn_2d: bool):
    import torch

    ref_ct = _load_reference()
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d = make_dict(RefDictionary)

    class T:
        target_dictionary = d
        source_dictionary = None

    args = argparse.Namespace(**TINY)
    args.encoder_layerdrop = 0
    args.decoder_layerdrop = 0
    args.ctc_compress_out = False
    args.decoder_output_dim = TINY["decoder_embed_dim"]
    args.no_attn_2d = not attn_2d
    args.quant_noise_pq = 0
    ref_ct.base_architecture(args)
    torch.manual_seed(0)
    model = ref_ct.ConvolutionalTransformerModel.build_model(args, T())
    model.eval()
    return model, d


def build_my_model(attn_2d: bool = False):
    import jax

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d = make_dict(Dictionary)

    class T:
        target_dictionary = d
        source_dictionary = None

    args = argparse.Namespace(
        arch="conv_transformer", no_attn_2d=not attn_2d, **TINY
    )
    registry.apply_architecture(args)
    model = registry.build_model(args, T())
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables, d


def port_weights(ref_model, variables):
    """torch state_dict -> this framework's param/state trees."""
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    import jax.numpy as jnp

    p = variables["params"]
    st = variables["state"]

    def lin(dst, prefix):
        dst["w"] = jnp.asarray(sd[prefix + ".weight"].T)
        if prefix + ".bias" in sd:
            dst["b"] = jnp.asarray(sd[prefix + ".bias"])

    def ln(dst, prefix):
        dst["scale"] = jnp.asarray(sd[prefix + ".weight"])
        dst["bias"] = jnp.asarray(sd[prefix + ".bias"])

    def bn(dst_p, dst_s, prefix):
        dst_p["scale"] = jnp.asarray(sd[prefix + ".weight"])
        dst_p["bias"] = jnp.asarray(sd[prefix + ".bias"])
        dst_s["mean"] = jnp.asarray(sd[prefix + ".running_mean"])
        dst_s["var"] = jnp.asarray(sd[prefix + ".running_var"])

    def attn(dst, prefix):
        for mine, ref in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                          ("out", "out_proj")):
            lin(dst[mine], f"{prefix}.{ref}")

    enc = p["encoder"]
    for i in range(2):
        enc["frontend"]["convs"][i]["w"] = jnp.asarray(
            sd[f"encoder.convolutions.{i}.weight"].transpose(2, 3, 1, 0)
        )
        enc["frontend"]["convs"][i]["b"] = jnp.asarray(
            sd[f"encoder.convolutions.{i}.bias"]
        )
        bn(
            enc["frontend"]["bns"][i], st["encoder"]["frontend"]["bns"][i],
            f"encoder.bn.{i}",
        )
    if "attn_2d" in enc["frontend"]:
        for i in range(2):
            blk = enc["frontend"]["attn_2d"][i]
            sblk = st["encoder"]["frontend"]["attn_2d"][i]
            pre = f"encoder.attn_2d.{i}"
            blk["in_proj_w"] = jnp.asarray(
                sd[pre + ".in_proj_weight"].transpose(2, 3, 1, 0)
            )
            blk["in_proj_b"] = jnp.asarray(sd[pre + ".in_proj_bias"])
            blk["out_proj_w"] = jnp.asarray(
                sd[pre + ".out_proj.weight"].transpose(2, 3, 1, 0)
            )
            blk["out_proj_b"] = jnp.asarray(sd[pre + ".out_proj.bias"])
            for name in ("bn_q", "bn_k", "bn_v"):
                bn(blk[name], sblk[name], f"{pre}.{name}")
    lin(enc["fc3"], "encoder.fc3")
    for i in range(TINY["encoder_layers"]):
        lp = enc["layers"][i]
        pre = f"encoder.layers.{i}"
        attn(lp["self_attn"], pre + ".self_attn")
        ln(lp["self_attn_ln"], pre + ".self_attn_layer_norm")
        lin(lp["fc1"], pre + ".fc1")
        lin(lp["fc2"], pre + ".fc2")
        ln(lp["final_ln"], pre + ".final_layer_norm")
    if "encoder.layer_norm.weight" in sd:
        ln(enc["final_ln"], "encoder.layer_norm")

    dec = p["decoder"]
    dec["embed_tokens"]["w"] = jnp.asarray(sd["decoder.embed_tokens.weight"])
    for i in range(TINY["decoder_layers"]):
        lp = dec["layers"][i]
        pre = f"decoder.layers.{i}"
        attn(lp["self_attn"], pre + ".self_attn")
        ln(lp["self_attn_ln"], pre + ".self_attn_layer_norm")
        attn(lp["encoder_attn"], pre + ".encoder_attn")
        ln(lp["encoder_attn_ln"], pre + ".encoder_attn_layer_norm")
        lin(lp["fc1"], pre + ".fc1")
        lin(lp["fc2"], pre + ".fc2")
        ln(lp["final_ln"], pre + ".final_layer_norm")
    if "decoder.layer_norm.weight" in sd:
        ln(dec["final_ln"], "decoder.layer_norm")
    dec["embed_out"] = jnp.asarray(sd["decoder.output_projection.weight"])
    return variables


def make_inputs(seed=0, b=2, t=20, feats=8, tgt_len=6, vocab=20):
    rng = np.random.RandomState(seed)
    fbank = rng.randn(b, t, feats).astype(np.float32)
    lengths = np.array([t, t - 3], np.int64)
    prev = rng.randint(4, vocab, size=(b, tgt_len)).astype(np.int64)
    prev[:, 0] = 2  # eos-as-bos
    return fbank, lengths, prev


@pytest.mark.parametrize("attn_2d", [False, True])
def test_forward_logits_match(attn_2d):
    import torch

    ref_model, _ = build_reference_model(attn_2d)
    my_model, variables, _ = build_my_model(attn_2d)
    variables = port_weights(ref_model, variables)

    fbank, lengths, prev = make_inputs()
    with torch.no_grad():
        ref_out = ref_model(
            torch.tensor(fbank), torch.tensor(lengths), torch.tensor(prev)
        )[0].numpy()

    batch = {
        "src_tokens": fbank,
        "src_lengths": lengths,
        "prev_output_tokens": prev,
    }
    (logits, _), _ = my_model.forward(variables, batch)
    np.testing.assert_allclose(
        np.asarray(logits), ref_out, rtol=2e-4, atol=2e-4
    )


def test_beam_search_outputs_identical():
    """Same weights -> identical beam-5 token sequences (the BLEU-identical
    criterion at test scale)."""
    import torch

    ref_model, ref_dict = build_reference_model(False)
    my_model, variables, my_dict = build_my_model()
    variables = port_weights(ref_model, variables)

    fbank, lengths, _ = make_inputs(seed=3, b=3, t=24)
    lengths = np.array([24, 21, 18], np.int64)

    # reference beam search
    from fairseq.sequence_generator import SequenceGenerator as RefGen

    ref_gen = RefGen([ref_model], ref_dict, beam_size=5, max_len_b=10)
    sample = {
        "net_input": {
            "src_tokens": torch.tensor(fbank),
            "src_lengths": torch.tensor(lengths),
        }
    }
    with torch.no_grad():
        ref_hypos = ref_gen.generate([ref_model], sample)

    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    my_gen = SequenceGenerator(my_dict, beam_size=5, max_len_b=10)
    my_hypos = my_gen.generate(
        [(my_model, variables)],
        {
            "net_input": {"src_tokens": fbank, "src_lengths": lengths},
            "id": np.arange(3),
        },
    )
    for b in range(3):
        ref_tokens = ref_hypos[b][0]["tokens"].numpy().tolist()
        my_tokens = np.asarray(my_hypos[b][0]["tokens"]).tolist()
        assert my_tokens == ref_tokens, (b, my_tokens, ref_tokens)
        np.testing.assert_allclose(
            float(my_hypos[b][0]["score"]),
            float(ref_hypos[b][0]["score"]),
            rtol=1e-3, atol=1e-3,
        )
