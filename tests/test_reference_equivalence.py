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
    # conv_transformer_context.py:273 builds EncoderOut without the newer
    # src_tokens/src_lengths fields (written against an older
    # fairseq_encoder) — give them defaults so that code path runs
    if not EncoderOut.__new__.__defaults__:
        EncoderOut.__new__.__defaults__ = (None, None)
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


def test_ctc_compression_encoder_match():
    """CTC-compressed encoder outputs match the reference (ctc_multi_loss
    configuration with in-encoder compression)."""
    import torch

    import jax

    ref_ct = _load_reference()
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d_ref = make_dict(RefDictionary)
    d_ref.add_symbol("<ctc_blank>")

    class RT:
        target_dictionary = d_ref
        source_dictionary = None

    args = argparse.Namespace(**TINY)
    args.criterion = "ctc_multi_loss"
    args.encoder_layerdrop = 0
    args.decoder_layerdrop = 0
    args.ctc_compress_out = True
    args.ctc_encoder_layer = 1
    args.ctc_compress_strategy = "avg"
    args.decoder_output_dim = TINY["decoder_embed_dim"]
    args.no_attn_2d = True
    args.quant_noise_pq = 0
    ref_ct.base_architecture(args)
    args.ctc_compress_out = True  # base_architecture may reset it
    args.criterion = "ctc_multi_loss"
    torch.manual_seed(0)
    ref_model = ref_ct.ConvolutionalTransformerModel.build_model(args, RT())
    ref_model.eval()

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)
    d_my.add_symbol("<ctc_blank>")

    class MT:
        target_dictionary = d_my
        source_dictionary = None

    my_args = argparse.Namespace(
        arch="conv_transformer", no_attn_2d=True, **{
            **TINY, "criterion": "ctc_multi_loss"
        }
    )
    my_args.ctc_compress_out = True
    my_args.ctc_encoder_layer = 1
    my_args.ctc_compress_strategy = "avg"
    registry.apply_architecture(my_args)
    my_args.ctc_compress_out = True
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))
    variables = port_weights(ref_model, variables)
    # ctc head: reference encoder.ctc_fc (raw_state_dict_upgrade moves it)
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    ctc_key = (
        "encoder.ctc_fc" if "encoder.ctc_fc.weight" in sd else "ctc_fc"
    )
    tgt = variables["params"]["encoder"].get("ctc_fc") or variables[
        "params"
    ].get("ctc_fc")
    assert tgt is not None
    tgt["w"] = jnp.asarray(sd[ctc_key + ".weight"].T)
    tgt["b"] = jnp.asarray(sd[ctc_key + ".bias"])

    fbank, lengths, _ = make_inputs(seed=5)
    with torch.no_grad():
        ref_enc = ref_model.encoder(
            torch.tensor(fbank), torch.tensor(lengths)
        )
    enc, _ = my_model.encode(
        variables, jnp.asarray(fbank), jnp.asarray(lengths)
    )
    ref_x = ref_enc.encoder_out.numpy()  # (T', B, C)
    ref_mask = (
        ref_enc.encoder_padding_mask.numpy()
        if ref_enc.encoder_padding_mask is not None else None
    )
    my_x = np.asarray(enc.encoder_out).transpose(1, 0, 2)  # to (T', B, C)
    my_mask = np.asarray(enc.encoder_padding_mask)
    # my fixed-shape output may be wider than the reference's dynamic one:
    # compare the valid region per row
    t_ref = ref_x.shape[0]
    for b in range(ref_x.shape[1]):
        valid = (
            (~ref_mask[b]).sum() if ref_mask is not None else t_ref
        )
        np.testing.assert_allclose(
            my_x[:valid, b], ref_x[:valid, b], rtol=3e-4, atol=3e-4,
            err_msg=f"row {b}",
        )
        assert (~my_mask[b]).sum() == valid


def test_text_transformer_beam_equivalence():
    """fairseq core transformer: ported weights -> matching logits and
    identical beam-3 decodes."""
    import torch

    import jax
    import jax.numpy as jnp

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
        dropout=0.1, encoder_layerdrop=0, decoder_layerdrop=0,
        share_decoder_input_output_embed=False, share_all_embeddings=False,
        encoder_learned_pos=False, decoder_learned_pos=False,
        encoder_layers_to_keep=None, decoder_layers_to_keep=None,
        quant_noise_pq=0, quant_noise_pq_block_size=8, quant_noise_scalar=0,
    )
    ref_base(args)
    torch.manual_seed(0)
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
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

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
            if side == "decoder":
                attn(lp["encoder_attn"], pre + ".encoder_attn")
                ln(lp["encoder_attn_ln"], pre + ".encoder_attn_layer_norm")
            lin(lp["fc1"], pre + ".fc1")
            lin(lp["fc2"], pre + ".fc2")
            ln(lp["final_ln"], pre + ".final_layer_norm")
    if "decoder.output_projection.weight" in sd:
        p["decoder"]["embed_out"] = jnp.asarray(
            sd["decoder.output_projection.weight"]
        )

    rng = np.random.RandomState(7)
    src = rng.randint(4, 20, size=(3, 9)).astype(np.int64)
    src[:, -1] = 2  # eos
    lengths = np.array([9, 9, 9], np.int64)
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
        np.asarray(my_logits), ref_logits, rtol=2e-4, atol=2e-4
    )

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
         "id": np.arange(3)},
    )
    for b in range(3):
        assert (
            np.asarray(my_hypos[b][0]["tokens"]).tolist()
            == ref_hypos[b][0]["tokens"].numpy().tolist()
        ), b


def test_lstm_beam_equivalence():
    """fairseq LSTM (Luong attention, input feeding): ported weights ->
    matching logits and identical beam decodes."""
    import torch

    import jax
    import jax.numpy as jnp

    _load_reference()
    from fairseq.data.dictionary import Dictionary as RefDictionary
    from fairseq.models.lstm import (
        LSTMModel as RefLSTM,
        base_architecture as ref_base,
    )

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = d_ref

    args = argparse.Namespace(
        encoder_embed_dim=16, encoder_hidden_size=16, encoder_layers=1,
        encoder_bidirectional=False, decoder_embed_dim=16,
        decoder_hidden_size=16, decoder_out_embed_dim=16, decoder_layers=1,
        decoder_attention="1", dropout=0.0,
        encoder_dropout_in=0, encoder_dropout_out=0,
        decoder_dropout_in=0, decoder_dropout_out=0,
        max_source_positions=64, max_target_positions=64,
        share_decoder_input_output_embed=False, share_all_embeddings=False,
        adaptive_softmax_cutoff=None, criterion="cross_entropy",
    )
    ref_base(args)
    torch.manual_seed(0)
    ref_model = RefLSTM.build_model(args, RT())
    ref_model.eval()

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = d_my

    my_args = argparse.Namespace(
        arch="lstm", encoder_embed_dim=16, encoder_hidden_size=16,
        encoder_layers=1, decoder_embed_dim=16, decoder_hidden_size=16,
        decoder_out_embed_dim=16, decoder_layers=1, decoder_attention="1",
        max_source_positions=64, max_target_positions=64, dropout=0.0,
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    p = variables["params"]
    p["encoder_embed"]["w"] = jnp.asarray(sd["encoder.embed_tokens.weight"])
    p["decoder_embed"]["w"] = jnp.asarray(sd["decoder.embed_tokens.weight"])
    p["encoder_fwd"][0]["wi"] = jnp.asarray(sd["encoder.lstm.weight_ih_l0"].T)
    p["encoder_fwd"][0]["wh"] = jnp.asarray(sd["encoder.lstm.weight_hh_l0"].T)
    p["encoder_fwd"][0]["b"] = jnp.asarray(
        sd["encoder.lstm.bias_ih_l0"] + sd["encoder.lstm.bias_hh_l0"]
    )
    p["decoder_cells"][0]["wi"] = jnp.asarray(
        sd["decoder.layers.0.weight_ih"].T
    )
    p["decoder_cells"][0]["wh"] = jnp.asarray(
        sd["decoder.layers.0.weight_hh"].T
    )
    p["decoder_cells"][0]["b"] = jnp.asarray(
        sd["decoder.layers.0.bias_ih"] + sd["decoder.layers.0.bias_hh"]
    )
    p["attn_input_proj"]["w"] = jnp.asarray(
        sd["decoder.attention.input_proj.weight"].T
    )
    p["attn_output_proj"]["w"] = jnp.asarray(
        sd["decoder.attention.output_proj.weight"].T
    )
    p["fc_out"]["w"] = jnp.asarray(sd["decoder.fc_out.weight"].T)
    p["fc_out"]["b"] = jnp.asarray(sd["decoder.fc_out.bias"])

    rng = np.random.RandomState(11)
    src = rng.randint(4, 20, size=(2, 7)).astype(np.int64)
    src[:, -1] = 2
    lengths = np.array([7, 7], np.int64)
    prev = rng.randint(4, 20, size=(2, 4)).astype(np.int64)
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

    from fairseq.sequence_generator import SequenceGenerator as RefGen

    ref_gen = RefGen([ref_model], d_ref, beam_size=2, max_len_b=8)
    with torch.no_grad():
        ref_hypos = ref_gen.generate(
            [ref_model],
            {"net_input": {"src_tokens": torch.tensor(src),
                           "src_lengths": torch.tensor(lengths)}},
        )
    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    my_gen = SequenceGenerator(d_my, beam_size=2, max_len_b=8)
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


def test_fconv_beam_equivalence():
    """fairseq ConvS2S (weight-normed GLU convs + fconv attention):
    ported weights -> matching logits and identical beam decodes."""
    import torch

    import jax
    import jax.numpy as jnp

    _load_reference()
    from fairseq.data.dictionary import Dictionary as RefDictionary
    from fairseq.models.fconv import (
        FConvModel as RefFConv,
        base_architecture as ref_base,
    )

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = d_ref

    args = argparse.Namespace(
        encoder_embed_dim=16, decoder_embed_dim=16, decoder_out_embed_dim=16,
        encoder_layers="[(16, 3)] * 2", decoder_layers="[(16, 3)] * 2",
        decoder_attention="True", dropout=0.0,
        max_source_positions=64, max_target_positions=64,
        share_input_output_embed=False,
        encoder_embed_path=None, decoder_embed_path=None,
        criterion="cross_entropy",
    )
    ref_base(args)
    torch.manual_seed(0)
    ref_model = RefFConv.build_model(args, RT())
    ref_model.eval()

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = d_my

    my_args = argparse.Namespace(
        arch="fconv",
        encoder_embed_dim=16, decoder_embed_dim=16, decoder_out_embed_dim=16,
        encoder_layers="[(16, 3)] * 2", decoder_layers="[(16, 3)] * 2",
        decoder_attention="True", dropout=0.0,
        max_source_positions=64, max_target_positions=64,
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    p = variables["params"]

    def wn_linear(prefix):
        """weight-norm reconstruction for Linear: (out, in) -> (in, out)."""
        v = sd[prefix + ".weight_v"]
        g = sd[prefix + ".weight_g"]
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        return (g * v / norm).T

    def wn_conv(prefix):
        """ConvTBC weight norm: v (K, in, out), g (1, 1, out)."""
        v = sd[prefix + ".weight_v"]
        g = sd[prefix + ".weight_g"]
        norm = np.linalg.norm(
            v.reshape(-1, v.shape[-1]), axis=0
        )[None, None, :]
        return g * v / norm

    def set_lin(dst, prefix):
        dst["w"] = jnp.asarray(wn_linear(prefix))
        dst["b"] = jnp.asarray(sd[prefix + ".bias"])

    for side in ("encoder", "decoder"):
        key_embed = f"{side}_embed"
        key_pos = f"{side}_pos"
        p[key_embed]["w"] = jnp.asarray(sd[f"{side}.embed_tokens.weight"])
        ref_pos = sd[f"{side}.embed_positions.weight"]
        mine_pos = np.asarray(p[key_pos]["w"]).copy()
        mine_pos[: ref_pos.shape[0]] = ref_pos
        p[key_pos]["w"] = jnp.asarray(mine_pos)
    set_lin(p["enc_fc1"], "encoder.fc1")
    set_lin(p["enc_fc2"], "encoder.fc2")
    set_lin(p["dec_fc1"], "decoder.fc1")
    set_lin(p["dec_fc2"], "decoder.fc2")
    set_lin(p["dec_fc3"], "decoder.fc3")
    for i in range(2):
        p["enc_convs"][i]["w"] = jnp.asarray(wn_conv(
            f"encoder.convolutions.{i}"
        ))
        p["enc_convs"][i]["b"] = jnp.asarray(
            sd[f"encoder.convolutions.{i}.bias"]
        )
        p["dec_convs"][i]["w"] = jnp.asarray(wn_conv(
            f"decoder.convolutions.{i}"
        ))
        p["dec_convs"][i]["b"] = jnp.asarray(
            sd[f"decoder.convolutions.{i}.bias"]
        )
        set_lin(p["dec_attn"][str(i)]["in_projection"],
                f"decoder.attention.{i}.in_projection")
        set_lin(p["dec_attn"][str(i)]["out_projection"],
                f"decoder.attention.{i}.out_projection")

    rng = np.random.RandomState(13)
    src = rng.randint(4, 20, size=(2, 8)).astype(np.int64)
    src[:, -1] = 2
    lengths = np.array([8, 8], np.int64)
    prev = rng.randint(4, 20, size=(2, 4)).astype(np.int64)
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

    from fairseq.sequence_generator import SequenceGenerator as RefGen

    ref_gen = RefGen([ref_model], d_ref, beam_size=2, max_len_b=8)
    with torch.no_grad():
        ref_hypos = ref_gen.generate(
            [ref_model],
            {"net_input": {"src_tokens": torch.tensor(src),
                           "src_lengths": torch.tensor(lengths)}},
        )
    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    my_gen = SequenceGenerator(d_my, beam_size=2, max_len_b=8)
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


def test_lightconv_beam_equivalence():
    """fairseq LightConv (weight-softmax lightweight conv): ported weights
    -> matching logits and identical beam decodes."""
    import torch

    import jax
    import jax.numpy as jnp

    _load_reference()
    from fairseq.data.dictionary import Dictionary as RefDictionary
    from fairseq.models.lightconv import (
        LightConvModel as RefLightConv,
        base_architecture as ref_base,
    )

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = d_ref

    args = argparse.Namespace(
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_conv_dim=16, decoder_conv_dim=16,
        encoder_glu=True, decoder_glu=True,
        encoder_conv_type="lightweight", decoder_conv_type="lightweight",
        weight_softmax=True, weight_dropout=0.0, dropout=0.0,
        relu_dropout=0.0, input_dropout=0.0, attention_dropout=0.0,
        encoder_kernel_size_list=[3], decoder_kernel_size_list=[3],
        max_source_positions=64, max_target_positions=64,
        share_decoder_input_output_embed=False, share_all_embeddings=False,
        encoder_normalize_before=False, decoder_normalize_before=False,
        encoder_learned_pos=False, decoder_learned_pos=False,
        criterion="cross_entropy", adaptive_softmax_cutoff=None,
    )
    ref_base(args)
    torch.manual_seed(0)
    ref_model = RefLightConv.build_model(args, RT())
    ref_model.eval()

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = d_my

    my_args = argparse.Namespace(
        arch="lightconv",
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_conv_dim=16, decoder_conv_dim=16,
        encoder_glu=True, decoder_glu=True,
        encoder_kernel_size_list="[3]", decoder_kernel_size_list="[3]",
        dropout=0.0, weight_dropout=0.0, relu_dropout=0.0, input_dropout=0.0,
        attention_dropout=0.0,
        max_source_positions=64, max_target_positions=64,
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    p = variables["params"]

    def lin(dst, prefix):
        dst["w"] = jnp.asarray(sd[prefix + ".weight"].T)
        if prefix + ".bias" in sd:
            dst["b"] = jnp.asarray(sd[prefix + ".bias"])

    def ln(dst, prefix):
        dst["scale"] = jnp.asarray(sd[prefix + ".weight"])
        dst["bias"] = jnp.asarray(sd[prefix + ".bias"])

    p["encoder_embed"]["w"] = jnp.asarray(sd["encoder.embed_tokens.weight"])
    p["decoder_embed"]["w"] = jnp.asarray(sd["decoder.embed_tokens.weight"])
    p["embed_out"] = jnp.asarray(sd["decoder.embed_out"])

    el = p["encoder_layers"][0]
    lin(el["linear1"], "encoder.layers.0.linear1")
    el["conv"]["weight"] = jnp.asarray(
        sd["encoder.layers.0.conv.weight"][:, 0, :]
    )
    lin(el["linear2"], "encoder.layers.0.linear2")
    lin(el["fc1"], "encoder.layers.0.fc1")
    lin(el["fc2"], "encoder.layers.0.fc2")
    ln(el["conv_ln"], "encoder.layers.0.layer_norms.0")
    ln(el["final_ln"], "encoder.layers.0.layer_norms.1")

    dl = p["decoder_layers"][0]
    lin(dl["linear1"], "decoder.layers.0.linear1")
    dl["conv"]["weight"] = jnp.asarray(
        sd["decoder.layers.0.conv.weight"][:, 0, :]
    )
    lin(dl["linear2"], "decoder.layers.0.linear2")
    lin(dl["fc1"], "decoder.layers.0.fc1")
    lin(dl["fc2"], "decoder.layers.0.fc2")
    ln(dl["conv_ln"], "decoder.layers.0.conv_layer_norm")
    ln(dl["final_ln"], "decoder.layers.0.final_layer_norm")
    for mine, ref in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("out", "out_proj")):
        lin(dl["encoder_attn"][mine],
            f"decoder.layers.0.encoder_attn.{ref}")
    ln(dl["encoder_attn_ln"], "decoder.layers.0.encoder_attn_layer_norm")

    rng = np.random.RandomState(17)
    src = rng.randint(4, 20, size=(2, 8)).astype(np.int64)
    src[:, -1] = 2
    lengths = np.array([8, 8], np.int64)
    prev = rng.randint(4, 20, size=(2, 4)).astype(np.int64)
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

    from fairseq.sequence_generator import SequenceGenerator as RefGen

    ref_gen = RefGen([ref_model], d_ref, beam_size=2, max_len_b=8)
    with torch.no_grad():
        ref_hypos = ref_gen.generate(
            [ref_model],
            {"net_input": {"src_tokens": torch.tensor(src),
                           "src_lengths": torch.tensor(lengths)}},
        )
    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    my_gen = SequenceGenerator(d_my, beam_size=2, max_len_b=8)
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


_MULTITASK_REF = {
    "conv_transformer_dualdecoder": (
        "conv_transformer_dualdecoder", "ConvolutionalTransformerDualDecoder"
    ),
    "conv_transformer_triangle": (
        "conv_transformer_triangle", "ConvolutionalTransformerTriangle"
    ),
    "conv_transformer_2stage": (
        "conv_transformer_2stage", "ConvolutionalTransformer2Stage"
    ),
}


def _build_and_port_multitask(arch):
    """Build the reference + my multi-task model pair for ``arch``, port
    the weights, and return (ref_model, my_model, variables, src/tgt dicts
    both sides)."""
    import importlib

    import torch

    _load_reference()
    mod_name, cls_name = _MULTITASK_REF[arch]
    ref_mod = importlib.import_module(
        f"examples.speech_recognition.models.{mod_name}"
    )
    from examples.speech_recognition.tasks.speech_translation_ctc import (
        SpeechTranslationCTCTask,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

    tgt_ref = make_dict(RefDictionary)
    src_ref = RefDictionary()
    for i in range(12):
        src_ref.add_symbol(f"s{i}")

    class RefTask(SpeechTranslationCTCTask):
        # shadow the base-class properties; __init__ intentionally skipped
        def __init__(self):
            pass

        source_dictionary = src_ref
        target_dictionary = tgt_ref

    args = argparse.Namespace(**TINY)
    args.encoder_layerdrop = 0
    args.decoder_layerdrop = 0
    args.ctc_compress_out = False
    args.decoder_output_dim = TINY["decoder_embed_dim"]
    args.no_attn_2d = True
    args.quant_noise_pq = 0
    args.auxiliary_decoder_embed_path = None
    ref_mod.base_multilingual_architecture(args)
    torch.manual_seed(0)
    ref_model = getattr(ref_mod, cls_name).build_model(args, RefTask())
    ref_model.eval()

    # -- my model -------------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    tgt_my = make_dict(Dictionary)
    src_my = Dictionary()
    for i in range(12):
        src_my.add_symbol(f"s{i}")

    class MyTask:
        source_dictionary = src_my
        target_dictionary = tgt_my

    my_args = argparse.Namespace(arch=arch, no_attn_2d=True, **TINY)
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MyTask())
    variables = my_model.init(jax.random.PRNGKey(0))

    # encoder + shared target-decoder params (self/cross attn, ffn, embeds)
    variables = port_weights(ref_model, variables)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

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

    if arch == "conv_transformer_triangle":
        # triangle extras on each target-decoder layer
        for i in range(TINY["decoder_layers"]):
            lp = variables["params"]["decoder"]["layers"][i]
            pre = f"decoder.layers.{i}"
            attn(lp["aux_decoder_attn"], pre + ".aux_decoder_attn")
            ln(lp["aux_decoder_attn_ln"], pre + ".aux_decoder_attn_layer_norm")
            lin(lp["fc_concat"], pre + ".fc_concat")

    # auxiliary (transcript) decoder
    aux = variables["params"]["auxiliary_decoder"]
    aux["embed_tokens"]["w"] = jnp.asarray(
        sd["auxiliary_decoder.embed_tokens.weight"]
    )
    for i in range(TINY["decoder_layers"]):
        lp = aux["layers"][i]
        pre = f"auxiliary_decoder.layers.{i}"
        attn(lp["self_attn"], pre + ".self_attn")
        ln(lp["self_attn_ln"], pre + ".self_attn_layer_norm")
        attn(lp["encoder_attn"], pre + ".encoder_attn")
        ln(lp["encoder_attn_ln"], pre + ".encoder_attn_layer_norm")
        lin(lp["fc1"], pre + ".fc1")
        lin(lp["fc2"], pre + ".fc2")
        ln(lp["final_ln"], pre + ".final_layer_norm")
    aux["embed_out"] = jnp.asarray(
        sd["auxiliary_decoder.output_projection.weight"]
    )
    return ref_model, my_model, variables, src_ref, tgt_ref, src_my, tgt_my


@pytest.mark.parametrize("arch", sorted(_MULTITASK_REF))
def test_multitask_forward_equivalence(arch):
    """Multi-task (transcript + translation) models: dualdecoder / DirMul
    (conv_transformer_dualdecoder.py:13-85), triangle
    (conv_transformer_triangle.py:19-105 + triangle_transformer_layer.py
    :16-205, with the second cross-attention + fc_concat), and 2stage
    (conv_transformer_2stage.py:15-93, target decoder attends ONLY to aux
    states). Port the reference torch weights and assert both decoders'
    teacher-forced logits match."""
    import torch

    ref_model, my_model, variables, src_ref, tgt_ref, _, _ = (
        _build_and_port_multitask(arch)
    )

    fbank, lengths, prev = make_inputs()
    rng = np.random.RandomState(7)
    transcript_prev = rng.randint(
        4, len(src_ref), size=(2, 5)
    ).astype(np.int64)
    transcript_prev[:, 0] = 2  # eos-as-bos
    transcript_prev[1, -1] = src_ref.pad()  # exercise aux padding mask

    with torch.no_grad():
        ref_dec, ref_aux = ref_model(
            torch.tensor(fbank),
            torch.tensor(lengths),
            torch.tensor(prev),
            torch.tensor(transcript_prev),
        )
    batch = {
        "src_tokens": fbank,
        "src_lengths": lengths,
        "prev_output_tokens": prev,
        "transcript_prev_output_tokens": transcript_prev,
    }
    (my_dec, my_aux), _ = my_model.forward(variables, batch)
    np.testing.assert_allclose(
        np.asarray(my_aux[0]), ref_aux[0].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(my_dec[0]), ref_dec[0].numpy(), rtol=2e-4, atol=2e-4
    )


def _port_vgg_encoder(ref_enc, enc_p, jnp, torch):
    """Port a reference VGGTransformerEncoder's weights (vggtransformer.py
    :211-333) into my encoder param tree by walking its module lists."""
    from fairseq.modules.transformer_layer import TransformerEncoderLayer

    def lin(dst, mod):
        dst["w"] = jnp.asarray(mod.weight.detach().numpy().T)
        if mod.bias is not None:
            dst["b"] = jnp.asarray(mod.bias.detach().numpy())

    def ln(dst, mod):
        dst["scale"] = jnp.asarray(mod.weight.detach().numpy())
        dst["bias"] = jnp.asarray(mod.bias.detach().numpy())

    for b, block in enumerate(ref_enc.conv_layers):
        ci = li = 0
        for mod in block.layers:
            if isinstance(mod, torch.nn.Conv2d):
                enc_p["vgg"][b]["convs"][ci]["w"] = jnp.asarray(
                    mod.weight.detach().numpy().transpose(2, 3, 1, 0)
                )
                enc_p["vgg"][b]["convs"][ci]["b"] = jnp.asarray(
                    mod.bias.detach().numpy()
                )
                ci += 1
            elif isinstance(mod, torch.nn.LayerNorm):
                ln(enc_p["vgg"][b]["lns"][li], mod)
                li += 1

    def port_tel(dst, mod):
        for mine, ref in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                          ("out", "out_proj")):
            lin(dst["self_attn"][mine], getattr(mod.self_attn, ref))
        ln(dst["self_attn_ln"], mod.self_attn_layer_norm)
        lin(dst["fc1"], mod.fc1)
        lin(dst["fc2"], mod.fc2)
        ln(dst["final_ln"], mod.final_layer_norm)

    mods = list(ref_enc.transformer_layers)
    # trailing Linear + LayerNorm = fc_out / ln_out
    ln(enc_p["ln_out"], mods.pop())
    lin(enc_p["fc_out"], mods.pop())
    layer_idx = 0
    for mod in mods:
        if isinstance(mod, TransformerEncoderLayer):
            port_tel(enc_p["layers"][layer_idx], mod)
            layer_idx += 1
        else:
            lin(enc_p["proj"][str(layer_idx)], mod)


VGG_TINY = dict(
    input_feat_per_channel=8,
    vggblock_enc_config="[(4, 3, 2, 2, True)]",
    transformer_enc_config=(
        "((16, 2, 32, True, 0.0, 0.0, 0.0), (24, 2, 48, True, 0.0, 0.0, 0.0))"
    ),
    # cross-attention requires enc_output_dim == decoder layer dim (all
    # reference presets keep them equal)
    enc_output_dim=16,
    in_channels=1,
    tgt_embed_dim=12,
    transformer_dec_config="((16, 2, 32, True, 0.0, 0.0, 0.0),) * 2",
    conv_dec_config="((16, 3, True),) * 2",
)


def test_vggtransformer_forward_equivalence():
    """asr_vggtransformer (vggtransformer.py:26-212 + 552-712): VGG blocks,
    per-layer-configured transformer encoder with inter-layer projections,
    conv+transformer decoder. Ported weights -> matching teacher-forced
    logits, including a padded target row."""
    import torch

    _load_reference()
    from examples.speech_recognition.models import vggtransformer as ref_vgg
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d_ref = make_dict(RefDictionary)

    class T:
        target_dictionary = d_ref
        source_dictionary = None

    args = argparse.Namespace(**VGG_TINY)
    ref_vgg.base_architecture(args)
    torch.manual_seed(0)
    ref_model = ref_vgg.VGGTransformerModel.build_model(args, T())
    ref_model.eval()

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class T2:
        target_dictionary = d_my
        source_dictionary = None

    my_args = argparse.Namespace(arch="asr_vggtransformer", **VGG_TINY)
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, T2())
    variables = my_model.init(jax.random.PRNGKey(0))

    _port_vgg_encoder(
        ref_model.encoder, variables["params"]["encoder"], jnp, torch
    )

    # decoder
    from fairseq.modules import LinearizedConvolution
    from fairseq.modules.transformer_layer import TransformerDecoderLayer

    dec_p = variables["params"]["decoder"]
    ref_dec = ref_model.decoder
    dec_p["embed_tokens"]["w"] = jnp.asarray(
        ref_dec.embed_tokens.weight.detach().numpy()
    )

    def lin(dst, mod):
        dst["w"] = jnp.asarray(mod.weight.detach().numpy().T)
        if mod.bias is not None:
            dst["b"] = jnp.asarray(mod.bias.detach().numpy())

    def ln(dst, mod):
        dst["scale"] = jnp.asarray(mod.weight.detach().numpy())
        dst["bias"] = jnp.asarray(mod.bias.detach().numpy())

    ci = li = 0
    for mod in ref_dec.conv_layers:
        if isinstance(mod, LinearizedConvolution):
            # weight-normed ConvTBC: w = g * v / ||v|| over (K, in) per out
            g = mod.weight_g.detach().numpy()
            v = mod.weight_v.detach().numpy()
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            dec_p["convs"][ci]["w"] = jnp.asarray(g / norm * v)
            dec_p["convs"][ci]["b"] = jnp.asarray(mod.bias.detach().numpy())
            ci += 1
        elif isinstance(mod, torch.nn.LayerNorm):
            ln(dec_p["conv_lns"][str(li)], mod)
            li += 1

    layer_idx = 0
    for mod in ref_dec.layers:
        if isinstance(mod, TransformerDecoderLayer):
            lp = dec_p["layers"][layer_idx]
            for mine, ref in (("q", "q_proj"), ("k", "k_proj"),
                              ("v", "v_proj"), ("out", "out_proj")):
                lin(lp["self_attn"][mine], getattr(mod.self_attn, ref))
                lin(lp["encoder_attn"][mine], getattr(mod.encoder_attn, ref))
            ln(lp["self_attn_ln"], mod.self_attn_layer_norm)
            ln(lp["encoder_attn_ln"], mod.encoder_attn_layer_norm)
            lin(lp["fc1"], mod.fc1)
            lin(lp["fc2"], mod.fc2)
            ln(lp["final_ln"], mod.final_layer_norm)
            layer_idx += 1
        else:
            lin(dec_p["proj"][str(layer_idx)], mod)
    lin(dec_p["fc_out"], ref_dec.fc_out)

    rng = np.random.RandomState(0)
    fbank = rng.randn(2, 20, 8).astype(np.float32)
    lengths = np.array([20, 13], np.int64)
    prev = np.array([[2, 5, 6, 7, 8, 9], [2, 10, 11, 12, 2, 1]], np.int64)

    with torch.no_grad():
        ref_out = ref_model(
            torch.tensor(fbank), torch.tensor(lengths), torch.tensor(prev)
        )[0].numpy()
    (logits, _), _ = my_model.forward(
        variables,
        {"src_tokens": fbank, "src_lengths": lengths,
         "prev_output_tokens": prev},
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_out, rtol=2e-4, atol=2e-4
    )


def test_vggtransformer_encoder_ctc_equivalence():
    """asr_vggtransformer_encoder (vggtransformer.py:713-880) with
    transformer-context masking and per-layer frame sampling: ported weights
    -> matching CTC logit streams."""
    import torch

    _load_reference()
    from examples.speech_recognition.models import vggtransformer as ref_vgg
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d_ref = make_dict(RefDictionary)

    class T:
        target_dictionary = d_ref
        source_dictionary = None

    args = argparse.Namespace(
        input_feat_per_channel=VGG_TINY["input_feat_per_channel"],
        vggblock_enc_config=VGG_TINY["vggblock_enc_config"],
        transformer_enc_config=VGG_TINY["transformer_enc_config"],
        enc_output_dim=20,
        in_channels=1,
        transformer_context="(4, 6)",
        transformer_sampling="(2, 1)",
    )
    torch.manual_seed(0)
    ref_model = ref_vgg.VGGTransformerEncoderModel.build_model(args, T())
    ref_model.eval()

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class T2:
        target_dictionary = d_my
        source_dictionary = None

    my_args = argparse.Namespace(
        arch="asr_vggtransformer_encoder",
        input_feat_per_channel=8,
        vggblock_enc_config=VGG_TINY["vggblock_enc_config"],
        transformer_enc_config=VGG_TINY["transformer_enc_config"],
        enc_output_dim=20,
        in_channels=1,
        transformer_context="(4, 6)",
        transformer_sampling="(2, 1)",
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, T2())
    variables = my_model.init(jax.random.PRNGKey(0))

    _port_vgg_encoder(
        ref_model.encoder, variables["params"]["encoder"], jnp, torch
    )
    variables["params"]["fc_out"]["w"] = jnp.asarray(
        ref_model.encoder.fc_out.weight.detach().numpy().T
    )
    variables["params"]["fc_out"]["b"] = jnp.asarray(
        ref_model.encoder.fc_out.bias.detach().numpy()
    )

    rng = np.random.RandomState(3)
    fbank = rng.randn(2, 20, 8).astype(np.float32)
    lengths = np.array([20, 13], np.int64)
    with torch.no_grad():
        ref_out = ref_model.encoder(
            torch.tensor(fbank), torch.tensor(lengths)
        )["encoder_out"].numpy()  # (T, B, V)
    enc, _ = my_model.encode(variables, fbank, lengths)
    np.testing.assert_allclose(
        np.asarray(enc.ctc_out),
        ref_out.transpose(1, 0, 2),
        rtol=2e-4, atol=2e-4,
    )


def test_lsce_criterion_loss_equivalence():
    """Training-objective parity: same weights + same batch -> identical
    label-smoothed cross-entropy loss (fairseq/criterions/
    label_smoothed_cross_entropy.py:12-75)."""
    import torch

    _load_reference()
    from fairseq.criterions.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion as RefLSCE,
    )

    ref_model, d_ref = build_reference_model(attn_2d=False)
    my_model, variables, d_my = build_my_model(attn_2d=False)
    variables = port_weights(ref_model, variables)

    fbank, lengths, prev = make_inputs()
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2  # eos
    target[1, -2:] = d_ref.pad()  # padded tail in one row

    class RT:
        target_dictionary = d_ref

    ref_crit = RefLSCE(RT(), sentence_avg=False, label_smoothing=0.1)
    sample = {
        "net_input": {
            "src_tokens": torch.tensor(fbank),
            "src_lengths": torch.tensor(lengths),
            "prev_output_tokens": torch.tensor(prev),
        },
        "target": torch.tensor(target),
        "ntokens": int((target != d_ref.pad()).sum()),
    }
    with torch.no_grad():
        ref_loss, ref_ss, ref_log = ref_crit(ref_model, sample)

    from fbk_fairseq_st_tpu.criterions.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
    )

    class MT:
        target_dictionary = d_my
        source_dictionary = None

    my_crit = LabelSmoothedCrossEntropyCriterion(
        MT(), argparse.Namespace(label_smoothing=0.1, sentence_avg=False)
    )
    batch = {
        "src_tokens": fbank,
        "src_lengths": lengths,
        "prev_output_tokens": prev,
        "target": target,
    }
    my_loss, my_ss, my_log, _ = my_crit(my_model, variables, batch)
    assert int(my_ss) == int(ref_ss)
    np.testing.assert_allclose(
        float(my_loss), float(ref_loss), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(my_log["nll_loss"]), float(ref_log["nll_loss"]), rtol=2e-4
    )


def test_ctc_multi_loss_equivalence():
    """FBK headline training objective (examples/speech_recognition/
    criterions/ctc_multi_loss.py:108-170 + CTC_loss.py:101-175): CTC on the
    compressed encoder's source-dictionary head + label-smoothed CE on the
    decoder, combined with --ctc-weight. Ported weights -> identical total /
    ctc / nll losses."""
    import torch

    ref_ct = _load_reference()
    from examples.speech_recognition.criterions.ctc_multi_loss import (
        CTCMultiLoss as RefCTCMultiLoss,
    )
    from examples.speech_recognition.tasks.speech_translation_ctc import (
        SpeechTranslationCTCTask,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

    tgt_ref = make_dict(RefDictionary)
    src_ref = RefDictionary()
    for i in range(12):
        src_ref.add_symbol(f"s{i}")
    src_ref.add_symbol("<ctc_blank>")

    class RefTask(SpeechTranslationCTCTask):
        def __init__(self):
            pass

        source_dictionary = src_ref
        target_dictionary = tgt_ref

    args = argparse.Namespace(**TINY)
    args.criterion = "ctc_multi_loss"
    args.underlying_criterion = "label_smoothed_cross_entropy"
    args.label_smoothing = 0.1
    args.sentence_avg = False
    args.use_source_side_sample_size = False
    args.ctc_weight = 0.5
    args.ctc_encoder_layer = 1
    args.ctc_compress_strategy = "avg"
    args.ctc_compress_out = True
    args.encoder_layerdrop = 0
    args.decoder_layerdrop = 0
    args.decoder_output_dim = TINY["decoder_embed_dim"]
    args.no_attn_2d = True
    args.quant_noise_pq = 0
    ref_ct.base_architecture(args)
    args.ctc_compress_out = True
    args.criterion = "ctc_multi_loss"
    torch.manual_seed(0)
    ref_model = ref_ct.ConvolutionalTransformerModel.build_model(
        args, RefTask()
    )
    ref_model.eval()
    ref_crit = RefCTCMultiLoss(args, RefTask())

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    tgt_my = make_dict(Dictionary)
    src_my = Dictionary()
    for i in range(12):
        src_my.add_symbol(f"s{i}")
    src_my.add_symbol("<ctc_blank>")

    class MyTask:
        source_dictionary = src_my
        target_dictionary = tgt_my

    my_args = argparse.Namespace(
        arch="conv_transformer", no_attn_2d=True,
        **{**TINY, "criterion": "ctc_multi_loss"},
    )
    my_args.underlying_criterion = "label_smoothed_cross_entropy"
    my_args.label_smoothing = 0.1
    my_args.sentence_avg = False
    my_args.ctc_weight = 0.5
    my_args.ctc_encoder_layer = 1
    my_args.ctc_compress_strategy = "avg"
    my_args.ctc_compress_out = True
    registry.apply_architecture(my_args)
    my_args.ctc_compress_out = True
    my_model = registry.build_model(my_args, MyTask())
    variables = my_model.init(jax.random.PRNGKey(0))
    variables = port_weights(ref_model, variables)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    ctc_fc = variables["params"]["encoder"]["ctc_fc"]
    ctc_fc["w"] = jnp.asarray(sd["encoder.ctc_fc.weight"].T)
    ctc_fc["b"] = jnp.asarray(sd["encoder.ctc_fc.bias"])

    my_crit = registry.CRITERIONS["ctc_multi_loss"].build_criterion(
        my_args, MyTask()
    )

    fbank, lengths, prev = make_inputs()
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2
    target[1, -2:] = tgt_ref.pad()
    rng = np.random.RandomState(11)
    transcript = rng.randint(4, 16, size=(2, 4)).astype(np.int64)
    transcript_lengths = np.array([4, 3], np.int64)
    transcript[1, 3:] = src_ref.pad()

    sample = {
        "net_input": {
            "src_tokens": torch.tensor(fbank),
            "src_lengths": torch.tensor(lengths),
            "prev_output_tokens": torch.tensor(prev),
        },
        "target": torch.tensor(target),
        "ntokens": int((target != tgt_ref.pad()).sum()),
        "transcript_target": torch.tensor(transcript),
        "transcript_target_lengths": torch.tensor(transcript_lengths),
    }
    with torch.no_grad():
        ref_loss, _, ref_log = ref_crit(ref_model, sample)

    batch = {
        "src_tokens": fbank,
        "src_lengths": lengths,
        "prev_output_tokens": prev,
        "target": target,
        "transcript_target": transcript,
        "transcript_target_lengths": transcript_lengths,
    }
    my_loss, _, my_log, _ = my_crit(my_model, variables, batch)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=3e-4)
    np.testing.assert_allclose(
        float(my_log["ctc_loss"]), float(ref_log["ctc_loss"]), rtol=3e-4
    )
    np.testing.assert_allclose(
        float(my_log["nll_loss"]), float(ref_log["nll_loss"]), rtol=3e-4
    )


def test_gradient_equivalence():
    """Training-step parity at the gradient level: d(loss)/d(params) matches
    the reference for representative parameters across the stack (frontend
    conv, encoder attention, decoder FFN, embeddings, output projection).
    With matching losses AND gradients, an identically-configured optimizer
    takes the identical first step."""
    import torch

    _load_reference()
    from fairseq.criterions.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion as RefLSCE,
    )

    # eval mode: dropout off, BatchNorm on running stats — autograd still
    # flows, matching my deterministic forward exactly
    ref_model, d_ref = build_reference_model(attn_2d=False)

    my_model, variables, d_my = build_my_model(attn_2d=False)
    variables = port_weights(ref_model, variables)

    fbank, lengths, prev = make_inputs()
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2
    target[1, -2:] = d_ref.pad()

    class RT:
        target_dictionary = d_ref

    ref_crit = RefLSCE(RT(), sentence_avg=False, label_smoothing=0.1)
    sample = {
        "net_input": {
            "src_tokens": torch.tensor(fbank),
            "src_lengths": torch.tensor(lengths),
            "prev_output_tokens": torch.tensor(prev),
        },
        "target": torch.tensor(target),
        "ntokens": int((target != d_ref.pad()).sum()),
    }
    ref_loss, _, _ = ref_crit(ref_model, sample)
    ref_model.zero_grad()
    ref_loss.backward()
    ref_grads = {
        k: v.grad.detach().numpy()
        for k, v in ref_model.named_parameters()
        if v.grad is not None
    }

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.criterions.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
    )

    class MT:
        target_dictionary = d_my
        source_dictionary = None

    my_crit = LabelSmoothedCrossEntropyCriterion(
        MT(), argparse.Namespace(label_smoothing=0.1, sentence_avg=False)
    )
    batch = {
        "src_tokens": jnp.asarray(fbank),
        "src_lengths": jnp.asarray(lengths),
        "prev_output_tokens": jnp.asarray(prev),
        "target": jnp.asarray(target),
    }

    def loss_fn(params):
        v = {"params": params, "state": variables["state"]}
        loss, _, _, _ = my_crit(my_model, v, batch)
        return loss

    my_grads = jax.grad(loss_fn)(variables["params"])

    checks = [
        # (my pytree path, ref param name, transform to my layout)
        (my_grads["decoder"]["embed_out"],
         "decoder.output_projection.weight", lambda a: a),
        (my_grads["decoder"]["embed_tokens"]["w"],
         "decoder.embed_tokens.weight", lambda a: a),
        (my_grads["decoder"]["layers"][0]["fc1"]["w"],
         "decoder.layers.0.fc1.weight", lambda a: a.T),
        (my_grads["decoder"]["layers"][1]["encoder_attn"]["q"]["w"],
         "decoder.layers.1.encoder_attn.q_proj.weight", lambda a: a.T),
        (my_grads["encoder"]["layers"][0]["self_attn"]["v"]["w"],
         "encoder.layers.0.self_attn.v_proj.weight", lambda a: a.T),
        (my_grads["encoder"]["layers"][1]["final_ln"]["scale"],
         "encoder.layers.1.final_layer_norm.weight", lambda a: a),
        (my_grads["encoder"]["fc3"]["w"], "encoder.fc3.weight", lambda a: a.T),
        (my_grads["encoder"]["frontend"]["convs"][0]["w"],
         "encoder.convolutions.0.weight",
         lambda a: a.transpose(2, 3, 1, 0)),
    ]
    for mine, ref_name, tr in checks:
        want = tr(ref_grads[ref_name])
        got = np.asarray(mine)
        scale = max(np.abs(want).max(), 1e-8)
        np.testing.assert_allclose(
            got / scale, want / scale, atol=2e-4, err_msg=ref_name
        )

    # -- one Adam step: updated weights identical --------------------------
    # compute MY update first and materialize it: ported jax params can
    # alias torch storage on the CPU backend (zero-copy .numpy()), and
    # torch's opt.step() mutates that storage in place
    lr = 1e-3
    from fbk_fairseq_st_tpu.registry import OPTIMIZERS

    tx = OPTIMIZERS["adam"].build_optimizer(
        argparse.Namespace(adam_betas="(0.9, 0.98)", adam_eps=1e-8,
                           weight_decay=0.0)
    )
    opt_state = tx.init(variables["params"])
    delta, _ = tx.update(my_grads, opt_state, variables["params"])
    new_params = jax.tree_util.tree_map(
        lambda p, d: np.array(p - lr * d), variables["params"], delta
    )

    opt = torch.optim.Adam(
        ref_model.parameters(), lr=lr, betas=(0.9, 0.98), eps=1e-8
    )
    opt.step()
    ref_after = {
        k: v.detach().numpy() for k, v in ref_model.named_parameters()
    }
    after_checks = [
        (new_params["decoder"]["embed_out"],
         "decoder.output_projection.weight", lambda a: a),
        (new_params["decoder"]["layers"][0]["fc1"]["w"],
         "decoder.layers.0.fc1.weight", lambda a: a.T),
        (new_params["encoder"]["frontend"]["convs"][0]["w"],
         "encoder.convolutions.0.weight", lambda a: a.transpose(2, 3, 1, 0)),
        (new_params["encoder"]["layers"][1]["final_ln"]["scale"],
         "encoder.layers.1.final_layer_norm.weight", lambda a: a),
    ]
    for mine, ref_name, tr in after_checks:
        np.testing.assert_allclose(
            np.asarray(mine), tr(ref_after[ref_name]), rtol=0, atol=5e-5,
            err_msg="post-step " + ref_name,
        )


@pytest.mark.parametrize("attention_type", ["sequential", "parallel"])
def test_context_model_forward_equivalence(attention_type):
    """INTERSPEECH 2020 context-aware model (conv_transformer_context.py
    :25-97 + conv_transformer_context_layer.py:11-287): previous-target
    context encoder + sigma-gated context cross-attention in both encoder
    and decoder, sequential and parallel gating modes. Ported weights ->
    matching teacher-forced logits."""
    import torch

    _load_reference()
    from examples.speech_recognition.models import (
        conv_transformer_context as ref_ctx,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = None

    args = argparse.Namespace(**TINY)
    args.encoder_layerdrop = 0
    args.decoder_layerdrop = 0
    args.ctc_compress_out = False
    args.decoder_output_dim = TINY["decoder_embed_dim"]
    args.no_attn_2d = True
    args.quant_noise_pq = 0
    args.context_type = "tgt"
    args.context_encoder_layers = 1
    args.context_position = "both"
    args.context_decoder_attention_type = attention_type
    args.pretrained_model = None
    ref_ctx.base_architecture(args)
    args.context_type = "tgt"
    torch.manual_seed(0)
    ref_model = (
        ref_ctx.ConvolutionalTransformerContextAwareModel.build_model(
            args, RT()
        )
    )
    ref_model.eval()
    # the reference context decoder was written against an older core
    # TransformerDecoder that had this attribute
    ref_model.decoder.layer_wise_attention = False

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = None

    my_args = argparse.Namespace(
        arch="conv_transformer_context", no_attn_2d=True, **TINY
    )
    my_args.context_type = "tgt"
    my_args.context_encoder_layers = 1
    my_args.context_position = "both"
    my_args.context_decoder_attention_type = attention_type
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    variables = port_weights(ref_model, variables)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

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

    def ctx_block(dst, prefix, ln_name):
        attn(dst["context_attn"], prefix + ".context_attn")
        lin(dst["context_gating_wi"], prefix + ".context_gating_wi")
        lin(dst["context_gating_ws"], prefix + ".context_gating_ws")
        ln(dst["context_ln"], f"{prefix}.{ln_name}")

    for i in range(TINY["encoder_layers"]):
        ctx_block(
            variables["params"]["encoder"]["layers"][i],
            f"encoder.layers.{i}", "context_layer_norm",
        )
    for i in range(TINY["decoder_layers"]):
        ctx_block(
            variables["params"]["decoder"]["layers"][i],
            f"decoder.layers.{i}", "context_attn_layer_norm",
        )
    # context encoder: shares decoder.embed_tokens; 1 transformer layer
    ctxp = variables["params"]["context_encoder"]["layers"][0]
    pre = "context_encoder.layers.0"
    attn(ctxp["self_attn"], pre + ".self_attn")
    ln(ctxp["self_attn_ln"], pre + ".self_attn_layer_norm")
    lin(ctxp["fc1"], pre + ".fc1")
    lin(ctxp["fc2"], pre + ".fc2")
    ln(ctxp["final_ln"], pre + ".final_layer_norm")

    fbank, lengths, prev = make_inputs()
    ctx = np.array([[2, 5, 6, 7], [2, 8, 9, 1]], np.int64)
    ctx_lengths = np.array([4, 3], np.int64)

    with torch.no_grad():
        ref_out = ref_model(
            torch.tensor(fbank),
            torch.tensor(lengths),
            torch.tensor(prev),
            torch.tensor(ctx),
            torch.tensor(ctx_lengths),
        )[0].numpy()
    (logits, _), _ = my_model.forward(
        variables,
        {
            "src_tokens": fbank,
            "src_lengths": lengths,
            "prev_output_tokens": prev,
            "context_tokens": ctx,
            "context_lengths": ctx_lengths,
        },
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_out, rtol=3e-4, atol=3e-4
    )


def test_kd_criterion_loss_equivalence():
    """Knowledge-distillation objective (fairseq/criterions/
    knowledge_distillation.py:17-99): loss = (1-l)*NLL + l*CE(student vs
    teacher top-k), both temperature-scaled. Ported weights + synthetic
    teacher top-k -> identical loss."""
    import torch

    _load_reference()
    from fairseq.criterions.knowledge_distillation import (
        CrossEntropyKnowledgeDistillationCriterion as RefKD,
    )

    ref_model, d_ref = build_reference_model(attn_2d=False)
    my_model, variables, d_my = build_my_model(attn_2d=False)
    variables = port_weights(ref_model, variables)

    fbank, lengths, prev = make_inputs()
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2
    target[1, -2:] = d_ref.pad()
    rng = np.random.RandomState(13)
    k = 4
    teacher_idxs = rng.randint(0, 20, size=(2, prev.shape[1], k)).astype(
        np.int64
    )
    teacher_outs = rng.randn(2, prev.shape[1], k).astype(np.float32)

    class RT:
        target_dictionary = d_ref

    ref_args = argparse.Namespace(
        kd_lambda=0.5, kd_temperature=2.0, sentence_avg=False
    )
    ref_crit = RefKD(ref_args, RT())
    sample = {
        "net_input": {
            "src_tokens": torch.tensor(fbank),
            "src_lengths": torch.tensor(lengths),
            "prev_output_tokens": torch.tensor(prev),
        },
        "target": torch.tensor(target),
        "ntokens": int((target != d_ref.pad()).sum()),
        "teacher_output": (
            torch.tensor(teacher_idxs), torch.tensor(teacher_outs)
        ),
    }
    with torch.no_grad():
        ref_loss, ref_ss, _ = ref_crit(ref_model, sample)

    from fbk_fairseq_st_tpu.registry import CRITERIONS

    class MT:
        target_dictionary = d_my
        source_dictionary = None

    my_crit = CRITERIONS["knowledge_distillation"].build_criterion(
        argparse.Namespace(
            kd_lambda=0.5, kd_temperature=2.0, sentence_avg=False
        ),
        MT(),
    )
    my_loss, my_ss, _, _ = my_crit(
        my_model,
        variables,
        {
            "src_tokens": fbank,
            "src_lengths": lengths,
            "prev_output_tokens": prev,
            "target": target,
            "teacher_idxs": teacher_idxs,
            "teacher_probs": teacher_outs,
        },
    )
    assert int(my_ss) == int(ref_ss)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=2e-4)


@pytest.mark.parametrize("arch", sorted(_MULTITASK_REF))
def test_twophase_joint_decoding_equivalence(arch):
    """FBK two-phase joint inference (twophase_sequence_generator.py
    :52-996): phase-1 transcript beam search, phase-2 translation beam
    search seeded with the transcript scores (HierarchicalBeamSearch).
    Same ported weights -> identical transcript + translation token
    sequences and matching joint scores, for all three multi-task
    variants."""
    import torch

    ref_model, my_model, variables, src_ref, tgt_ref, src_my, tgt_my = (
        _build_and_port_multitask(arch)
    )
    from examples.speech_recognition.twophase_sequence_generator import (
        TwoPhaseSequenceGenerator as RefTwoPhase,
    )

    fbank, lengths, _ = make_inputs(seed=21)
    sample = {
        "net_input": {
            "src_tokens": torch.tensor(fbank),
            "src_lengths": torch.tensor(lengths),
        },
        "id": torch.arange(2),
    }
    ref_gen = RefTwoPhase(
        [ref_model], src_ref, tgt_ref, beam_size=2, max_len_b=8
    )
    with torch.no_grad():
        ref_hypos = ref_gen.generate([ref_model], sample)

    from fbk_fairseq_st_tpu.generation.twophase_sequence_generator import (
        TwoPhaseSequenceGenerator,
    )

    my_gen = TwoPhaseSequenceGenerator(
        src_my, tgt_my, beam_size=2, max_len_b=8
    )
    my_hypos = my_gen.generate(
        [(my_model, variables)],
        {"net_input": {"src_tokens": fbank, "src_lengths": lengths},
         "id": np.arange(2)},
    )
    for b in range(2):
        ref_best = ref_hypos[b][0]
        my_best = my_hypos[b][0]
        assert (
            np.asarray(my_best["tokens"]).tolist()
            == ref_best["tokens"].numpy().tolist()
        ), f"sent {b} target tokens"
        assert (
            np.asarray(my_best["transcript_tokens"]).tolist()
            == ref_best["aux_tokens"].numpy().tolist()
        ), f"sent {b} transcript tokens"
        np.testing.assert_allclose(
            float(my_best["score"]), float(ref_best["score"]), rtol=1e-3,
            err_msg=f"sent {b} joint score",
        )


@pytest.mark.parametrize("simul_type", ["hard_aligned", "infinite_lookback",
                                        "waitk"])
def test_monotonic_transformer_equivalence(simul_type):
    """Simultaneous translation MMA (examples/simultaneous_translation/
    models/transformer_monotonic_attention.py + modules/
    monotonic_multihead_attention.py): unidirectional encoder + monotonic
    cross-attention decoder. Ported weights -> matching teacher-forced
    logits, per-layer expected alignments (alpha), and the latency-augmented
    training loss (utils/latency.py)."""
    import torch

    _load_reference()
    from examples.simultaneous_translation.models import (  # noqa: F401
        transformer_monotonic_attention as ref_mono,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

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
        dropout=0.1, encoder_layerdrop=0, decoder_layerdrop=0,
        share_decoder_input_output_embed=False, share_all_embeddings=False,
        encoder_learned_pos=False, decoder_learned_pos=False,
        encoder_layers_to_keep=None, decoder_layers_to_keep=None,
        quant_noise_pq=0, quant_noise_pq_block_size=8, quant_noise_scalar=0,
        simul_type=simul_type,
        mass_preservation=True,
        noise_mean=0.0, noise_var=1.0,
        energy_bias=False, energy_bias_init=-2.0, attention_eps=1e-6,
        waitk_lagging=3 if simul_type == "waitk" else 0,
    )
    ref_mono.base_monotonic_rchitecture(args)
    torch.manual_seed(0)
    ref_model = ref_mono.TransformerMonotonicModel.build_model(args, RT())
    ref_model.eval()

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = d_my

    my_args = argparse.Namespace(
        arch="transformer_monotonic",
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=64,
        simul_type=simul_type, mass_preservation=True,
        waitk_lagging=3 if simul_type == "waitk" else 0,
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

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

    enc = p["encoder"]
    enc["embed_tokens"]["w"] = jnp.asarray(sd["encoder.embed_tokens.weight"])
    for i in range(2):
        lp = enc["layers"][i]
        pre = f"encoder.layers.{i}"
        attn(lp["self_attn"], pre + ".self_attn")
        ln(lp["self_attn_ln"], pre + ".self_attn_layer_norm")
        lin(lp["fc1"], pre + ".fc1")
        lin(lp["fc2"], pre + ".fc2")
        ln(lp["final_ln"], pre + ".final_layer_norm")

    dec = p["decoder"]
    dec["embed_tokens"]["w"] = jnp.asarray(sd["decoder.embed_tokens.weight"])
    for i in range(2):
        lp = dec["layers"][i]
        pre = f"decoder.layers.{i}"
        attn(lp["self_attn"], pre + ".self_attn")
        ln(lp["self_attn_ln"], pre + ".self_attn_layer_norm")
        ln(lp["encoder_attn_ln"], pre + ".encoder_attn_layer_norm")
        lin(lp["fc1"], pre + ".fc1")
        lin(lp["fc2"], pre + ".fc2")
        ln(lp["final_ln"], pre + ".final_layer_norm")
        # monotonic cross-attention projections
        mono = lp["encoder_attn"]
        lin(mono["q"], pre + ".encoder_attn.q_proj")
        lin(mono["k"], pre + ".encoder_attn.k_proj")
        lin(mono["v"], pre + ".encoder_attn.v_proj")
        lin(mono["out"], pre + ".encoder_attn.out_proj")
        if simul_type == "infinite_lookback":
            lin(mono["q_soft"], pre + ".encoder_attn.q_proj_soft")
            lin(mono["k_soft"], pre + ".encoder_attn.k_proj_soft")
    dec["embed_out"] = jnp.asarray(sd["decoder.output_projection.weight"])

    rng = np.random.RandomState(7)
    src = rng.randint(4, 20, size=(2, 9)).astype(np.int64)
    src[:, -1] = 2
    src[1, 7:] = d_ref.pad()  # right-padded short row
    src[1, 6] = 2
    lengths = np.array([9, 7], np.int64)
    prev = rng.randint(4, 20, size=(2, 5)).astype(np.int64)
    prev[:, 0] = 2
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2
    target[1, -1:] = d_ref.pad()

    with torch.no_grad():
        ref_logits, ref_extra = ref_model(
            torch.tensor(src), torch.tensor(lengths), torch.tensor(prev)
        )
    (my_logits, my_extra), _ = my_model.forward(
        variables,
        {"src_tokens": src, "src_lengths": lengths,
         "prev_output_tokens": prev},
    )
    np.testing.assert_allclose(
        np.asarray(my_logits), ref_logits.numpy(), rtol=3e-4, atol=3e-4
    )
    for layer in range(2):
        np.testing.assert_allclose(
            np.asarray(my_extra["attn_list"][layer]["alpha"]),
            ref_extra["attn_list"][layer]["alpha"].numpy(),
            rtol=3e-4, atol=3e-4, err_msg=f"alpha layer {layer}",
        )

    # latency-augmented loss parity
    from examples.simultaneous_translation.utils.latency import (
        LatencyTraining,
    )

    ref_latency = LatencyTraining(
        0.5, 0.5, "differentiable_average_lagging", "variance_delay",
        True, "weighted_average",
    )
    ref_alphas = [item["alpha"] for item in ref_extra["attn_list"]]
    tgt_pad_mask = torch.tensor(target == d_ref.pad())
    src_pad_mask = torch.tensor(src == d_ref.pad())
    with torch.no_grad():
        ref_lat = ref_latency.loss(
            ref_alphas, source_padding_mask=src_pad_mask,
            target_padding_mask=tgt_pad_mask,
        )

    from fbk_fairseq_st_tpu.ops.latency import latency_training_loss

    my_lat = latency_training_loss(
        [item["alpha"] for item in my_extra["attn_list"]],
        source_padding_mask=src == d_my.pad(),
        target_padding_mask=target == d_my.pad(),
        avg_weight=0.5, var_weight=0.5,
    )
    np.testing.assert_allclose(
        float(my_lat), float(ref_lat), rtol=3e-4, err_msg="latency loss"
    )


@pytest.mark.parametrize("method", ["hMoEup", "sMoEup", "hMoElp", "sMoElp"])
def test_translation_moe_loss_equivalence(method):
    """Mixture-of-experts translation (examples/translation_moe/src/
    translation_moe.py:16-185 + logsumexp_moe.py + mean_pool_gating_network
    .py): EM responsibilities + hard/soft mixture loss with uniform or
    learned (mean-pool gating) prior. Ported weights -> identical loss."""
    import torch

    _load_reference()
    from examples.translation_moe.src.translation_moe import (
        TranslationMoETask as RefMoETask,
    )
    from fairseq.criterions.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion as RefLSCE,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary
    from fairseq.models.transformer import (
        TransformerModel as RefTransformer,
        base_architecture as ref_base,
    )

    d_ref = make_dict(RefDictionary)

    ref_args = argparse.Namespace(
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=64,
        dropout=0.1, encoder_layerdrop=0, decoder_layerdrop=0,
        share_decoder_input_output_embed=False, share_all_embeddings=False,
        encoder_learned_pos=False, decoder_learned_pos=False,
        encoder_layers_to_keep=None, decoder_layers_to_keep=None,
        quant_noise_pq=0, quant_noise_pq_block_size=8, quant_noise_scalar=0,
        method=method, num_experts=2, sentence_avg=False,
        mean_pool_gating_network=method.endswith("lp"),
        mean_pool_gating_network_dropout=0.0,
        mean_pool_gating_network_encoder_dim=None,
        gen_expert=0,
        left_pad_source=False, left_pad_target=False,
        source_lang="en", target_lang="de", data="/nonexistent",
    )
    ref_base(ref_args)
    ref_task = RefMoETask(ref_args, d_ref, d_ref)
    torch.manual_seed(0)
    ref_model = RefTransformer.build_model(ref_args, ref_task)
    ref_model = ref_task.build_model.__wrapped__(ref_task, ref_args) if False \
        else ref_model
    # attach the gating network the way the reference task does
    ref_model = ref_task.build_model(ref_args) if False else ref_model
    if not ref_task.uniform_prior:
        from examples.translation_moe.src.mean_pool_gating_network import (
            MeanPoolGatingNetwork,
        )

        torch.manual_seed(1)
        ref_model.gating_network = MeanPoolGatingNetwork(16, 2, 0.0)
    ref_model.eval()
    ref_crit = RefLSCE(ref_task, sentence_avg=False, label_smoothing=0.1)

    # -- my side --------------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.tasks.translation_moe import TranslationMoETask

    d_my = make_dict(Dictionary)
    my_task_args = argparse.Namespace(
        method=method, num_experts=2, sentence_avg=False,
        mean_pool_gating_network=method.endswith("lp"),
        mean_pool_gating_network_dropout=0.0,
        mean_pool_gating_network_encoder_dim=None,
        gen_expert=0, data="/nonexistent", criterion="na",
    )
    my_task = TranslationMoETask.__new__(TranslationMoETask)
    TranslationMoETask.__init__(my_task, my_task_args, d_my, d_my)

    my_args = argparse.Namespace(
        arch="transformer",
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=64,
        dropout=0.1,
    )
    registry.apply_architecture(my_args)
    my_model = my_task.build_model(my_args)
    variables = my_model.init(jax.random.PRNGKey(0))

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
            if side == "decoder":
                attn(lp["encoder_attn"], pre + ".encoder_attn")
                ln(lp["encoder_attn_ln"], pre + ".encoder_attn_layer_norm")
            lin(lp["fc1"], pre + ".fc1")
            lin(lp["fc2"], pre + ".fc2")
            ln(lp["final_ln"], pre + ".final_layer_norm")
    p["decoder"]["embed_out"] = jnp.asarray(
        sd["decoder.output_projection.weight"]
    )
    if "gating_network.fc1.weight" in sd:
        lin(p["gating_network"]["fc1"], "gating_network.fc1")
        lin(p["gating_network"]["fc2"], "gating_network.fc2")

    my_crit = my_task.build_criterion(
        argparse.Namespace(
            criterion="label_smoothed_cross_entropy", label_smoothing=0.1,
            sentence_avg=False,
        )
    )

    rng = np.random.RandomState(7)
    src = rng.randint(4, 20, size=(3, 9)).astype(np.int64)
    src[:, -1] = 2
    lengths = np.array([9, 9, 9], np.int64)
    prev = rng.randint(4, 20, size=(3, 5)).astype(np.int64)
    prev[:, 0] = 2
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2
    target[2, -1:] = d_ref.pad()

    sample = {
        "net_input": {
            "src_tokens": torch.tensor(src),
            "src_lengths": torch.tensor(lengths),
            "prev_output_tokens": torch.tensor(prev),
        },
        "target": torch.tensor(target),
        "ntokens": int((target != d_ref.pad()).sum()),
    }
    with torch.no_grad():
        ref_loss, ref_ss, _ = ref_task._get_loss(sample, ref_model, ref_crit)

    my_loss, my_ss, _, _ = my_crit(
        my_model,
        variables,
        {
            "src_tokens": src,
            "src_lengths": lengths,
            "prev_output_tokens": prev,
            "target": target,
        },
    )
    assert int(my_ss) == int(ref_ss)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=3e-4)


def test_character_embedding_lm_equivalence():
    """Character-aware LM embeddings (fairseq/modules/
    character_token_embedder.py:22-204, --character-embeddings in
    transformer_lm): char-CNN + highway + projection with pad/eos/unk
    symbol handling. Ported weights -> matching LM logits."""
    import torch

    _load_reference()
    from fairseq.models.transformer_lm import (
        TransformerLanguageModel as RefLM,
        base_lm_architecture as ref_base_lm,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = d_ref
        dictionary = d_ref

    args = argparse.Namespace(
        decoder_layers=1, decoder_embed_dim=16, decoder_ffn_embed_dim=32,
        decoder_attention_heads=2, tokens_per_sample=32,
        dropout=0.1, decoder_layerdrop=0,
        character_embeddings=True,
        character_filters="[(1, 8), (2, 8), (3, 8)]",
        character_embedding_dim=4, char_embedder_highway_layers=1,
        adaptive_input=False, quant_noise_pq=0, quant_noise_pq_block_size=8,
        quant_noise_scalar=0, decoder_layers_to_keep=None,
        share_decoder_input_output_embed=False,
        decoder_learned_pos=False, no_token_positional_embeddings=False,
        max_target_positions=32,
    )
    ref_base_lm(args)
    args.character_embeddings = True
    torch.manual_seed(0)
    ref_model = RefLM.build_model(args, RT())
    ref_model.eval()

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = d_my

    my_args = argparse.Namespace(
        arch="transformer_lm", decoder_layers=1, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32, decoder_attention_heads=2,
        tokens_per_sample=32, max_target_positions=32,
        character_embeddings=True,
        character_filters="[(1, 8), (2, 8), (3, 8)]",
        character_embedding_dim=4, char_embedder_highway_layers=1,
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    dec = variables["params"]["decoder"]

    def lin(dst, prefix):
        dst["w"] = jnp.asarray(sd[prefix + ".weight"].T)
        if prefix + ".bias" in sd:
            dst["b"] = jnp.asarray(sd[prefix + ".bias"])

    def ln(dst, prefix):
        dst["scale"] = jnp.asarray(sd[prefix + ".weight"])
        dst["bias"] = jnp.asarray(sd[prefix + ".bias"])

    ce = dec["char_embedder"]
    pre = "decoder.embed_tokens"
    ce["char_embeddings"] = jnp.asarray(sd[pre + ".char_embeddings.weight"])
    ce["symbol_embeddings"] = jnp.asarray(sd[pre + ".symbol_embeddings"])
    for i in range(3):
        ce["convs"][i]["w"] = jnp.asarray(
            sd[f"{pre}.convolutions.{i}.weight"].transpose(2, 1, 0)
        )
        ce["convs"][i]["b"] = jnp.asarray(sd[f"{pre}.convolutions.{i}.bias"])
    ce["highway"][0]["w"] = jnp.asarray(
        sd[pre + ".highway.layers.0.weight"].T
    )
    ce["highway"][0]["b"] = jnp.asarray(sd[pre + ".highway.layers.0.bias"])
    lin(ce["projection"], pre + ".projection")

    lp = dec["layers"][0]
    for mine, ref in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("out", "out_proj")):
        lin(lp["self_attn"][mine], f"decoder.layers.0.self_attn.{ref}")
    ln(lp["self_attn_ln"], "decoder.layers.0.self_attn_layer_norm")
    lin(lp["fc1"], "decoder.layers.0.fc1")
    lin(lp["fc2"], "decoder.layers.0.fc2")
    ln(lp["final_ln"], "decoder.layers.0.final_layer_norm")
    if "decoder.layer_norm.weight" in sd:
        ln(dec["final_ln"], "decoder.layer_norm")
    dec["embed_out"] = jnp.asarray(sd["decoder.output_projection.weight"])

    rng = np.random.RandomState(7)
    tokens = rng.randint(0, 20, size=(2, 8)).astype(np.int64)
    tokens[0, 0] = 2  # eos
    tokens[1, -1] = d_ref.pad()
    tokens[0, 3] = d_ref.unk()

    with torch.no_grad():
        ref_logits = ref_model(torch.tensor(tokens))[0].numpy()
    (my_logits, _), _ = my_model.forward(variables, {"src_tokens": tokens})
    np.testing.assert_allclose(
        np.asarray(my_logits), ref_logits, rtol=3e-4, atol=3e-4
    )


def test_w2l_conv_glu_encoder_equivalence():
    """wav2letter Conv+GLU encoder (examples/speech_recognition/models/
    w2l_conv_glu_enc.py:42-167): weight-normed conv1d stack + GLU + two
    linears. Ported (reconstructed) weights -> matching per-frame vocab
    logits."""
    import torch

    _load_reference()
    from examples.speech_recognition.models import (
        w2l_conv_glu_enc as ref_w2l,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

    d_ref = make_dict(RefDictionary)

    class RT:
        target_dictionary = d_ref
        source_dictionary = None

    # balanced config: 2*pad(first) == sum(k-1): 2*4 = (5-1)+(5-1)
    cfg = "[(8, 5, 4, 0.0), (12, 5, 0, 0.0)]"
    args = argparse.Namespace(
        input_feat_per_channel=8, in_channels=1, conv_enc_config=cfg,
    )
    torch.manual_seed(0)
    ref_model = ref_w2l.W2lConvGluEncoderModel.build_model(args, RT())
    ref_model.eval()

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d_my = make_dict(Dictionary)

    class MT:
        target_dictionary = d_my
        source_dictionary = None

    my_args = argparse.Namespace(
        arch="asr_w2l_conv_glu_encoder", input_feat_per_channel=8,
        in_channels=1, conv_enc_config=cfg,
        criterion="ctc_loss",
    )
    registry.apply_architecture(my_args)
    my_model = registry.build_model(my_args, MT())
    variables = my_model.init(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    def wn(prefix):
        """weight_norm reconstruction w = g * v / ||v|| (dim=0)."""
        g = sd[prefix + ".weight_g"]
        v = sd[prefix + ".weight_v"]
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
        return g / norm * v

    p = variables["params"]
    for i in range(2):
        w = wn(f"encoder.conv_layers.{i}")  # (out, in, k)
        p["convs"][i]["w"] = jnp.asarray(w.transpose(2, 1, 0))
        p["convs"][i]["b"] = jnp.asarray(sd[f"encoder.conv_layers.{i}.bias"])
    for j in range(2):
        w = wn(f"encoder.linear_layers.{j}")  # (out, in)
        p["linears"][j]["w"] = jnp.asarray(w.T)
        p["linears"][j]["b"] = jnp.asarray(
            sd[f"encoder.linear_layers.{j}.bias"]
        )

    rng = np.random.RandomState(3)
    fbank = rng.randn(2, 20, 8).astype(np.float32)
    lengths = np.array([20, 14], np.int64)
    with torch.no_grad():
        ref_out = ref_model.encoder(
            torch.tensor(fbank), torch.tensor(lengths)
        )["encoder_out"].numpy()  # (T, B, V)
    enc, _ = my_model.encode(variables, fbank, lengths)
    np.testing.assert_allclose(
        np.asarray(enc.encoder_out), ref_out.transpose(1, 0, 2),
        rtol=3e-4, atol=3e-4,
    )


def test_tied_adaptive_softmax_matches_reference():
    """Baevski & Auli tying: our tied_adaptive_log_probs == the reference
    AdaptiveSoftmax(adaptive_inputs=..., tie_proj=True).get_log_prob, with
    weights ported from the same reference AdaptiveInput."""
    import torch

    _load_reference()
    from fairseq.modules.adaptive_input import AdaptiveInput
    from fairseq.modules.adaptive_softmax import AdaptiveSoftmax

    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.adaptive_softmax import (
        _parse_cutoff,
        adaptive_embed,
        tied_adaptive_log_probs,
    )

    vocab, dim, factor = 60, 16, 2.0
    cutoff = [20, 40]
    torch.manual_seed(0)
    ref_in = AdaptiveInput(vocab, 1, dim, factor, dim, list(cutoff))
    ref_sm = AdaptiveSoftmax(
        vocab, dim, list(cutoff), dropout=0.0, factor=factor,
        adaptive_inputs=ref_in, tie_proj=True,
    )
    ref_in.eval(), ref_sm.eval()

    # port: cluster embeddings + projections, head class columns
    clusters = []
    for band in range(len(cutoff) + 1):
        emb_w, proj_w = ref_in.weights_for_band(band)
        clusters.append(
            {
                "embed": {"w": jnp.asarray(emb_w.detach().numpy())},
                # torch Linear weight (out, in) -> our (in, out)
                "proj": {"w": jnp.asarray(proj_w.detach().numpy().T)},
            }
        )
    input_params = {"clusters": clusters}
    tied_params = {
        "class_proj": {
            "w": jnp.asarray(
                ref_sm.head.class_proj.weight.detach().numpy().T
            )
        }
    }

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, dim).astype(np.float32)
    with torch.no_grad():
        want = ref_sm.get_log_prob(torch.tensor(x), None).numpy()

    got = np.asarray(
        tied_adaptive_log_probs(
            tied_params, input_params,
            _parse_cutoff(cutoff, vocab), jnp.asarray(x), tie_proj=True,
        )
    ).reshape(-1, vocab)
    np.testing.assert_allclose(got, want.reshape(-1, vocab),
                               rtol=2e-5, atol=2e-5)

    # the tied input embedding matches too
    ids = rng.randint(0, vocab, size=(3, 7))
    with torch.no_grad():
        want_emb = ref_in(torch.tensor(ids)).numpy()
    got_emb = np.asarray(
        adaptive_embed(
            input_params, _parse_cutoff(cutoff, vocab), jnp.asarray(ids)
        )
    )
    np.testing.assert_allclose(got_emb, want_emb, rtol=2e-5, atol=2e-5)
