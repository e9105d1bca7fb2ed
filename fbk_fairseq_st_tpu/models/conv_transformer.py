"""conv_transformer — the s2t backbone model family.

Counterpart of the reference ConvolutionalTransformerModel
(examples/speech_recognition/models/conv_transformer.py): fbank (B, T, F) ->
strided Conv2d stack (+BatchNorm, activation-before-BN, dropout>=.1) ->
optional 2x ConvAttention2D residual blocks -> flatten C x F -> fc3 Linear +
activation -> audio positional embedding -> N transformer encoder layers
(optionally LocalAttention distance penalties) -> optional final LayerNorm,
with optional EACL-2021 CTC compression after encoder layer k; decoder is the
shared TransformerDecoder.

Arch presets conv_transformer / _big / _big2 / _giant mirror the reference's
@register_model_architecture defaults (conv_transformer.py:429-553).
"""

from __future__ import annotations

import ast
import re
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv_frontend import ConvFrontendConfig, conv_frontend, init_conv_frontend
from ..ops.core import (
    RngStream,
    dropout,
    get_activation,
    init_layer_norm,
    init_linear,
    layer_norm,
    lengths_to_padding_mask,
    linear,
)
from ..ops.ctc import ctc_compress
from ..ops.positional import PositionalEmbedding
from ..ops.transformer_layer import (
    TransformerLayerConfig,
    encoder_layer,
    init_encoder_layer,
)
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig


class ConvTransformerEncoderConfig(NamedTuple):
    frontend: ConvFrontendConfig
    embed_dim: int = 256
    ffn_dim: int = 768
    layers: int = 6
    heads: int = 4
    dropout: float = 0.3
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    learned_pos: bool = False
    max_positions: int = 2048
    no_token_positional_embeddings: bool = False
    layernorm_embedding: bool = False
    distance_penalty: Optional[str] = None  # 'log' | 'gauss'
    init_variance: float = 1.0
    # CTC auxiliary output + EACL-2021 compression
    ctc_out_enabled: bool = False  # emit ctc logits at layer k (ctc_multi_loss)
    ctc_compress_out: bool = False
    ctc_encoder_layer: int = 4
    ctc_compress_strategy: str = "avg"
    ctc_vocab_size: int = 0  # len(source dictionary) + blank

    @property
    def layer_cfg(self) -> TransformerLayerConfig:
        return TransformerLayerConfig(
            embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            num_heads=self.heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
            distance_penalty=self.distance_penalty,
            init_variance=self.init_variance,
        )


class ConvTransformerEncoder:
    def __init__(self, cfg: ConvTransformerEncoderConfig):
        self.cfg = cfg
        # audio positions use padding_idx=0 (reference conv_transformer.py:229)
        self.pos = (
            None
            if cfg.no_token_positional_embeddings
            else PositionalEmbedding(cfg.max_positions, cfg.embed_dim, 0, cfg.learned_pos)
        )

    def init(self, key) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        cfg = self.cfg
        ks = jax.random.split(key, cfg.layers + 4)
        frontend_params, frontend_state = init_conv_frontend(ks[0], cfg.frontend)
        p: Dict[str, Any] = {
            "frontend": frontend_params,
            "fc3": init_linear(ks[1], cfg.frontend.flat_dim, cfg.embed_dim),
            "layers": [
                init_encoder_layer(ks[2 + i], cfg.layer_cfg) for i in range(cfg.layers)
            ],
        }
        if self.pos is not None and cfg.learned_pos:
            p["embed_positions"] = self.pos.init(ks[-2])
        if cfg.normalize_before:
            p["final_ln"] = init_layer_norm(cfg.embed_dim)
        if cfg.layernorm_embedding:
            p["layernorm_embedding"] = init_layer_norm(cfg.embed_dim)
        if cfg.ctc_out_enabled:
            p["ctc_fc"] = init_linear(ks[-1], cfg.embed_dim, cfg.ctc_vocab_size)
        state = {"frontend": frontend_state}
        return p, state

    def __call__(
        self,
        params,
        state,
        src_tokens,
        src_lengths,
        rng: Optional[RngStream] = None,
        deterministic: bool = True,
        training: bool = False,
    ) -> Tuple[EncoderOut, Dict[str, Any]]:
        """src_tokens: (B, T, F) fbank frames; src_lengths: (B,)."""
        cfg = self.cfg
        act = get_activation(cfg.activation)
        rng = rng or RngStream(None)

        x, lengths, frontend_state = conv_frontend(
            params["frontend"],
            state["frontend"],
            cfg.frontend,
            src_tokens,
            src_lengths,
            rng=rng,
            deterministic=deterministic,
            training=training,
        )
        x = act(linear(params["fc3"], x))
        if self.pos is not None:
            x = x + self.pos.from_lengths(
                params.get("embed_positions", {}), lengths, x.shape[1], x.dtype
            )
        if cfg.layernorm_embedding:
            x = layer_norm(params["layernorm_embedding"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)

        padding_mask = lengths_to_padding_mask(lengths, x.shape[1])
        ctc_out = ctc_padding_mask = ctc_lengths = None

        for i, lp in enumerate(params["layers"]):
            x = encoder_layer(
                lp,
                cfg.layer_cfg,
                x,
                key_padding_mask=padding_mask,
                rng=rng,
                deterministic=deterministic,
            )
            if cfg.ctc_out_enabled and cfg.ctc_encoder_layer == i + 1:
                ctc_logits = linear(params["ctc_fc"], x)
                ctc_out = ctc_logits
                ctc_padding_mask = padding_mask
                ctc_lengths = lengths
                if cfg.ctc_compress_out:
                    x, lengths = ctc_compress(
                        x, ctc_logits, lengths, cfg.ctc_compress_strategy
                    )
                    padding_mask = lengths_to_padding_mask(lengths, x.shape[1])

        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)

        return (
            EncoderOut(
                encoder_out=x,
                encoder_padding_mask=padding_mask,
                src_lengths=lengths,
                ctc_out=ctc_out,
                ctc_padding_mask=ctc_padding_mask,
                ctc_lengths=ctc_lengths,
            ),
            {"frontend": frontend_state},
        )

    def ctc_features(self, params, encoder_states_at_layer):
        """CTC logits from layer-k states (ctc_multi_loss fallback path when
        compression is off, reference ctc_multi_loss.py:27-39)."""
        return linear(params["ctc_fc"], encoder_states_at_layer)


@register_model("conv_transformer")
class ConvolutionalTransformerModel(Model):
    def __init__(
        self,
        encoder_cfg: ConvTransformerEncoderConfig,
        decoder_cfg: TransformerDecoderConfig,
    ):
        self.encoder_cfg = encoder_cfg
        self.decoder_cfg = decoder_cfg
        self.encoder = ConvTransformerEncoder(encoder_cfg)
        self.decoder = TransformerDecoder(decoder_cfg)
        self.max_source_positions = encoder_cfg.max_positions
        self.max_target_positions = decoder_cfg.max_positions

    # -- CLI glue -----------------------------------------------------------

    @staticmethod
    def add_args(parser, include_freeze_pretrained: bool = True):
        from .transformer_args import add_transformer_args

        parser.add_argument(
            "--input-feat-per-channel",
            type=int,
            metavar="N",
            help="encoder input dimension per input channel",
        )
        add_transformer_args(parser)
        parser.add_argument(
            "--encoder-convolutions",
            type=str,
            metavar="EXPR",
            help="encoder conv layers [(dim, kernel_size, kernel_width), ...]",
        )
        parser.add_argument("--normalization-constant", type=float, default=1.0)
        parser.add_argument(
            "--no-attn-2d", action="store_true", default=False,
            help="Whether to use 2d attention",
        )
        parser.add_argument(
            "--distance-penalty", type=str, default=False,
            choices=["log", "gauss"],
            help="Add distance penalty to the encoder",
        )
        parser.add_argument(
            "--init-variance", type=float, default=1.0,
            help="Initialization value for variance",
        )
        parser.add_argument(
            "--ctc-compress-out", action="store_true", default=False,
            help="If set, compress the CTC output based on predictions",
        )
        parser.add_argument(
            "--ctc-compress-strategy", type=str, default="avg",
            choices=["avg", "weighted", "softmax"],
            help="Strategy to use when compressing CTC output",
        )
        if include_freeze_pretrained:
            parser.add_argument(
                "--freeze-pretrained", action="store_true",
                help="if set, all params loaded from the pretrained model are freezed",
            )

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        encoder_cfg, decoder_cfg = configs_from_args(args, task)
        return cls(encoder_cfg, decoder_cfg)

    # -- functional API -------------------------------------------------------

    def init(self, key):
        ek, dk = jax.random.split(key)
        enc_params, enc_state = self.encoder.init(ek)
        return {
            "params": {"encoder": enc_params, "decoder": self.decoder.init(dk)},
            "state": {"encoder": enc_state},
        }

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        return self.encoder(
            variables["params"]["encoder"],
            variables["state"]["encoder"],
            src_tokens,
            src_lengths,
            rng=rng,
            deterministic=not training,
            training=training,
        )

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        """batch: dict with src_tokens (B,T,F), src_lengths, prev_output_tokens.

        Returns ((logits, extra), new_state) — extra carries the EncoderOut
        so criterions (CTC multi-loss) can reach ctc_out.
        """
        encoder_out, enc_state = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits, extra = self.decoder(
            variables["params"]["decoder"],
            batch["prev_output_tokens"],
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        extra["encoder_out"] = encoder_out
        return (logits, extra), {"encoder": enc_state}

    # -- incremental decoding -------------------------------------------------

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len, encoder_out.encoder_out, dtype
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        return self.decoder.step(
            variables["params"]["decoder"],
            tokens,
            cache,
            step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
        )


def _parse_convolutions(expr: Optional[str]) -> Tuple[Tuple[int, int, int], ...]:
    """Parse the reference's '[(64, 3, 3)] * 2' style EXPR (extend_conv_spec
    semantics: (dim, k) -> (dim, k, k))."""
    if expr is None:
        return ((512, 3, 3), (512, 3, 3))
    try:
        spec = ast.literal_eval(expr)
    except ValueError:
        # the reference accepts python exprs like '[(64, 3, 3)] * 2'
        # (eval'd in conv_transformer.py:135); support the list-repeat form
        # without a raw eval
        m = re.match(r"^\s*(\[.*\])\s*\*\s*(\d+)\s*$", expr)
        if not m:
            raise ValueError(f"cannot parse --encoder-convolutions {expr!r}")
        spec = ast.literal_eval(m.group(1)) * int(m.group(2))
    out = []
    for item in spec:
        if len(item) == 2:
            out.append((item[0], item[1], item[1]))
        elif len(item) == 3:
            out.append(tuple(item))
        else:
            raise ValueError(f"invalid conv spec: {item}")
    return tuple(out)


def configs_from_args(args, task):
    tgt_dict = task.target_dictionary
    src_dict = getattr(task, "source_dictionary", None)
    frontend = ConvFrontendConfig(
        convolutions=_parse_convolutions(args.encoder_convolutions),
        audio_features=getattr(args, "input_feat_per_channel", 40),
        dropout=args.dropout,
        activation=getattr(args, "activation_fn", "relu"),
        attn_2d=args.attn_2d,
    )
    distance_penalty = args.distance_penalty or None
    if distance_penalty is True:
        distance_penalty = "log"
    encoder_cfg = ConvTransformerEncoderConfig(
        frontend=frontend,
        embed_dim=args.encoder_embed_dim,
        ffn_dim=args.encoder_ffn_embed_dim,
        layers=args.encoder_layers,
        heads=args.encoder_attention_heads,
        dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        activation_dropout=getattr(args, "relu_dropout", 0.1),
        activation=getattr(args, "activation_fn", "relu"),
        normalize_before=args.encoder_normalize_before,
        learned_pos=args.encoder_learned_pos,
        max_positions=getattr(args, "max_source_positions", 2048),
        no_token_positional_embeddings=args.no_token_positional_embeddings,
        layernorm_embedding=getattr(args, "layernorm_embedding", False),
        distance_penalty=distance_penalty,
        init_variance=getattr(args, "init_variance", 1.0),
        # ctc_fc lives in the model both for compression and for plain
        # ctc_multi_loss (the layout raw_state_dict_upgrade migrates to,
        # reference conv_transformer.py:105-112)
        ctc_out_enabled=(
            getattr(args, "ctc_compress_out", False)
            or getattr(args, "criterion", None) == "ctc_multi_loss"
        ),
        ctc_compress_out=getattr(args, "ctc_compress_out", False),
        ctc_encoder_layer=getattr(args, "ctc_encoder_layer", 4),
        ctc_compress_strategy=getattr(args, "ctc_compress_strategy", "avg"),
        ctc_vocab_size=len(src_dict) if src_dict is not None else len(tgt_dict),
    )
    decoder_cfg = TransformerDecoderConfig(
        vocab_size=len(tgt_dict),
        embed_dim=args.decoder_embed_dim,
        ffn_dim=args.decoder_ffn_embed_dim,
        layers=args.decoder_layers,
        heads=args.decoder_attention_heads,
        dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        activation_dropout=getattr(args, "relu_dropout", 0.1),
        activation=getattr(args, "activation_fn", "relu"),
        normalize_before=args.decoder_normalize_before,
        learned_pos=args.decoder_learned_pos,
        max_positions=getattr(args, "max_target_positions", 1024),
        padding_idx=tgt_dict.pad(),
        share_input_output_embed=args.share_decoder_input_output_embed,
        no_scale_embedding=getattr(args, "no_scale_embedding", False),
        layernorm_embedding=getattr(args, "layernorm_embedding", False),
        no_token_positional_embeddings=args.no_token_positional_embeddings,
    )
    return encoder_cfg, decoder_cfg


def _base_defaults(args, enc_dim, ffn_dim, heads):
    args.dropout = getattr(args, "dropout", 0.3)
    args.normalization_constant = getattr(args, "normalization_constant", 0.5)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.relu_dropout = getattr(args, "relu_dropout", 0.1)
    args.attn_2d = not getattr(args, "no_attn_2d", False)
    args.no_token_positional_embeddings = getattr(
        args, "no_token_positional_embeddings", False
    )
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", enc_dim)
    args.decoder_embed_path = getattr(args, "decoder_embed_path", None)
    args.encoder_convolutions = getattr(
        args, "encoder_convolutions", "[(64, 3, 3)] * 2"
    )
    args.encoder_layers = getattr(args, "encoder_layers", 6)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", ffn_dim)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", heads)
    args.encoder_learned_pos = getattr(args, "encoder_learned_pos", False)
    args.encoder_normalize_before = getattr(args, "encoder_normalize_before", True)
    args.distance_penalty = getattr(args, "distance_penalty", False)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", enc_dim)
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", enc_dim)
    args.decoder_output_dim = getattr(args, "decoder_output_dim", enc_dim)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", ffn_dim)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", heads)
    args.decoder_learned_pos = getattr(args, "decoder_learned_pos", False)
    args.decoder_normalize_before = getattr(args, "decoder_normalize_before", True)
    args.no_scale_embedding = getattr(args, "no_scale_embedding", False)
    args.layernorm_embedding = getattr(args, "layernorm_embedding", False)
    args.adaptive_softmax_cutoff = getattr(args, "adaptive_softmax_cutoff", None)
    args.adaptive_softmax_dropout = getattr(args, "adaptive_softmax_dropout", 0)
    args.adaptive_input = getattr(args, "adaptive_input", False)
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 40)


@register_model_architecture("conv_transformer", "conv_transformer")
def base_architecture(args):
    """Defaults per reference conv_transformer.py:429-466."""
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)


@register_model_architecture("conv_transformer", "conv_transformer_big")
def speechtransformer_big(args):
    """Defaults per reference conv_transformer.py:469-505."""
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)


@register_model_architecture("conv_transformer", "conv_transformer_big2")
def speechtransformer_big2(args):
    """Defaults per reference conv_transformer.py:508-529 (512/2048/8)."""
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)


@register_model_architecture("conv_transformer", "conv_transformer_giant")
def speechtransformer_giant(args):
    """Defaults per reference conv_transformer.py:532-553 (1024/4096/16)."""
    _base_defaults(args, enc_dim=1024, ffn_dim=4096, heads=16)
