"""Text Transformer (Vaswani et al. 2017) — the core translation model.

Counterpart of fairseq/models/transformer.py:39-978: token-embedding encoder
(+sinusoidal/learned positions) and the shared TransformerDecoder, with
--share-all-embeddings / --share-decoder-input-output-embed tying and the
reference arch presets (transformer, _iwslt_de_en, _wmt_en_de,
_vaswani_wmt_en_de_big, _wmt_en_de_big, ...).

Weight tying is functional: the shared embedding lives once in the param
tree and is substituted into both encoder and decoder at apply time, so
gradients from every use accumulate on the single leaf.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.core import (
    RngStream,
    dropout,
    embedding,
    init_embedding,
    init_layer_norm,
    layer_norm,
)
from ..ops.positional import PositionalEmbedding
from ..ops.transformer_layer import (
    TransformerLayerConfig,
    encoder_layer,
    init_encoder_layer,
)
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .transformer_args import add_transformer_args
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig


class TransformerEncoderConfig(NamedTuple):
    vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    learned_pos: bool = False
    max_positions: int = 1024
    padding_idx: int = 1
    no_scale_embedding: bool = False
    layernorm_embedding: bool = False
    no_token_positional_embeddings: bool = False
    layerdrop: float = 0.0
    quant_noise_pq: float = 0.0
    quant_noise_block: int = 8

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
            quant_noise_pq=self.quant_noise_pq,
            quant_noise_block=self.quant_noise_block,
        )


class TransformerEncoder:
    """Token encoder (reference transformer.py:299-515)."""

    def __init__(self, cfg: TransformerEncoderConfig):
        self.cfg = cfg
        self.embed_scale = 1.0 if cfg.no_scale_embedding else cfg.embed_dim ** 0.5
        self.pos = (
            None
            if cfg.no_token_positional_embeddings
            else PositionalEmbedding(
                cfg.max_positions, cfg.embed_dim, cfg.padding_idx, cfg.learned_pos
            )
        )

    def init(self, key, init_embed: bool = True):
        cfg = self.cfg
        ks = jax.random.split(key, cfg.layers + 3)
        p: Dict[str, Any] = {
            "layers": [
                init_encoder_layer(ks[i], cfg.layer_cfg) for i in range(cfg.layers)
            ]
        }
        if init_embed:
            p["embed_tokens"] = init_embedding(
                ks[-1], cfg.vocab_size, cfg.embed_dim, cfg.padding_idx
            )
        if self.pos is not None and cfg.learned_pos:
            p["embed_positions"] = self.pos.init(ks[-2])
        if cfg.normalize_before:
            p["final_ln"] = init_layer_norm(cfg.embed_dim)
        if cfg.layernorm_embedding:
            p["layernorm_embedding"] = init_layer_norm(cfg.embed_dim)
        return p

    def __call__(self, params, src_tokens, src_lengths=None, rng=None,
                 deterministic=True, dtype=jnp.float32):
        cfg = self.cfg
        rng = rng or RngStream(None)
        x = self.embed_scale * embedding(params["embed_tokens"], src_tokens, dtype)
        if self.pos is not None:
            x = x + self.pos.from_ids(
                params.get("embed_positions", {}), src_tokens, dtype
            )
        if cfg.layernorm_embedding:
            x = layer_norm(params["layernorm_embedding"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)
        padding_mask = src_tokens == cfg.padding_idx
        for lp in params["layers"]:
            y = encoder_layer(
                lp, cfg.layer_cfg, x,
                key_padding_mask=padding_mask,
                rng=rng, deterministic=deterministic,
            )
            if cfg.layerdrop > 0 and not deterministic:
                # LayerDrop (Fan et al. 2019): skip whole layers during
                # training; the dropped layer's compute still runs under the
                # static program and is masked out (trading FLOPs for one
                # compiled shape, like every other TPU branch here)
                keep = jax.random.bernoulli(
                    rng.next(), 1.0 - cfg.layerdrop
                )
                y = jnp.where(keep, y, x)
            x = y
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        return EncoderOut(
            encoder_out=x,
            encoder_padding_mask=padding_mask,
            src_lengths=src_lengths,
        )


@register_model("transformer")
class TransformerModel(Model):
    def __init__(self, encoder_cfg: TransformerEncoderConfig,
                 decoder_cfg: TransformerDecoderConfig,
                 share_all_embeddings: bool = False):
        self.encoder_cfg = encoder_cfg
        self.decoder_cfg = decoder_cfg
        self.share_all_embeddings = share_all_embeddings
        self.encoder = TransformerEncoder(encoder_cfg)
        self.decoder = TransformerDecoder(decoder_cfg)
        self.max_source_positions = encoder_cfg.max_positions
        self.max_target_positions = decoder_cfg.max_positions

    @staticmethod
    def add_args(parser):
        add_transformer_args(parser)

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        src_dict = task.source_dictionary
        tgt_dict = task.target_dictionary
        share_all = getattr(args, "share_all_embeddings", False)
        if share_all:
            if src_dict is not tgt_dict and (
                getattr(src_dict, "symbols", None)
                != getattr(tgt_dict, "symbols", None)
            ):
                raise ValueError(
                    "--share-all-embeddings requires a joined dictionary"
                )
            if args.encoder_embed_dim != args.decoder_embed_dim:
                raise ValueError(
                    "--share-all-embeddings requires --encoder-embed-dim to "
                    "match --decoder-embed-dim"
                )
        encoder_cfg = TransformerEncoderConfig(
            vocab_size=len(src_dict),
            embed_dim=args.encoder_embed_dim,
            ffn_dim=args.encoder_ffn_embed_dim,
            layers=args.encoder_layers,
            heads=args.encoder_attention_heads,
            dropout=args.dropout,
            attention_dropout=args.attention_dropout,
            activation_dropout=getattr(args, "relu_dropout", 0.0),
            activation=getattr(args, "activation_fn", "relu"),
            normalize_before=args.encoder_normalize_before,
            learned_pos=args.encoder_learned_pos,
            max_positions=getattr(args, "max_source_positions", 1024),
            padding_idx=src_dict.pad(),
            no_scale_embedding=getattr(args, "no_scale_embedding", False),
            layernorm_embedding=getattr(args, "layernorm_embedding", False),
            no_token_positional_embeddings=args.no_token_positional_embeddings,
            layerdrop=getattr(args, "encoder_layerdrop", 0.0) or 0.0,
            quant_noise_pq=getattr(args, "quant_noise_pq", 0) or 0.0,
            quant_noise_block=getattr(
                args, "quant_noise_pq_block_size", 8
            ) or 8,
        )
        decoder_cfg = TransformerDecoderConfig(
            vocab_size=len(tgt_dict),
            embed_dim=args.decoder_embed_dim,
            ffn_dim=args.decoder_ffn_embed_dim,
            layers=args.decoder_layers,
            heads=args.decoder_attention_heads,
            dropout=args.dropout,
            attention_dropout=args.attention_dropout,
            activation_dropout=getattr(args, "relu_dropout", 0.0),
            activation=getattr(args, "activation_fn", "relu"),
            normalize_before=args.decoder_normalize_before,
            learned_pos=args.decoder_learned_pos,
            max_positions=getattr(args, "max_target_positions", 1024),
            padding_idx=tgt_dict.pad(),
            share_input_output_embed=(
                share_all or getattr(args, "share_decoder_input_output_embed", False)
            ),
            no_scale_embedding=getattr(args, "no_scale_embedding", False),
            layernorm_embedding=getattr(args, "layernorm_embedding", False),
            no_token_positional_embeddings=args.no_token_positional_embeddings,
            layerdrop=getattr(args, "decoder_layerdrop", 0.0) or 0.0,
            no_encoder_attn=getattr(args, "no_cross_attention", False),
            cross_self_attention=getattr(args, "cross_self_attention", False),
            quant_noise_pq=getattr(args, "quant_noise_pq", 0) or 0.0,
            quant_noise_block=getattr(
                args, "quant_noise_pq_block_size", 8
            ) or 8,
        )
        return cls(encoder_cfg, decoder_cfg, share_all)

    def init(self, key):
        ek, dk = jax.random.split(key)
        dec_params = self.decoder.init(dk)
        if self.share_all_embeddings:
            shared = dec_params.pop("embed_tokens")
            enc_params = self.encoder.init(ek, init_embed=False)
            params = {
                "shared_embed_tokens": shared,
                "encoder": enc_params,
                "decoder": dec_params,
            }
        else:
            params = {"encoder": self.encoder.init(ek), "decoder": dec_params}
        return {"params": params, "state": {}}

    def _split_params(self, params):
        enc = params["encoder"]
        dec = params["decoder"]
        if self.share_all_embeddings:
            enc = {**enc, "embed_tokens": params["shared_embed_tokens"]}
            dec = {**dec, "embed_tokens": params["shared_embed_tokens"]}
        return enc, dec

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        enc_params, _ = self._split_params(variables["params"])
        return (
            self.encoder(
                enc_params, src_tokens, src_lengths,
                rng=rng, deterministic=not training,
            ),
            {},
        )

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        enc_params, dec_params = self._split_params(variables["params"])
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        logits, extra = self.decoder(
            dec_params,
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        extra["encoder_out"] = enc
        return (logits, extra), {}

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        _, dec_params = self._split_params(variables["params"])
        return self.decoder.init_cache(
            dec_params, batch, max_len, encoder_out.encoder_out, dtype
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        _, dec_params = self._split_params(variables["params"])
        return self.decoder.step(
            dec_params, tokens, cache, step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
        )


@register_model_architecture("transformer", "transformer")
def base_architecture(args):
    """Reference transformer.py:883-916 defaults."""
    args.encoder_embed_path = getattr(args, "encoder_embed_path", None)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 2048)
    args.encoder_layers = getattr(args, "encoder_layers", 6)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 8)
    args.encoder_normalize_before = getattr(args, "encoder_normalize_before", False)
    args.encoder_learned_pos = getattr(args, "encoder_learned_pos", False)
    args.decoder_embed_path = getattr(args, "decoder_embed_path", None)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", args.encoder_embed_dim)
    args.decoder_ffn_embed_dim = getattr(
        args, "decoder_ffn_embed_dim", args.encoder_ffn_embed_dim
    )
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 8)
    args.decoder_normalize_before = getattr(args, "decoder_normalize_before", False)
    args.decoder_learned_pos = getattr(args, "decoder_learned_pos", False)
    args.attention_dropout = getattr(args, "attention_dropout", 0.0)
    args.relu_dropout = getattr(args, "relu_dropout", 0.0)
    args.dropout = getattr(args, "dropout", 0.1)
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )
    args.share_all_embeddings = getattr(args, "share_all_embeddings", False)
    args.no_token_positional_embeddings = getattr(
        args, "no_token_positional_embeddings", False
    )
    args.adaptive_input = getattr(args, "adaptive_input", False)
    args.decoder_output_dim = getattr(
        args, "decoder_output_dim", args.decoder_embed_dim
    )
    args.decoder_input_dim = getattr(args, "decoder_input_dim", args.decoder_embed_dim)
    args.no_scale_embedding = getattr(args, "no_scale_embedding", False)
    args.layernorm_embedding = getattr(args, "layernorm_embedding", False)
    args.adaptive_softmax_cutoff = getattr(args, "adaptive_softmax_cutoff", None)
    args.adaptive_softmax_dropout = getattr(args, "adaptive_softmax_dropout", 0)
    # reference transformer.py:915-916
    args.no_cross_attention = getattr(args, "no_cross_attention", False)
    args.cross_self_attention = getattr(args, "cross_self_attention", False)
    # reference transformer.py:921-923
    args.quant_noise_pq = getattr(args, "quant_noise_pq", 0)
    args.quant_noise_pq_block_size = getattr(
        args, "quant_noise_pq_block_size", 8
    )
    args.quant_noise_scalar = getattr(args, "quant_noise_scalar", 0)


@register_model_architecture("transformer", "transformer_iwslt_de_en")
def transformer_iwslt_de_en(args):
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 1024)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 4)
    args.encoder_layers = getattr(args, "encoder_layers", 6)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 1024)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 4)
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    base_architecture(args)


@register_model_architecture("transformer", "transformer_wmt_en_de")
def transformer_wmt_en_de(args):
    base_architecture(args)


@register_model_architecture("transformer", "transformer_vaswani_wmt_en_de_big")
def transformer_vaswani_wmt_en_de_big(args):
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1024)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 4096)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    args.encoder_normalize_before = getattr(args, "encoder_normalize_before", False)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1024)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 4096)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    args.dropout = getattr(args, "dropout", 0.3)
    base_architecture(args)


@register_model_architecture("transformer", "transformer_vaswani_wmt_en_fr_big")
def transformer_vaswani_wmt_en_fr_big(args):
    args.dropout = getattr(args, "dropout", 0.1)
    transformer_vaswani_wmt_en_de_big(args)


@register_model_architecture("transformer", "transformer_wmt_en_de_big")
def transformer_wmt_en_de_big(args):
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    transformer_vaswani_wmt_en_de_big(args)


@register_model_architecture("transformer", "transformer_wmt_en_de_big_t2t")
def transformer_wmt_en_de_big_t2t(args):
    args.encoder_normalize_before = getattr(args, "encoder_normalize_before", True)
    args.decoder_normalize_before = getattr(args, "decoder_normalize_before", True)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.relu_dropout = getattr(args, "relu_dropout", 0.1)
    transformer_vaswani_wmt_en_de_big(args)
