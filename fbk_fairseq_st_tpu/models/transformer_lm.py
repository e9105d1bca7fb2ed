"""Decoder-only transformer language model (reference
fairseq/models/transformer_lm.py): the shared TransformerDecoder with
no_encoder_attn, arch presets transformer_lm / _big / _gpt*."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.core import RngStream
from ..registry import register_model, register_model_architecture
from .base import Model
from .transformer_args import add_transformer_args
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig


@register_model("transformer_lm")
class TransformerLanguageModel(Model):
    def __init__(self, cfg: TransformerDecoderConfig, char_table=None):
        self.cfg = cfg
        self.decoder = TransformerDecoder(cfg, char_table=char_table)
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions

    @staticmethod
    def add_args(parser):
        add_transformer_args(parser)
        parser.add_argument("--decoder-input-dim", type=int, metavar="N")
        parser.add_argument("--adaptive-input", action="store_true")
        parser.add_argument("--adaptive-input-cutoff", metavar="EXPR",
                            help="comma separated adaptive input cutoffs")
        parser.add_argument("--adaptive-input-factor", type=float, metavar="N")
        # reference transformer_lm.py:82-84 (tail projections shrink by this
        # factor per cluster; must equal --adaptive-input-factor when tying)
        parser.add_argument("--adaptive-softmax-factor", type=float,
                            metavar="N",
                            help="adaptive softmax factor")
        parser.add_argument("--no-decoder-final-norm", action="store_true",
                            help="don't add an extra layernorm after the "
                            "last decoder block")
        parser.add_argument("--tie-adaptive-weights", action="store_true",
                            help="share adaptive softmax output weights "
                            "with the adaptive input embedding clusters")
        parser.add_argument("--tie-adaptive-proj", action="store_true",
                            help="also share the tail projections "
                            "(transposed input projections)")
        # char-CNN word embeddings (reference transformer_lm.py:57-66)
        parser.add_argument("--character-embeddings", action="store_true",
                            default=False,
                            help="use character-CNN word embeddings")
        parser.add_argument(
            "--character-filters", type=str, metavar="LIST",
            default="[(1, 64), (2, 128), (3, 192), (4, 256), (5, 256), "
                    "(6, 256), (7, 256)]",
            help="size of character embeddings",
        )
        parser.add_argument("--character-embedding-dim", default=4, type=int,
                            metavar="N")
        parser.add_argument("--char-embedder-highway-layers", default=2,
                            type=int, metavar="N")

    @classmethod
    def build_model(cls, args, task):
        base_lm_architecture(args)
        d = task.target_dictionary
        src_d = getattr(task, "source_dictionary", None) or d
        cfg = TransformerDecoderConfig(
            vocab_size=len(d),
            # --output-dictionary-size: input embeds the full vocab while
            # the output projection is truncated
            input_vocab_size=len(src_d) if len(src_d) != len(d) else None,
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
            max_positions=getattr(args, "max_target_positions", None)
            or getattr(args, "tokens_per_sample", 1024),
            padding_idx=d.pad(),
            share_input_output_embed=getattr(
                args, "share_decoder_input_output_embed", False
            ),
            no_scale_embedding=getattr(args, "no_scale_embedding", False),
            no_token_positional_embeddings=getattr(
                args, "no_token_positional_embeddings", False
            ),
            no_encoder_attn=True,
            adaptive_softmax_cutoff=(
                tuple(
                    int(x)
                    for x in str(args.adaptive_softmax_cutoff).split(",")
                )
                if getattr(args, "adaptive_softmax_cutoff", None)
                else None
            ),
            adaptive_softmax_factor=getattr(
                args, "adaptive_softmax_factor", 4.0
            ),
            layerdrop=getattr(args, "decoder_layerdrop", 0.0) or 0.0,
            quant_noise_pq=getattr(args, "quant_noise_pq", 0) or 0.0,
            quant_noise_block=getattr(
                args, "quant_noise_pq_block_size", 8
            ) or 8,
            adaptive_input_cutoff=(
                tuple(
                    int(x)
                    for x in str(args.adaptive_input_cutoff).split(",")
                )
                if getattr(args, "adaptive_input", False)
                and getattr(args, "adaptive_input_cutoff", None)
                else None
            ),
            adaptive_input_factor=getattr(
                args, "adaptive_input_factor", 4.0
            ) or 4.0,
            no_decoder_final_norm=getattr(
                args, "no_decoder_final_norm", False
            ),
            tie_adaptive_weights=getattr(
                args, "tie_adaptive_weights", False
            ),
            tie_adaptive_proj=getattr(args, "tie_adaptive_proj", False),
        )
        if cfg.tie_adaptive_weights:
            # reference transformer_lm.py:141-148 preconditions
            if not getattr(args, "adaptive_input", False):
                raise ValueError(
                    "--tie-adaptive-weights requires --adaptive-input"
                )
            if getattr(args, "adaptive_input_factor", 4.0) != getattr(
                args, "adaptive_softmax_factor", 4.0
            ):
                raise ValueError(
                    "--tie-adaptive-weights requires matching "
                    "--adaptive-input-factor / --adaptive-softmax-factor"
                )
        char_table = None
        if getattr(args, "character_embeddings", False):
            import ast

            from ..ops.character_embedder import (
                CharEmbedderConfig,
                build_word_to_char,
            )

            char_cfg = CharEmbedderConfig(
                filters=tuple(
                    tuple(f) for f in ast.literal_eval(args.character_filters)
                ),
                char_embed_dim=args.character_embedding_dim,
                word_embed_dim=args.decoder_embed_dim,
                highway_layers=args.char_embedder_highway_layers,
            )
            if cfg.share_input_output_embed:
                raise ValueError(
                    "--character-embeddings has no token embedding matrix to "
                    "tie; disable --share-decoder-input-output-embed"
                )
            cfg = cfg._replace(
                char_embedder=char_cfg, eos_idx=d.eos(), unk_idx=d.unk()
            )
            char_table = build_word_to_char(d, char_cfg.max_char_len)
        return cls(cfg, char_table=char_table)

    def init(self, key):
        return {"params": {"decoder": self.decoder.init(key)}, "state": {}}

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        logits, extra = self.decoder(
            variables["params"]["decoder"],
            batch["src_tokens"],
            rng=rng,
            deterministic=not training,
        )
        return (logits, extra), {}

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        from .base import EncoderOut

        # LM has no encoder; generators condition only on the cache
        b, t = src_tokens.shape[0], 1
        return (
            EncoderOut(
                encoder_out=jnp.zeros((b, t, self.cfg.embed_dim)),
                encoder_padding_mask=jnp.zeros((b, t), bool),
            ),
            {},
        )

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len, None, dtype
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        return self.decoder.step(
            variables["params"]["decoder"], tokens, cache, step
        )


@register_model_architecture("transformer_lm", "transformer_lm")
def base_lm_architecture(args):
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.0)
    args.relu_dropout = getattr(args, "relu_dropout", 0.0)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 2048)
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 8)
    args.decoder_normalize_before = getattr(args, "decoder_normalize_before", True)
    args.decoder_learned_pos = getattr(args, "decoder_learned_pos", False)
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )
    args.no_token_positional_embeddings = getattr(
        args, "no_token_positional_embeddings", False
    )
    args.no_scale_embedding = getattr(args, "no_scale_embedding", False)
    args.adaptive_softmax_cutoff = getattr(args, "adaptive_softmax_cutoff", None)
    args.adaptive_softmax_dropout = getattr(args, "adaptive_softmax_dropout", 0)


@register_model_architecture("transformer_lm", "transformer_lm_big")
def transformer_lm_big(args):
    args.decoder_layers = getattr(args, "decoder_layers", 12)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1024)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 4096)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    base_lm_architecture(args)


@register_model_architecture("transformer_lm", "transformer_lm_gpt")
def transformer_lm_gpt(args):
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 768)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 3072)
    args.decoder_layers = getattr(args, "decoder_layers", 12)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 12)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    base_lm_architecture(args)


@register_model_architecture("transformer_lm", "transformer_lm_gbw")
@register_model_architecture("transformer_lm", "transformer_lm_baevski_gbw")
def transformer_lm_baevski_gbw(args):
    """Reference transformer_lm.py:248-256."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.no_decoder_final_norm = getattr(args, "no_decoder_final_norm", True)
    transformer_lm_big(args)


@register_model_architecture("transformer_lm", "transformer_lm_wiki103")
@register_model_architecture("transformer_lm", "transformer_lm_baevski_wiki103")
def transformer_lm_baevski_wiki103(args):
    """Reference transformer_lm.py:230-245 (adaptive input + softmax)."""
    args.decoder_layers = getattr(args, "decoder_layers", 16)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 8)
    args.dropout = getattr(args, "dropout", 0.3)
    args.adaptive_input = getattr(args, "adaptive_input", True)
    args.tie_adaptive_weights = getattr(args, "tie_adaptive_weights", True)
    args.adaptive_input_cutoff = getattr(
        args, "adaptive_input_cutoff", "20000,60000"
    )
    args.adaptive_softmax_cutoff = getattr(
        args, "adaptive_softmax_cutoff", "20000,60000"
    )
    args.adaptive_softmax_dropout = getattr(
        args, "adaptive_softmax_dropout", 0.2
    )
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_dropout = getattr(args, "activation_dropout", 0.1)
    args.no_decoder_final_norm = getattr(args, "no_decoder_final_norm", True)
    args.tie_adaptive_proj = getattr(args, "tie_adaptive_proj", True)
    transformer_lm_big(args)


@register_model_architecture("transformer_lm", "transformer_lm_gpt2_small")
def transformer_lm_gpt2_small(args):
    """Reference transformer_lm.py:270-279."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1024)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 4096)
    args.decoder_layers = getattr(args, "decoder_layers", 24)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    base_lm_architecture(args)


@register_model_architecture("transformer_lm", "transformer_lm_gpt2_medium")
def transformer_lm_gpt2_medium(args):
    """Reference transformer_lm.py:282-291."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1280)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 5120)
    args.decoder_layers = getattr(args, "decoder_layers", 36)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 20)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    base_lm_architecture(args)


@register_model_architecture("transformer_lm", "transformer_lm_gpt2_big")
def transformer_lm_gpt2_big(args):
    """Reference transformer_lm.py:294-303."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1600)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 6400)
    args.decoder_layers = getattr(args, "decoder_layers", 48)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 25)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    base_lm_architecture(args)
