"""Decoder-only language-model variants of the conv/LSTM families.

Counterparts of fairseq/models/fconv_lm.py:15-103,
fairseq/models/lstm_lm.py:14-126 and fairseq/models/lightconv_lm.py: each
reuses its parent family's decoder stack without the encoder / encoder
attention. The language_modeling task feeds ``src_tokens`` (the shifted
history) as the decoder input."""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.core import (
    RngStream,
    dropout,
    embedding,
    init_embedding,
    init_linear,
    linear,
)
from ..registry import register_model, register_model_architecture
from .fconv import FConvConfig, FConvModel, _init_conv, _init_fc
from .lightconv import (
    LightConvModel,
    LightConvModelConfig,
    init_lightconv_decoder_layer,
)
from .lstm import LSTMConfig, LSTMModel, _run_lstm, init_lstm_cell, lstm_cell
from .base import Model


# ---------------------------------------------------------------------------
# fconv_lm
# ---------------------------------------------------------------------------

@register_model("fconv_lm")
class FConvLanguageModel(FConvModel):
    @staticmethod
    def add_args(parser):
        # reference fconv_lm.py:24-43
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--decoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-layers", type=str, metavar="EXPR")
        parser.add_argument("--decoder-out-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-attention", type=str, metavar="EXPR")

    @classmethod
    def build_model(cls, args, task):
        fconv_lm_architecture(args)
        model = FConvModel.build_model.__func__(cls, _lm_args(args), task)
        return model

    def init(self, key):
        variables = super().init(key)
        variables["params"] = {
            k: v for k, v in variables["params"].items()
            if not k.startswith("enc") and k not in (
                "encoder_embed", "encoder_pos"
            )
        }
        return variables

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        logits, _ = self._decode(
            variables["params"], batch["src_tokens"], None,
            rng or RngStream(None), not training,
        )
        return (logits, {"attn": None}), {}

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        logits, new_cache = self._decode(
            variables["params"], tokens, None, RngStream(None), True,
            step=step, cache=cache,
        )
        return logits[:, 0, :], new_cache, None


def _lm_args(args):
    """Map decoder-only flags onto the seq2seq config builder."""
    args.encoder_embed_dim = getattr(
        args, "encoder_embed_dim", args.decoder_embed_dim
    )
    args.encoder_layers = getattr(args, "encoder_layers", "[(128, 1)]")
    args.attention = False
    return args


@register_model_architecture("fconv_lm", "fconv_lm")
def fconv_lm_architecture(args):
    """Reference fconv_lm.py:67-74."""
    args.dropout = getattr(args, "dropout", 0.1)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 128)
    args.decoder_layers = getattr(args, "decoder_layers", "[(1268, 4)] * 13")
    args.decoder_attention = getattr(args, "decoder_attention", "False")
    args.decoder_out_embed_dim = getattr(
        args, "decoder_out_embed_dim", args.decoder_embed_dim
    )
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )


@register_model_architecture("fconv_lm", "fconv_lm_dauphin_wikitext103")
def fconv_lm_dauphin_wikitext103(args):
    """Reference fconv_lm.py:77-90."""
    layers = "[(850, 6)] * 3 + [(850, 1)] * 1 + [(850, 5)] * 4"
    layers += " + [(850, 1)] * 1 + [(850, 4)] * 3 + [(1024, 4)] * 1"
    layers += " + [(2048, 4)] * 1"
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 280)
    args.decoder_layers = getattr(args, "decoder_layers", layers)
    args.decoder_attention = getattr(args, "decoder_attention", "False")
    fconv_lm_architecture(args)


@register_model_architecture("fconv_lm", "fconv_lm_dauphin_gbw")
def fconv_lm_dauphin_gbw(args):
    """Reference fconv_lm.py:93-104."""
    layers = "[(512, 5)]"
    layers += " + [(128, 1, 0), (128, 5, 0), (512, 1, 3)] * 3"
    layers += " + [(512, 1, 0), (512, 5, 0), (1024, 1, 3)] * 3"
    layers += " + [(1024, 1, 0), (1024, 5, 0), (2048, 1, 3)] * 6"
    layers += " + [(1024, 1, 0), (1024, 5, 0), (4096, 1, 3)]"
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 128)
    args.decoder_layers = getattr(args, "decoder_layers", layers)
    args.decoder_attention = getattr(args, "decoder_attention", "False")
    fconv_lm_architecture(args)


# ---------------------------------------------------------------------------
# lightconv_lm
# ---------------------------------------------------------------------------

@register_model("lightconv_lm")
class LightConvLanguageModel(LightConvModel):
    @staticmethod
    def add_args(parser):
        LightConvModel.add_args(parser)
        # reference lightconv_lm.py:57-59
        parser.add_argument("--adaptive-softmax-factor", type=float,
                            metavar="N", help="adaptive softmax factor")

    @classmethod
    def build_model(cls, args, task):
        lightconv_lm_architecture(args)
        args.encoder_layers = getattr(args, "encoder_layers", 1)
        args.encoder_embed_dim = getattr(
            args, "encoder_embed_dim", args.decoder_embed_dim
        )
        args.encoder_conv_dim = getattr(
            args, "encoder_conv_dim", args.decoder_conv_dim
        )
        args.encoder_ffn_embed_dim = getattr(
            args, "encoder_ffn_embed_dim", args.decoder_ffn_embed_dim
        )
        args.encoder_attention_heads = getattr(
            args, "encoder_attention_heads", args.decoder_attention_heads
        )
        args.encoder_glu = getattr(args, "encoder_glu", args.decoder_glu)
        args.encoder_conv_type = getattr(
            args, "encoder_conv_type", args.decoder_conv_type
        )
        args.encoder_normalize_before = getattr(
            args, "encoder_normalize_before", args.decoder_normalize_before
        )
        args.encoder_learned_pos = getattr(
            args, "encoder_learned_pos", args.decoder_learned_pos
        )
        args.encoder_kernel_size_list = getattr(
            args, "encoder_kernel_size_list", "[3]"
        )
        return LightConvModel.build_model.__func__(cls, args, task)

    def init(self, key):
        cfg = self.cfg
        p: Dict[str, Any] = {
            "decoder_embed": init_embedding(
                jax.random.fold_in(key, 1), cfg.tgt_vocab, cfg.embed_dim,
                cfg.padding_idx,
            ),
            "decoder_layers": [
                init_lightconv_decoder_layer(
                    jax.random.fold_in(key, 100 + i), lc, no_encoder_attn=True
                )
                for i, lc in enumerate(cfg.decoder_layers)
            ],
        }
        if cfg.learned_pos:
            p["embed_positions"] = self.pos.init(jax.random.fold_in(key, 2))
        if not cfg.share_input_output_embed:
            from ..ops.core import normal_init

            p["embed_out"] = normal_init(
                jax.random.fold_in(key, 3), (cfg.tgt_vocab, cfg.embed_dim),
                std=cfg.embed_dim ** -0.5,
            )
        return {"params": p, "state": {}}

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        logits, _ = self._decode(
            variables["params"], batch["src_tokens"], None,
            rng or RngStream(None), not training,
        )
        return (logits, {"attn": None}), {}

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        caches = []
        for lc in self.cfg.decoder_layers:
            caches.append(
                {"window": jnp.zeros((batch, lc.kernel_size, lc.conv_dim),
                                     dtype)}
            )
        return caches

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        logits, new_cache = self._decode(
            variables["params"], tokens, None, RngStream(None), True,
            step=step, cache=cache,
        )
        return logits[:, 0, :], new_cache, None


@register_model_architecture("lightconv_lm", "lightconv_lm")
def lightconv_lm_architecture(args):
    """Reference lightconv_lm.py base preset."""
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.0)
    args.relu_dropout = getattr(args, "relu_dropout", 0.0)
    args.input_dropout = getattr(args, "input_dropout", 0.0)
    args.weight_dropout = getattr(args, "weight_dropout", 0.0)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 2048)
    args.decoder_conv_dim = getattr(
        args, "decoder_conv_dim", args.decoder_embed_dim
    )
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 8)
    args.decoder_normalize_before = getattr(
        args, "decoder_normalize_before", True
    )
    args.decoder_learned_pos = getattr(args, "decoder_learned_pos", False)
    args.decoder_glu = getattr(args, "decoder_glu", True)
    args.decoder_conv_type = getattr(
        args, "decoder_conv_type", "lightweight"
    )
    args.weight_softmax = getattr(args, "weight_softmax", True)
    args.decoder_kernel_size_list = getattr(
        args, "decoder_kernel_size_list", "[3, 7, 15, 31, 31, 31]"
    )
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )


@register_model_architecture("lightconv_lm", "lightconv_lm_gbw")
def lightconv_lm_gbw(args):
    """Reference lightconv_lm.py:169-176."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 4096)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    lightconv_lm_architecture(args)


# ---------------------------------------------------------------------------
# lstm_lm
# ---------------------------------------------------------------------------

@register_model("lstm_lm")
class LSTMLanguageModel(Model):
    """Reference lstm_lm.py:14-111 (LSTMDecoder without attention)."""

    def __init__(self, cfg: LSTMConfig):
        self.cfg = cfg
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions

    @staticmethod
    def add_args(parser):
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--decoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-hidden-size", type=int, metavar="N")
        parser.add_argument("--decoder-layers", type=int, metavar="N")
        parser.add_argument("--decoder-out-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-dropout-in", type=float, metavar="D")
        parser.add_argument("--decoder-dropout-out", type=float, metavar="D")
        parser.add_argument("--share-decoder-input-output-embed",
                            action="store_true")

    @classmethod
    def build_model(cls, args, task):
        lstm_lm_architecture(args)
        d = task.target_dictionary
        cfg = LSTMConfig(
            src_vocab=len(d),
            tgt_vocab=len(d),
            encoder_embed_dim=args.decoder_embed_dim,
            encoder_hidden_size=args.decoder_hidden_size,
            encoder_layers=1,
            encoder_bidirectional=False,
            decoder_embed_dim=args.decoder_embed_dim,
            decoder_hidden_size=args.decoder_hidden_size,
            decoder_out_embed_dim=args.decoder_out_embed_dim,
            decoder_layers=args.decoder_layers,
            attention=False,
            dropout_in=getattr(args, "decoder_dropout_in", args.dropout),
            dropout_out=getattr(args, "decoder_dropout_out", args.dropout),
            padding_idx=d.pad(),
            share_input_output_embed=getattr(
                args, "share_decoder_input_output_embed", False
            ),
            max_positions=getattr(args, "tokens_per_sample", 1024),
        )
        return cls(cfg)

    def init(self, key):
        cfg = self.cfg
        p: Dict[str, Any] = {
            "embed": init_embedding(
                jax.random.fold_in(key, 0), cfg.tgt_vocab,
                cfg.decoder_embed_dim, cfg.padding_idx,
            ),
            "cells": [
                init_lstm_cell(
                    jax.random.fold_in(key, 10 + i),
                    cfg.decoder_embed_dim if i == 0
                    else cfg.decoder_hidden_size,
                    cfg.decoder_hidden_size,
                )
                for i in range(cfg.decoder_layers)
            ],
        }
        if cfg.decoder_hidden_size != cfg.decoder_out_embed_dim:
            p["fc_out_proj"] = init_linear(
                jax.random.fold_in(key, 2), cfg.decoder_hidden_size,
                cfg.decoder_out_embed_dim,
            )
        if not cfg.share_input_output_embed:
            from ..ops.core import normal_init

            p["embed_out"] = normal_init(
                jax.random.fold_in(key, 3),
                (cfg.tgt_vocab, cfg.decoder_out_embed_dim), std=0.1,
            )
        return {"params": p, "state": {}}

    def _logits(self, p, x):
        if "fc_out_proj" in p:
            x = linear(p["fc_out_proj"], x)
        w = (
            p["embed"]["w"] if self.cfg.share_input_output_embed
            else p["embed_out"]
        )
        return x @ w.T.astype(x.dtype)

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        tokens = batch["src_tokens"]
        x = embedding(p["embed"], tokens)
        x = dropout(x, cfg.dropout_in, rng, not training)
        b = tokens.shape[0]
        h = jnp.zeros((b, cfg.decoder_hidden_size), x.dtype)
        c = jnp.zeros((b, cfg.decoder_hidden_size), x.dtype)
        x = x.swapaxes(0, 1)  # (T, B, D) for the scan
        for i, cell in enumerate(p["cells"]):
            x, _ = _run_lstm(cell, x, h, c)
            x = dropout(x, cfg.dropout_out, rng, not training)
        x = x.swapaxes(0, 1)
        return (self._logits(p, x), {"attn": None}), {}

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        cfg = self.cfg
        return [
            {
                "h": jnp.zeros((batch, cfg.decoder_hidden_size), dtype),
                "c": jnp.zeros((batch, cfg.decoder_hidden_size), dtype),
            }
            for _ in range(cfg.decoder_layers)
        ]

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        p = variables["params"]
        x = embedding(p["embed"], tokens[:, 0])
        new_cache = []
        for cell, st in zip(p["cells"], cache):
            h, c = lstm_cell(cell, x, st["h"], st["c"])
            new_cache.append({"h": h, "c": c})
            x = h
        return self._logits(p, x), new_cache, None

    def encode(self, variables, src_tokens, src_lengths, rng=None,
               training=False):
        from .base import EncoderOut

        b = src_tokens.shape[0]
        return (
            EncoderOut(
                encoder_out=jnp.zeros((b, 1, self.cfg.decoder_hidden_size)),
                encoder_padding_mask=jnp.zeros((b, 1), bool),
            ),
            {},
        )


@register_model_architecture("lstm_lm", "lstm_lm")
def lstm_lm_architecture(args):
    """Reference lstm_lm.py:113-126."""
    args.dropout = getattr(args, "dropout", 0.1)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_hidden_size = getattr(
        args, "decoder_hidden_size", args.decoder_embed_dim
    )
    args.decoder_layers = getattr(args, "decoder_layers", 1)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 512)
    args.decoder_dropout_in = getattr(args, "decoder_dropout_in", args.dropout)
    args.decoder_dropout_out = getattr(
        args, "decoder_dropout_out", args.dropout
    )
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )
