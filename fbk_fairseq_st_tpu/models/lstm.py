"""LSTM encoder-decoder (reference fairseq/models/lstm.py).

Bi/uni-directional LSTM encoder, attention decoder with input feeding
(Luong-style AttentionLayer: dot over projected query, tanh output proj).
Recurrence runs as ``lax.scan`` over time — the decoder's scan carries
(hiddens, cells, input_feed), which doubles as the incremental-decoding
cache so step mode reuses the same cell code.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import (
    NEG_INF,
    RngStream,
    dropout,
    embedding,
    init_embedding,
    init_linear,
    linear,
    xavier_uniform,
)
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .transformer_args import add_transformer_args


def init_lstm_cell(key, input_size: int, hidden_size: int):
    k1, k2 = jax.random.split(key)
    # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H)); gate order i, f, g, o
    bound = hidden_size ** -0.5
    return {
        "wi": jax.random.uniform(k1, (input_size, 4 * hidden_size), jnp.float32,
                                 -bound, bound),
        "wh": jax.random.uniform(k2, (hidden_size, 4 * hidden_size), jnp.float32,
                                 -bound, bound),
        "b": jnp.zeros((4 * hidden_size,), jnp.float32),
    }


def lstm_cell(p, x, h, c):
    gates = x @ p["wi"].astype(x.dtype) + h @ p["wh"].astype(x.dtype) + p[
        "b"
    ].astype(x.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _run_lstm(p, xs, h0, c0, reverse=False):
    """xs: (T, B, D) -> (outputs (T, B, H), (hT, cT))."""

    def step(carry, x):
        h, c = carry
        h, c = lstm_cell(p, x, h, c)
        return (h, c), h

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return ys, (hT, cT)


class LSTMConfig(NamedTuple):
    src_vocab: int
    tgt_vocab: int
    encoder_embed_dim: int
    encoder_hidden_size: int
    encoder_layers: int
    encoder_bidirectional: bool
    decoder_embed_dim: int
    decoder_hidden_size: int
    decoder_out_embed_dim: int
    decoder_layers: int
    attention: bool
    dropout_in: float
    dropout_out: float
    padding_idx: int
    share_input_output_embed: bool
    max_positions: int = 1024


@register_model("lstm")
class LSTMModel(Model):
    def __init__(self, cfg: LSTMConfig, freeze_encoder_embed: bool = False,
                 freeze_decoder_embed: bool = False):
        self.cfg = cfg
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions
        self._freeze_encoder_embed = freeze_encoder_embed
        self._freeze_decoder_embed = freeze_decoder_embed

    def frozen_param_filter(self, path: str) -> bool:
        """--encoder/decoder-freeze-embed (reference lstm.py:42-56,147-150:
        embedding.weight.requires_grad = False); here the trainer zeroes
        the gradient leaf instead."""
        return (self._freeze_encoder_embed and path.endswith("encoder_embed/w")) or (
            self._freeze_decoder_embed and path.endswith("decoder_embed/w")
        )

    @staticmethod
    def add_args(parser):
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--encoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--encoder-hidden-size", type=int, metavar="N")
        parser.add_argument("--encoder-layers", type=int, metavar="N")
        parser.add_argument("--encoder-bidirectional", action="store_true")
        parser.add_argument("--decoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-hidden-size", type=int, metavar="N")
        parser.add_argument("--decoder-layers", type=int, metavar="N")
        parser.add_argument("--decoder-out-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-attention", type=str, metavar="BOOL")
        parser.add_argument("--share-decoder-input-output-embed", action="store_true")
        parser.add_argument("--encoder-dropout-in", type=float, metavar="D")
        parser.add_argument("--encoder-dropout-out", type=float, metavar="D")
        parser.add_argument("--decoder-dropout-in", type=float, metavar="D")
        parser.add_argument("--decoder-dropout-out", type=float, metavar="D")
        # reference lstm.py:42-56 (pretrained-embedding freezing)
        parser.add_argument("--encoder-freeze-embed", action="store_true",
                            help="freeze encoder embeddings")
        parser.add_argument("--decoder-freeze-embed", action="store_true",
                            help="freeze decoder embeddings")
        parser.add_argument("--encoder-embed-path", type=str, metavar="STR",
                            help="path to pre-trained encoder embedding")
        parser.add_argument("--decoder-embed-path", type=str, metavar="STR",
                            help="path to pre-trained decoder embedding")

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        src_dict, tgt_dict = task.source_dictionary, task.target_dictionary
        cfg = LSTMConfig(
            src_vocab=len(src_dict) if src_dict is not None else len(tgt_dict),
            tgt_vocab=len(tgt_dict),
            encoder_embed_dim=args.encoder_embed_dim,
            encoder_hidden_size=args.encoder_hidden_size,
            encoder_layers=args.encoder_layers,
            encoder_bidirectional=args.encoder_bidirectional,
            decoder_embed_dim=args.decoder_embed_dim,
            decoder_hidden_size=args.decoder_hidden_size,
            decoder_out_embed_dim=args.decoder_out_embed_dim,
            decoder_layers=args.decoder_layers,
            attention=str(getattr(args, "decoder_attention", "1")).lower()
            in ("1", "true"),
            dropout_in=getattr(args, "encoder_dropout_in", args.dropout),
            dropout_out=getattr(args, "encoder_dropout_out", args.dropout),
            padding_idx=tgt_dict.pad(),
            share_input_output_embed=getattr(
                args, "share_decoder_input_output_embed", False
            ),
            max_positions=getattr(args, "max_source_positions", 1024),
        )
        return cls(
            cfg,
            freeze_encoder_embed=getattr(args, "encoder_freeze_embed", False),
            freeze_decoder_embed=getattr(args, "decoder_freeze_embed", False),
        )

    # -- init -----------------------------------------------------------------

    def init(self, key):
        cfg = self.cfg
        enc_out_units = cfg.encoder_hidden_size * (
            2 if cfg.encoder_bidirectional else 1
        )
        p: Dict[str, Any] = {
            "encoder_embed": init_embedding(
                jax.random.fold_in(key, 0), cfg.src_vocab,
                cfg.encoder_embed_dim, cfg.padding_idx,
            ),
            "decoder_embed": init_embedding(
                jax.random.fold_in(key, 1), cfg.tgt_vocab,
                cfg.decoder_embed_dim, cfg.padding_idx,
            ),
            "encoder_fwd": [], "encoder_bwd": [],
            "decoder_cells": [],
        }
        in_dim = cfg.encoder_embed_dim
        for i in range(cfg.encoder_layers):
            p["encoder_fwd"].append(
                init_lstm_cell(jax.random.fold_in(key, 10 + i), in_dim,
                               cfg.encoder_hidden_size)
            )
            if cfg.encoder_bidirectional:
                p["encoder_bwd"].append(
                    init_lstm_cell(jax.random.fold_in(key, 50 + i), in_dim,
                                   cfg.encoder_hidden_size)
                )
            in_dim = enc_out_units
        # decoder cells: layer 0 input = embed + input_feed(hidden)
        in_dim = cfg.decoder_embed_dim + (
            cfg.decoder_hidden_size if enc_out_units > 0 else 0
        )
        for i in range(cfg.decoder_layers):
            p["decoder_cells"].append(
                init_lstm_cell(jax.random.fold_in(key, 100 + i), in_dim,
                               cfg.decoder_hidden_size)
            )
            in_dim = cfg.decoder_hidden_size
        if enc_out_units != cfg.decoder_hidden_size:
            p["encoder_hidden_proj"] = [
                init_linear(jax.random.fold_in(key, 200 + i), enc_out_units,
                            cfg.decoder_hidden_size)
                for i in range(cfg.decoder_layers)
            ]
            p["encoder_cell_proj"] = [
                init_linear(jax.random.fold_in(key, 300 + i), enc_out_units,
                            cfg.decoder_hidden_size)
                for i in range(cfg.decoder_layers)
            ]
        if cfg.attention:
            p["attn_input_proj"] = init_linear(
                jax.random.fold_in(key, 400), cfg.decoder_hidden_size,
                enc_out_units, bias=False,
            )
            p["attn_output_proj"] = init_linear(
                jax.random.fold_in(key, 401),
                cfg.decoder_hidden_size + enc_out_units,
                cfg.decoder_hidden_size, bias=False,
            )
        if cfg.decoder_hidden_size != cfg.decoder_out_embed_dim:
            p["additional_fc"] = init_linear(
                jax.random.fold_in(key, 402), cfg.decoder_hidden_size,
                cfg.decoder_out_embed_dim,
            )
        if not cfg.share_input_output_embed:
            p["fc_out"] = init_linear(
                jax.random.fold_in(key, 403), cfg.decoder_out_embed_dim,
                cfg.tgt_vocab,
            )
        return {"params": p, "state": {}}

    # -- encoder ---------------------------------------------------------------

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        x = embedding(p["encoder_embed"], src_tokens)
        x = dropout(x, cfg.dropout_in, rng, not training)
        xs = x.transpose(1, 0, 2)  # (T, B, D)
        b = src_tokens.shape[0]
        h0 = jnp.zeros((b, cfg.encoder_hidden_size), xs.dtype)
        finals_h, finals_c = [], []
        padding_mask = src_tokens == cfg.padding_idx
        for i in range(cfg.encoder_layers):
            fwd, (hf, cf) = _run_lstm(p["encoder_fwd"][i], xs, h0, h0)
            if cfg.encoder_bidirectional:
                bwd, (hb, cb) = _run_lstm(p["encoder_bwd"][i], xs, h0, h0,
                                          reverse=True)
                xs = jnp.concatenate([fwd, bwd], axis=-1)
                finals_h.append(jnp.concatenate([hf, hb], axis=-1))
                finals_c.append(jnp.concatenate([cf, cb], axis=-1))
            else:
                xs = fwd
                finals_h.append(hf)
                finals_c.append(cf)
            xs = dropout(xs, cfg.dropout_out, rng, not training)
        enc = EncoderOut(
            encoder_out=xs.transpose(1, 0, 2),  # (B, T, H)
            encoder_padding_mask=padding_mask,
            src_lengths=src_lengths,
            # final (B, H) states per layer ride the EncoderOut so
            # generators beam-replicate them with everything else
            extras={"final_h": finals_h, "final_c": finals_c},
        )
        return enc, {}

    def _init_decoder_state(self, p, extras, batch: int, dtype):
        cfg = self.cfg
        hiddens, cells = [], []
        for i in range(cfg.decoder_layers):
            h = extras["final_h"][min(i, len(extras["final_h"]) - 1)]
            c = extras["final_c"][min(i, len(extras["final_c"]) - 1)]
            if "encoder_hidden_proj" in p:
                h = linear(p["encoder_hidden_proj"][i], h)
                c = linear(p["encoder_cell_proj"][i], c)
            hiddens.append(h.astype(dtype))
            cells.append(c.astype(dtype))
        input_feed = jnp.zeros((batch, cfg.decoder_hidden_size), dtype)
        return hiddens, cells, input_feed

    def _attention(self, p, query, source_hids, padding_mask):
        """query: (B, H); source_hids: (B, T, E)."""
        x = linear(p["attn_input_proj"], query)  # (B, E)
        scores = jnp.einsum("bte,be->bt", source_hids, x)
        if padding_mask is not None:
            scores = jnp.where(padding_mask, NEG_INF, scores)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(query.dtype)
        ctx = jnp.einsum("bt,bte->be", w, source_hids)
        out = jnp.tanh(
            linear(p["attn_output_proj"], jnp.concatenate([ctx, query], axis=-1))
        )
        return out, w

    def _decoder_step(self, p, emb_t, state, enc_out, padding_mask, rng,
                      deterministic):
        cfg = self.cfg
        hiddens, cells, input_feed = state
        x = jnp.concatenate([emb_t, input_feed], axis=-1)
        new_h, new_c = [], []
        for i, cell in enumerate(p["decoder_cells"]):
            h, c = lstm_cell(cell, x, hiddens[i], cells[i])
            x = dropout(h, cfg.dropout_out, rng, deterministic)
            new_h.append(h)
            new_c.append(c)
        if cfg.attention:
            out, _ = self._attention(p, new_h[-1], enc_out, padding_mask)
        else:
            out = new_h[-1]
        out = dropout(out, cfg.dropout_out, rng, deterministic)
        return out, (new_h, new_c, out)

    def _output_layer(self, p, x):
        cfg = self.cfg
        if "additional_fc" in p:
            x = linear(p["additional_fc"], x)
        if cfg.share_input_output_embed:
            return x @ p["decoder_embed"]["w"].T.astype(x.dtype)
        return linear(p["fc_out"], x)

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        extras = enc.extras
        prev = batch["prev_output_tokens"]
        b, t = prev.shape
        emb = embedding(p["decoder_embed"], prev)
        emb = dropout(emb, cfg.dropout_in, rng, not training)
        state = self._init_decoder_state(p, extras, b, emb.dtype)

        def step(carry, e_t):
            out, new_state = self._decoder_step(
                p, e_t, carry, enc.encoder_out, enc.encoder_padding_mask,
                RngStream(None), True,
            )
            return new_state, out

        _, outs = jax.lax.scan(step, state, emb.transpose(1, 0, 2))
        x = outs.transpose(1, 0, 2)  # (B, T, H)
        if training:
            x = dropout(x, cfg.dropout_out, rng, False)
        logits = self._output_layer(p, x)
        return (logits, {"attn": None, "encoder_out": enc}), {}

    # -- incremental decoding ---------------------------------------------------

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        p = variables["params"]
        state = self._init_decoder_state(p, encoder_out.extras, batch, dtype)
        return {"h": list(state[0]), "c": list(state[1]), "feed": state[2]}

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        p = variables["params"]
        emb = embedding(p["decoder_embed"], tokens[:, 0])
        out, (h, c, feed) = self._decoder_step(
            p, emb, (cache["h"], cache["c"], cache["feed"]),
            encoder_out.encoder_out, encoder_out.encoder_padding_mask,
            RngStream(None), True,
        )
        logits = self._output_layer(p, out)
        return logits, {"h": h, "c": c, "feed": feed}, None


@register_model_architecture("lstm", "lstm")
def base_architecture(args):
    """Reference lstm.py base defaults."""
    args.dropout = getattr(args, "dropout", 0.1)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_hidden_size = getattr(
        args, "encoder_hidden_size", args.encoder_embed_dim
    )
    args.encoder_layers = getattr(args, "encoder_layers", 1)
    args.encoder_bidirectional = getattr(args, "encoder_bidirectional", False)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_hidden_size = getattr(
        args, "decoder_hidden_size", args.decoder_embed_dim
    )
    args.decoder_layers = getattr(args, "decoder_layers", 1)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 512)
    args.decoder_attention = getattr(args, "decoder_attention", "1")
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )
    args.encoder_freeze_embed = getattr(args, "encoder_freeze_embed", False)
    args.decoder_freeze_embed = getattr(args, "decoder_freeze_embed", False)
    args.encoder_dropout_in = getattr(args, "encoder_dropout_in", args.dropout)
    args.encoder_dropout_out = getattr(args, "encoder_dropout_out", args.dropout)
    args.decoder_dropout_in = getattr(args, "decoder_dropout_in", args.dropout)
    args.decoder_dropout_out = getattr(args, "decoder_dropout_out", args.dropout)


@register_model_architecture("lstm", "lstm_wiseman_iwslt_de_en")
def lstm_wiseman_iwslt_de_en(args):
    args.dropout = getattr(args, "dropout", 0.1)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 256)
    args.encoder_dropout_out = getattr(args, "encoder_dropout_out", 0)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 256)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 256)
    base_architecture(args)


@register_model_architecture("lstm", "lstm_luong_wmt_en_de")
def lstm_luong_wmt_en_de(args):
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1000)
    args.encoder_layers = getattr(args, "encoder_layers", 4)
    args.encoder_dropout_out = getattr(args, "encoder_dropout_out", 0)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1000)
    args.decoder_layers = getattr(args, "decoder_layers", 4)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 1000)
    base_architecture(args)
