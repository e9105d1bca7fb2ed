"""ConvS2S (Gehring et al. 2017) — the fconv model family.

Counterpart of fairseq/models/fconv.py (the architecture behind the
reference's only published number, WMT14 en-fr BLEU 40.83 with
``fconv_wmt_en_fr``): GLU conv encoder/decoder with per-layer attention,
sqrt(0.5) residual scaling, attention-output length normalization
(excluding pads), and the encoder GradMultiply 1/(2*n_attn) trick
(implemented as a custom-VJP grad scale).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import (
    NEG_INF,
    RngStream,
    dropout,
    embedding,
    init_embedding,
    linear,
    normal_init,
)
from ..ops.positional import PositionalEmbedding
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model


@jax.custom_vjp
def grad_multiply(x, scale):
    return x


def _gm_fwd(x, scale):
    return x, scale


def _gm_bwd(scale, g):
    return g * scale, None


grad_multiply.defvjp(_gm_fwd, _gm_bwd)


def extend_conv_spec(convolutions):
    """(dim, k) -> (dim, k, residual=1) (reference fconv.py)."""
    extended = []
    for spec in convolutions:
        if len(spec) == 3:
            extended.append(tuple(spec))
        elif len(spec) == 2:
            extended.append(tuple(spec) + (1,))
        else:
            raise Exception("invalid number of parameters in convolution spec")
    return tuple(extended)


def _init_fc(key, in_f, out_f, dropout_p=0.0):
    """reference Linear init N(0, sqrt((1-dropout)/in))."""
    return {
        "w": normal_init(key, (in_f, out_f), std=math.sqrt((1 - dropout_p) / in_f)),
        "b": jnp.zeros((out_f,), jnp.float32),
    }


def _init_conv(key, in_c, out_c, k, dropout_p):
    std = math.sqrt((4 * (1.0 - dropout_p)) / (k * in_c))
    return {
        "w": normal_init(key, (k, in_c, out_c), std=std),
        "b": jnp.zeros((out_c,), jnp.float32),
    }


def _conv1d(p, x, k, padding):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), padding=(padding,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + p["b"].astype(x.dtype)


class FConvConfig(NamedTuple):
    src_vocab: int
    tgt_vocab: int
    encoder_embed_dim: int
    decoder_embed_dim: int
    decoder_out_embed_dim: int
    encoder_convolutions: Tuple
    decoder_convolutions: Tuple
    attention: Tuple  # per decoder layer bool
    dropout: float
    padding_idx: int
    share_input_output_embed: bool
    max_positions: int = 1024


@register_model("fconv")
class FConvModel(Model):
    def __init__(self, cfg: FConvConfig):
        self.cfg = cfg
        self.pos_enc = PositionalEmbedding(
            cfg.max_positions, cfg.encoder_embed_dim, cfg.padding_idx, learned=True
        )
        self.pos_dec = PositionalEmbedding(
            cfg.max_positions, cfg.decoder_embed_dim, cfg.padding_idx, learned=True
        )
        self.num_attention_layers = sum(1 for a in cfg.attention if a)
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions

    @staticmethod
    def add_args(parser):
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--encoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--encoder-embed-path", type=str, metavar="STR")
        parser.add_argument("--encoder-layers", type=str, metavar="EXPR",
                            help="encoder layers [(dim, kernel_size), ...]")
        parser.add_argument("--decoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-embed-path", type=str, metavar="STR")
        parser.add_argument("--decoder-layers", type=str, metavar="EXPR")
        parser.add_argument("--decoder-out-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-attention", type=str, metavar="EXPR",
                            help="decoder attention [True, ...]")
        parser.add_argument("--share-input-output-embed", action="store_true")

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        import ast
        import re

        def parse(expr, default):
            if expr is None:
                return default
            if not isinstance(expr, str):
                return expr
            try:
                return ast.literal_eval(expr)
            except ValueError:
                # python list exprs like '[(512, 3)] * 9 + [(1024, 3)] * 4'
                out = []
                for part in expr.split("+"):
                    m = re.match(r"^\s*(\[.*\])\s*(?:\*\s*(\d+))?\s*$", part)
                    if not m:
                        raise
                    seg = ast.literal_eval(m.group(1))
                    out.extend(seg * int(m.group(2) or 1))
                return out

        enc_convs = extend_conv_spec(
            parse(args.encoder_layers, ((512, 3),) * 20)
        )
        dec_convs = extend_conv_spec(
            parse(args.decoder_layers, ((512, 3),) * 20)
        )
        attention = parse(args.decoder_attention, True)
        if isinstance(attention, bool):
            attention = [attention] * len(dec_convs)
        src_dict, tgt_dict = task.source_dictionary, task.target_dictionary
        cfg = FConvConfig(
            src_vocab=len(src_dict) if src_dict is not None else len(tgt_dict),
            tgt_vocab=len(tgt_dict),
            encoder_embed_dim=args.encoder_embed_dim,
            decoder_embed_dim=args.decoder_embed_dim,
            decoder_out_embed_dim=args.decoder_out_embed_dim,
            encoder_convolutions=enc_convs,
            decoder_convolutions=dec_convs,
            attention=tuple(attention),
            dropout=args.dropout,
            padding_idx=tgt_dict.pad(),
            share_input_output_embed=getattr(
                args, "share_input_output_embed", False
            ),
            max_positions=getattr(args, "max_source_positions", 1024),
        )
        return cls(cfg)

    # -- init -------------------------------------------------------------

    def init(self, key):
        cfg = self.cfg
        p: Dict[str, Any] = {
            "encoder_embed": init_embedding(
                jax.random.fold_in(key, 0), cfg.src_vocab,
                cfg.encoder_embed_dim, cfg.padding_idx,
            ),
            "encoder_pos": self.pos_enc.init(jax.random.fold_in(key, 2)),
            "decoder_embed": init_embedding(
                jax.random.fold_in(key, 1), cfg.tgt_vocab,
                cfg.decoder_embed_dim, cfg.padding_idx,
            ),
            "decoder_pos": self.pos_dec.init(jax.random.fold_in(key, 3)),
        }
        # encoder stack
        in_c = cfg.encoder_convolutions[0][0]
        p["enc_fc1"] = _init_fc(
            jax.random.fold_in(key, 4), cfg.encoder_embed_dim, in_c, cfg.dropout
        )
        p["enc_convs"], p["enc_projs"] = [], {}
        layer_in = [in_c]
        for i, (out_c, k, residual) in enumerate(cfg.encoder_convolutions):
            res_dim = out_c if residual == 0 else layer_in[-residual]
            if res_dim != out_c:
                p["enc_projs"][str(i)] = _init_fc(
                    jax.random.fold_in(key, 100 + i), res_dim, out_c
                )
            p["enc_convs"].append(
                _init_conv(jax.random.fold_in(key, 200 + i), in_c, 2 * out_c,
                           k, cfg.dropout)
            )
            in_c = out_c
            layer_in.append(out_c)
        p["enc_fc2"] = _init_fc(
            jax.random.fold_in(key, 5), in_c, cfg.encoder_embed_dim
        )

        # decoder stack
        in_c = cfg.decoder_convolutions[0][0]
        p["dec_fc1"] = _init_fc(
            jax.random.fold_in(key, 6), cfg.decoder_embed_dim, in_c, cfg.dropout
        )
        p["dec_convs"], p["dec_projs"], p["dec_attn"] = [], {}, {}
        layer_in = [in_c]
        for i, (out_c, k, residual) in enumerate(cfg.decoder_convolutions):
            res_dim = out_c if residual == 0 else layer_in[-residual]
            if res_dim != out_c:
                p["dec_projs"][str(i)] = _init_fc(
                    jax.random.fold_in(key, 300 + i), res_dim, out_c
                )
            p["dec_convs"].append(
                _init_conv(jax.random.fold_in(key, 400 + i), in_c, 2 * out_c,
                           k, cfg.dropout)
            )
            if cfg.attention[i]:
                p["dec_attn"][str(i)] = {
                    "in_projection": _init_fc(
                        jax.random.fold_in(key, 500 + i), out_c,
                        cfg.decoder_embed_dim,
                    ),
                    "out_projection": _init_fc(
                        jax.random.fold_in(key, 600 + i),
                        cfg.decoder_embed_dim, out_c,
                    ),
                }
            in_c = out_c
            layer_in.append(out_c)
        p["dec_fc2"] = _init_fc(
            jax.random.fold_in(key, 7), in_c, cfg.decoder_out_embed_dim
        )
        if not cfg.share_input_output_embed:
            p["dec_fc3"] = _init_fc(
                jax.random.fold_in(key, 8), cfg.decoder_out_embed_dim,
                cfg.tgt_vocab, cfg.dropout,
            )
        return {"params": p, "state": {}}

    # -- encoder ------------------------------------------------------------

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        x = embedding(p["encoder_embed"], src_tokens) + self.pos_enc.from_ids(
            p["encoder_pos"], src_tokens
        )
        x = dropout(x, cfg.dropout, rng, not training)
        input_embedding = x
        x = linear(p["enc_fc1"], x)
        padding_mask = src_tokens == cfg.padding_idx

        residuals = [x]
        for i, (out_c, k, residual) in enumerate(cfg.encoder_convolutions):
            if residual > 0:
                r = residuals[-residual]
                if str(i) in p["enc_projs"]:
                    r = linear(p["enc_projs"][str(i)], r)
            else:
                r = None
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
            x = dropout(x, cfg.dropout, rng, not training)
            if k % 2 == 1:
                pad = (k // 2, k // 2)
            else:
                pad = ((k - 1) // 2, k // 2)
            x = _conv1d(p["enc_convs"][i], x, k, pad)
            x = jax.nn.glu(x, axis=-1)
            if r is not None:
                x = (x + r) * math.sqrt(0.5)
            residuals.append(x)

        x = linear(p["enc_fc2"], x)
        x = jnp.where(padding_mask[:, :, None], 0.0, x)
        if training and self.num_attention_layers:
            x = grad_multiply(x, 1.0 / (2.0 * self.num_attention_layers))
        y = (x + input_embedding) * math.sqrt(0.5)
        return (
            EncoderOut(
                encoder_out=x,
                encoder_padding_mask=padding_mask,
                src_lengths=src_lengths,
                extras={"y": y},
            ),
            {},
        )

    # -- decoder ------------------------------------------------------------

    def _attention(self, ap, x, target_embedding, enc_x, enc_y, padding_mask):
        residual = x
        q = (linear(ap["in_projection"], x) + target_embedding) * math.sqrt(0.5)
        scores = jnp.einsum("btd,bsd->bts", q, enc_x)
        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, :], NEG_INF, scores)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bts,bsd->btd", w, enc_y)
        s = enc_y.shape[1]
        if padding_mask is None:
            out = out * (s * math.sqrt(1.0 / s))
        else:
            live = s - jnp.sum(padding_mask.astype(out.dtype), axis=1)  # (B,)
            scale = live * jax.lax.rsqrt(jnp.maximum(live, 1.0))
            out = out * scale[:, None, None]
        return (linear(ap["out_projection"], out) + residual) * math.sqrt(0.5), w

    def _decode(self, p, prev_tokens, enc, rng, deterministic, step=None,
                cache=None):
        cfg = self.cfg
        pos = self.pos_dec.from_ids(p["decoder_pos"], prev_tokens, step=step)
        x = embedding(p["decoder_embed"], prev_tokens) + pos
        x = dropout(x, cfg.dropout, rng, deterministic)
        target_embedding = x
        x = linear(p["dec_fc1"], x)

        new_cache = [] if cache is not None else None
        residuals = [x]
        for i, (out_c, k, residual) in enumerate(cfg.decoder_convolutions):
            if residual > 0:
                r = residuals[-residual]
                if str(i) in p["dec_projs"]:
                    r = linear(p["dec_projs"][str(i)], r)
            else:
                r = None
            x = dropout(x, cfg.dropout, rng, deterministic)
            if cache is not None:
                window = jnp.concatenate([cache[i], x], axis=1)  # (B, k, C)
                new_cache.append(window[:, 1:])
                x = jnp.einsum(
                    "bkc,kcd->bd", window, p["dec_convs"][i]["w"].astype(x.dtype)
                )[:, None, :] + p["dec_convs"][i]["b"].astype(x.dtype)
            else:
                x = _conv1d(p["dec_convs"][i], x, k, (k - 1, 0))
            x = jax.nn.glu(x, axis=-1)
            if str(i) in p["dec_attn"]:
                x, _ = self._attention(
                    p["dec_attn"][str(i)], x, target_embedding,
                    enc.encoder_out, enc.extras["y"], enc.encoder_padding_mask,
                )
            if r is not None:
                x = (x + r) * math.sqrt(0.5)
            residuals.append(x)

        x = linear(p["dec_fc2"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)
        if cfg.share_input_output_embed:
            logits = x @ p["decoder_embed"]["w"].T.astype(x.dtype)
        else:
            logits = linear(p["dec_fc3"], x)
        return logits, new_cache

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        rng = rng or RngStream(None)
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits, _ = self._decode(
            variables["params"], batch["prev_output_tokens"], enc, rng,
            not training,
        )
        return (logits, {"attn": None, "encoder_out": enc}), {}

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        cfg = self.cfg
        caches = []
        in_c = cfg.decoder_convolutions[0][0]
        for out_c, k, residual in cfg.decoder_convolutions:
            caches.append(jnp.zeros((batch, k - 1, in_c), dtype))
            in_c = out_c
        return caches

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        logits, new_cache = self._decode(
            variables["params"], tokens, encoder_out, RngStream(None), True,
            step=step, cache=cache,
        )
        return logits[:, 0, :], new_cache, None


@register_model_architecture("fconv", "fconv")
def base_architecture(args):
    args.dropout = getattr(args, "dropout", 0.1)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_embed_path = getattr(args, "encoder_embed_path", None)
    args.encoder_layers = getattr(args, "encoder_layers", "[(512, 3)] * 20")
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_embed_path = getattr(args, "decoder_embed_path", None)
    args.decoder_layers = getattr(args, "decoder_layers", "[(512, 3)] * 20")
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 256)
    args.decoder_attention = getattr(args, "decoder_attention", "True")
    args.share_input_output_embed = getattr(args, "share_input_output_embed", False)


@register_model_architecture("fconv", "fconv_iwslt_de_en")
def fconv_iwslt_de_en(args):
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 256)
    args.encoder_layers = getattr(args, "encoder_layers", "[(256, 3)] * 4")
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 256)
    args.decoder_layers = getattr(args, "decoder_layers", "[(256, 3)] * 3")
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 256)
    base_architecture(args)


@register_model_architecture("fconv", "fconv_wmt_en_ro")
def fconv_wmt_en_ro(args):
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 512)
    base_architecture(args)


@register_model_architecture("fconv", "fconv_wmt_en_de")
def fconv_wmt_en_de(args):
    convs = "[(512, 3)] * 9 + [(1024, 3)] * 4 + [(2048, 1)] * 2"
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 768)
    args.encoder_layers = getattr(args, "encoder_layers", convs)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 768)
    args.decoder_layers = getattr(args, "decoder_layers", convs)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 512)
    base_architecture(args)


@register_model_architecture("fconv", "fconv_wmt_en_fr")
def fconv_wmt_en_fr(args):
    convs = (
        "[(512, 3)] * 6 + [(768, 3)] * 4 + [(1024, 3)] * 3 + "
        "[(2048, 1)] * 1 + [(4096, 1)] * 1"
    )
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 768)
    args.encoder_layers = getattr(args, "encoder_layers", convs)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 768)
    args.decoder_layers = getattr(args, "decoder_layers", convs)
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 512)
    base_architecture(args)
