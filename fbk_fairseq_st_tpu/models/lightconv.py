"""LightConv / DynamicConv translation models (Wu et al. 2019).

Counterpart of fairseq/models/lightconv.py: encoder/decoder layers replace
self-attention with (dynamic) lightweight convolutions — GLU input
projection, per-layer kernel sizes, softmax-normalized weights — plus the
usual encoder attention and FFN in the decoder. The reference's CUDA
kernels (modules/{light,dynamic}conv_layer/) map to the Pallas kernel in
ops/pallas/conv_kernels.py (enabled on TPU), with the XLA unfold+einsum
path everywhere else and for the backward pass.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.core import (
    RngStream,
    dropout,
    embedding,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    normal_init,
)
from ..ops.attention import MHAConfig, init_mha, mha, precompute_cross_cache
from ..ops.lightconv import (
    dynamic_conv,
    dynamic_conv_step,
    init_dynamic_conv,
    init_lightweight_conv,
    lightweight_conv,
    lightweight_conv_step,
)
from ..ops.positional import PositionalEmbedding
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .transformer_args import add_transformer_args


class LightConvLayerConfig(NamedTuple):
    embed_dim: int
    conv_dim: int
    ffn_dim: int
    heads: int
    kernel_size: int
    conv_type: str  # 'lightweight' | 'dynamic'
    glu: bool
    weight_softmax: bool
    dropout: float
    weight_dropout: float
    relu_dropout: float
    input_dropout: float
    normalize_before: bool
    attention_dropout: float = 0.0


def _init_conv(key, cfg: LightConvLayerConfig):
    if cfg.conv_type == "lightweight":
        return init_lightweight_conv(key, cfg.conv_dim, cfg.kernel_size, cfg.heads)
    elif cfg.conv_type == "dynamic":
        return init_dynamic_conv(key, cfg.conv_dim, cfg.kernel_size, cfg.heads)
    raise NotImplementedError(cfg.conv_type)


def _apply_conv(params, cfg: LightConvLayerConfig, x, padding_l, rng,
                deterministic, use_pallas=False):
    if cfg.conv_type == "lightweight":
        return lightweight_conv(
            params, x, cfg.kernel_size, cfg.heads, padding_l,
            weight_softmax=cfg.weight_softmax,
            weight_dropout=cfg.weight_dropout,
            rng=rng, deterministic=deterministic,
        )
    return dynamic_conv(
        params, x, cfg.kernel_size, cfg.heads, padding_l,
        weight_softmax=cfg.weight_softmax,
        weight_dropout=cfg.weight_dropout,
        rng=rng, deterministic=deterministic,
        use_pallas=use_pallas,
    )


def _conv_step(params, cfg: LightConvLayerConfig, window):
    if cfg.conv_type == "lightweight":
        return lightweight_conv_step(
            params, window, cfg.kernel_size, cfg.heads, cfg.weight_softmax
        )
    return dynamic_conv_step(
        params, window, cfg.kernel_size, cfg.heads, cfg.weight_softmax
    )


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def init_lightconv_encoder_layer(key, cfg: LightConvLayerConfig):
    ks = jax.random.split(key, 5)
    p = {
        "linear1": init_linear(
            ks[0], cfg.embed_dim, 2 * cfg.conv_dim if cfg.glu else cfg.conv_dim
        ),
        "conv": _init_conv(ks[1], cfg),
        "linear2": init_linear(ks[2], cfg.conv_dim, cfg.embed_dim),
        "conv_ln": init_layer_norm(cfg.embed_dim),
        "fc1": init_linear(ks[3], cfg.embed_dim, cfg.ffn_dim),
        "fc2": init_linear(ks[4], cfg.ffn_dim, cfg.embed_dim),
        "final_ln": init_layer_norm(cfg.embed_dim),
    }
    return p


def lightconv_encoder_layer(params, cfg: LightConvLayerConfig, x,
                            encoder_padding_mask=None, rng=None,
                            deterministic=True, use_pallas=False):
    rng = rng or RngStream(None)
    k = cfg.kernel_size
    padding_l = k // 2 if k % 2 == 1 else (k - 1) // 2  # centered

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["conv_ln"], x)
    x = dropout(x, cfg.input_dropout, rng, deterministic)
    x = linear(params["linear1"], x)
    if cfg.glu:
        x = jax.nn.glu(x, axis=-1)
    if encoder_padding_mask is not None:
        x = jnp.where(encoder_padding_mask[:, :, None], 0.0, x)
    x = _apply_conv(
        params["conv"], cfg, x, padding_l, rng, deterministic, use_pallas
    )
    x = linear(params["linear2"], x)
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["conv_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["final_ln"], x)
    x = jax.nn.relu(linear(params["fc1"], x))
    x = dropout(x, cfg.relu_dropout, rng, deterministic)
    x = linear(params["fc2"], x)
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["final_ln"], x)
    return x


def init_lightconv_decoder_layer(key, cfg: LightConvLayerConfig,
                                 no_encoder_attn: bool = False):
    ks = jax.random.split(key, 6)
    p = init_lightconv_encoder_layer(ks[0], cfg)
    if not no_encoder_attn:
        p["encoder_attn"] = init_mha(
            ks[1], MHAConfig(cfg.embed_dim, cfg.heads, dropout=cfg.attention_dropout)
        )
        p["encoder_attn_ln"] = init_layer_norm(cfg.embed_dim)
    return p


def lightconv_decoder_layer(params, cfg: LightConvLayerConfig, x,
                            encoder_out=None, encoder_padding_mask=None,
                            rng=None, deterministic=True,
                            cache=None, use_pallas=False):
    """Causal conv (padding_l = K-1) + encoder attention + FFN.

    With *cache*: x is (B, 1, C); cache = {'window': (B, K, C_conv),
    'cross': precomputed encoder K/V}. Returns (x, new_cache).
    """
    rng = rng or RngStream(None)
    attn_cfg = MHAConfig(cfg.embed_dim, cfg.heads, dropout=cfg.attention_dropout)
    new_cache = {} if cache is not None else None

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["conv_ln"], x)
    x = dropout(x, cfg.input_dropout, rng, deterministic)
    x = linear(params["linear1"], x)
    if cfg.glu:
        x = jax.nn.glu(x, axis=-1)
    if cache is not None:
        window = jnp.concatenate([cache["window"][:, 1:], x], axis=1)
        new_cache["window"] = window
        x = _conv_step(params["conv"], cfg, window)[:, None, :]
    else:
        x = _apply_conv(
            params["conv"], cfg, x, cfg.kernel_size - 1, rng, deterministic,
            use_pallas,
        )
    x = linear(params["linear2"], x)
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["conv_ln"], x)

    if "encoder_attn" not in params:  # decoder-only LM layer
        residual = x
        if cfg.normalize_before:
            x = layer_norm(params["final_ln"], x)
        x = jax.nn.relu(linear(params["fc1"], x))
        x = dropout(x, cfg.relu_dropout, rng, deterministic)
        x = linear(params["fc2"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)
        x = residual + x
        if not cfg.normalize_before:
            x = layer_norm(params["final_ln"], x)
        return x, new_cache

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)
    if cache is not None and "cross" in cache:
        x, _, _ = mha(
            params["encoder_attn"], attn_cfg, x,
            key_padding_mask=encoder_padding_mask,
            rng=rng, deterministic=deterministic,
            cache=cache["cross"], static_kv=True,
        )
        new_cache["cross"] = cache["cross"]
    else:
        x, _, _ = mha(
            params["encoder_attn"], attn_cfg, x,
            key=encoder_out, key_padding_mask=encoder_padding_mask,
            rng=rng, deterministic=deterministic,
        )
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["final_ln"], x)
    x = jax.nn.relu(linear(params["fc1"], x))
    x = dropout(x, cfg.relu_dropout, rng, deterministic)
    x = linear(params["fc2"], x)
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["final_ln"], x)
    return x, new_cache


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class LightConvModelConfig(NamedTuple):
    src_vocab: int
    tgt_vocab: int
    embed_dim: int
    ffn_dim: int
    encoder_layers: tuple
    decoder_layers: tuple  # per-layer LightConvLayerConfig
    padding_idx: int
    max_source_positions: int
    max_target_positions: int
    dropout: float
    share_input_output_embed: bool
    learned_pos: bool


@register_model("lightconv")
class LightConvModel(Model):
    def __init__(self, cfg: LightConvModelConfig):
        self.cfg = cfg
        self.embed_scale = cfg.embed_dim ** 0.5
        self.pos = PositionalEmbedding(
            max(cfg.max_source_positions, cfg.max_target_positions),
            cfg.embed_dim, cfg.padding_idx, cfg.learned_pos,
        )
        self.max_source_positions = cfg.max_source_positions
        self.max_target_positions = cfg.max_target_positions
        self.use_pallas = jax.default_backend() == "tpu"

    @staticmethod
    def add_args(parser):
        add_transformer_args(parser)
        parser.add_argument("--encoder-conv-dim", type=int, metavar="N")
        parser.add_argument("--decoder-conv-dim", type=int, metavar="N")
        parser.add_argument("--encoder-glu", type=lambda x: str(x).lower() == "true",
                            default=None)
        parser.add_argument("--decoder-glu", type=lambda x: str(x).lower() == "true",
                            default=None)
        parser.add_argument("--encoder-conv-type", default="lightweight", type=str,
                            choices=["lightweight", "dynamic"])
        parser.add_argument("--decoder-conv-type", default="lightweight", type=str,
                            choices=["lightweight", "dynamic"])
        parser.add_argument("--weight-softmax", default=True,
                            type=lambda x: str(x).lower() == "true")
        parser.add_argument("--weight-dropout", type=float, metavar="D")
        parser.add_argument("--input-dropout", type=float, metavar="D")
        # --relu-dropout (reference lightconv.py:71-72) comes in via
        # add_transformer_args as an alias of --activation-dropout
        parser.add_argument("--encoder-kernel-size-list", type=str, metavar="EXPR",
                            help="per-layer kernel sizes, e.g. [3,7,15,31,31,31,31]")
        parser.add_argument("--decoder-kernel-size-list", type=str, metavar="EXPR")

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        import ast

        def parse_list(v, default):
            if v is None:
                return default
            if isinstance(v, str):
                return list(ast.literal_eval(v))
            return list(v)

        enc_kernels = parse_list(
            getattr(args, "encoder_kernel_size_list", None),
            [3, 7, 15, 31, 31, 31, 31],
        )
        dec_kernels = parse_list(
            getattr(args, "decoder_kernel_size_list", None),
            [3, 7, 15, 31, 31, 31],
        )
        if len(enc_kernels) == 1:
            enc_kernels = enc_kernels * args.encoder_layers
        if len(dec_kernels) == 1:
            dec_kernels = dec_kernels * args.decoder_layers
        enc_kernels = enc_kernels[: args.encoder_layers]
        dec_kernels = dec_kernels[: args.decoder_layers]

        def layer_cfg(kernel, is_decoder):
            return LightConvLayerConfig(
                embed_dim=args.encoder_embed_dim if not is_decoder else args.decoder_embed_dim,
                conv_dim=args.encoder_conv_dim if not is_decoder else args.decoder_conv_dim,
                ffn_dim=args.encoder_ffn_embed_dim if not is_decoder else args.decoder_ffn_embed_dim,
                heads=args.encoder_attention_heads if not is_decoder else args.decoder_attention_heads,
                kernel_size=kernel,
                conv_type=args.encoder_conv_type if not is_decoder else args.decoder_conv_type,
                glu=args.encoder_glu if not is_decoder else args.decoder_glu,
                weight_softmax=args.weight_softmax,
                dropout=args.dropout,
                weight_dropout=args.weight_dropout,
                relu_dropout=args.relu_dropout,
                input_dropout=args.input_dropout,
                normalize_before=(
                    args.encoder_normalize_before if not is_decoder
                    else args.decoder_normalize_before
                ),
                attention_dropout=args.attention_dropout,
            )

        src_dict, tgt_dict = task.source_dictionary, task.target_dictionary
        cfg = LightConvModelConfig(
            src_vocab=len(src_dict) if src_dict is not None else len(tgt_dict),
            tgt_vocab=len(tgt_dict),
            embed_dim=args.encoder_embed_dim,
            ffn_dim=args.encoder_ffn_embed_dim,
            encoder_layers=tuple(layer_cfg(k, False) for k in enc_kernels),
            decoder_layers=tuple(layer_cfg(k, True) for k in dec_kernels),
            padding_idx=tgt_dict.pad(),
            max_source_positions=getattr(args, "max_source_positions", 1024),
            max_target_positions=getattr(args, "max_target_positions", 1024),
            dropout=args.dropout,
            share_input_output_embed=getattr(
                args, "share_decoder_input_output_embed", False
            ),
            learned_pos=args.encoder_learned_pos,
        )
        return cls(cfg)

    def init(self, key):
        cfg = self.cfg
        p: Dict[str, Any] = {
            "encoder_embed": init_embedding(
                jax.random.fold_in(key, 0), cfg.src_vocab, cfg.embed_dim,
                cfg.padding_idx,
            ),
            "decoder_embed": init_embedding(
                jax.random.fold_in(key, 1), cfg.tgt_vocab, cfg.embed_dim,
                cfg.padding_idx,
            ),
            "encoder_layers": [
                init_lightconv_encoder_layer(jax.random.fold_in(key, 10 + i), lc)
                for i, lc in enumerate(cfg.encoder_layers)
            ],
            "decoder_layers": [
                init_lightconv_decoder_layer(jax.random.fold_in(key, 100 + i), lc)
                for i, lc in enumerate(cfg.decoder_layers)
            ],
        }
        if not cfg.share_input_output_embed:
            p["embed_out"] = normal_init(
                jax.random.fold_in(key, 999),
                (cfg.tgt_vocab, cfg.embed_dim),
                std=cfg.embed_dim ** -0.5,
            )
        if cfg.learned_pos:
            p["embed_positions"] = self.pos.init(jax.random.fold_in(key, 2))
        return {"params": p, "state": {}}

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        x = self.embed_scale * embedding(p["encoder_embed"], src_tokens)
        x = x + self.pos.from_ids(p.get("embed_positions", {}), src_tokens, x.dtype)
        x = dropout(x, cfg.dropout, rng, not training)
        padding_mask = src_tokens == cfg.padding_idx
        for lp, lc in zip(p["encoder_layers"], cfg.encoder_layers):
            x = lightconv_encoder_layer(
                lp, lc, x, encoder_padding_mask=padding_mask,
                rng=rng, deterministic=not training, use_pallas=self.use_pallas,
            )
        return (
            EncoderOut(
                encoder_out=x,
                encoder_padding_mask=padding_mask,
                src_lengths=src_lengths,
            ),
            {},
        )

    def _decode(self, p, prev_tokens, encoder_out, rng, deterministic, step=None,
                cache=None):
        cfg = self.cfg
        x = self.embed_scale * embedding(p["decoder_embed"], prev_tokens)
        x = x + self.pos.from_ids(
            p.get("embed_positions", {}), prev_tokens, x.dtype, step=step
        )
        x = dropout(x, cfg.dropout, rng, deterministic)
        new_cache = [] if cache is not None else None
        for i, (lp, lc) in enumerate(zip(p["decoder_layers"], cfg.decoder_layers)):
            x, nc = lightconv_decoder_layer(
                lp, lc, x,
                encoder_out=encoder_out.encoder_out if encoder_out else None,
                encoder_padding_mask=(
                    encoder_out.encoder_padding_mask if encoder_out else None
                ),
                rng=rng, deterministic=deterministic,
                cache=cache[i] if cache is not None else None,
                use_pallas=self.use_pallas,
            )
            if new_cache is not None:
                new_cache.append(nc)
        w = (
            p["decoder_embed"]["w"]
            if cfg.share_input_output_embed
            else p["embed_out"]
        )
        return x @ w.T.astype(x.dtype), new_cache

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits, _ = self._decode(
            variables["params"], batch["prev_output_tokens"], enc,
            rng or RngStream(None), not training,
        )
        return (logits, {"attn": None, "encoder_out": enc}), {}

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        caches = []
        for lp, lc in zip(
            variables["params"]["decoder_layers"], self.cfg.decoder_layers
        ):
            caches.append(
                {
                    "window": jnp.zeros((batch, lc.kernel_size, lc.conv_dim), dtype),
                    "cross": precompute_cross_cache(
                        lp["encoder_attn"],
                        MHAConfig(lc.embed_dim, lc.heads),
                        encoder_out.encoder_out,
                    ),
                }
            )
        return caches

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        logits, new_cache = self._decode(
            variables["params"], tokens, encoder_out,
            RngStream(None), True, step=step, cache=cache,
        )
        return logits[:, 0, :], new_cache, None


@register_model_architecture("lightconv", "lightconv")
def base_architecture(args):
    """Reference lightconv.py:692-734 defaults."""
    args.encoder_embed_path = getattr(args, "encoder_embed_path", None)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 2048)
    args.encoder_layers = getattr(args, "encoder_layers", 7)
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
    args.encoder_conv_dim = getattr(args, "encoder_conv_dim", args.encoder_embed_dim)
    args.decoder_conv_dim = getattr(args, "decoder_conv_dim", args.decoder_embed_dim)
    args.encoder_kernel_size_list = getattr(
        args, "encoder_kernel_size_list", [3, 7, 15, 31, 31, 31, 31]
    )
    args.decoder_kernel_size_list = getattr(
        args, "decoder_kernel_size_list", [3, 7, 15, 31, 31, 31]
    )
    if getattr(args, "encoder_glu", None) is None:
        args.encoder_glu = True
    if getattr(args, "decoder_glu", None) is None:
        args.decoder_glu = True
    args.input_dropout = getattr(args, "input_dropout", 0.1)
    wd = getattr(args, "weight_dropout", None)
    args.weight_dropout = wd if wd is not None else args.attention_dropout
    args.weight_softmax = getattr(args, "weight_softmax", True)
    args.encoder_conv_type = getattr(args, "encoder_conv_type", "lightweight")
    args.decoder_conv_type = getattr(args, "decoder_conv_type", "lightweight")
    args.adaptive_softmax_cutoff = getattr(args, "adaptive_softmax_cutoff", None)
    args.adaptive_softmax_dropout = getattr(args, "adaptive_softmax_dropout", 0)


@register_model_architecture("lightconv", "lightconv_iwslt_de_en")
def lightconv_iwslt_de_en(args):
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 1024)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 4)
    args.encoder_layers = getattr(args, "encoder_layers", 7)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 1024)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 4)
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.weight_dropout = getattr(args, "weight_dropout", 0.1)
    args.encoder_glu = getattr(args, "encoder_glu", False)
    args.decoder_glu = getattr(args, "decoder_glu", False)
    args.input_dropout = getattr(args, "input_dropout", 0.0)
    base_architecture(args)


@register_model_architecture("lightconv", "lightconv_wmt_en_de")
def lightconv_wmt_en_de(args):
    base_architecture(args)


@register_model_architecture("lightconv", "lightconv_wmt_en_de_big")
def lightconv_wmt_en_de_big(args):
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1024)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 4096)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1024)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 4096)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    args.dropout = getattr(args, "dropout", 0.3)
    base_architecture(args)


@register_model_architecture("lightconv", "lightconv_wmt_en_fr_big")
def lightconv_wmt_en_fr_big(args):
    """Reference lightconv.py:774-777 (en_de_big with dropout .1)."""
    args.dropout = getattr(args, "dropout", 0.1)
    lightconv_wmt_en_de_big(args)


@register_model_architecture("lightconv", "lightconv_wmt_zh_en_big")
def lightconv_wmt_zh_en_big(args):
    """Reference lightconv.py:780-785 (en_de_big with all dropouts .2)."""
    args.dropout = getattr(args, "dropout", 0.2)
    args.attention_dropout = getattr(args, "attention_dropout", 0.2)
    args.weight_dropout = getattr(args, "weight_dropout", 0.2)
    lightconv_wmt_en_de_big(args)


@register_model_architecture("lightconv", "dynamicconv")
def dynamicconv(args):
    args.encoder_conv_type = getattr(args, "encoder_conv_type", "dynamic")
    args.decoder_conv_type = getattr(args, "decoder_conv_type", "dynamic")
    base_architecture(args)


@register_model_architecture("lightconv", "dynamicconv_iwslt_de_en")
def dynamicconv_iwslt_de_en(args):
    args.encoder_conv_type = getattr(args, "encoder_conv_type", "dynamic")
    args.decoder_conv_type = getattr(args, "decoder_conv_type", "dynamic")
    lightconv_iwslt_de_en(args)


@register_model_architecture("lightconv", "dynamicconv_wmt_en_de_big")
def dynamicconv_wmt_en_de_big(args):
    args.encoder_conv_type = getattr(args, "encoder_conv_type", "dynamic")
    args.decoder_conv_type = getattr(args, "decoder_conv_type", "dynamic")
    lightconv_wmt_en_de_big(args)
