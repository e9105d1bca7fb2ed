"""VGG-Transformer ASR models (upstream baseline family).

Counterparts of examples/speech_recognition/models/vggtransformer.py:
  * ``asr_vggtransformer``: VGGBlock conv stack (conv x N + ReLU + optional
    LayerNorm + ceil-mode max-pool per block) -> per-layer-configured
    transformer encoder layers with optional inter-layer Linear projections,
    left/right context attention masks and frame subsampling
    (--transformer-context / --transformer-sampling), final Linear+LayerNorm
    to encoder_output_dim; decoder = embedding -> causal LinearizedConv1d
    stack -> transformer decoder layers -> fc_out (:552-713);
  * ``asr_vggtransformer_encoder``: encoder-only variant with a vocab
    fc_out for CTC training (:714-880).

Per-layer transformer configs are '(dim, heads, ffn, normalize_before,
dropout, attention_dropout, relu_dropout)' tuples, parsed from the same EXPR
strings the reference uses.
"""

from __future__ import annotations

import ast
import math
import re
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


from ..ops.core import (
    NEG_INF,
    RngStream,
    dropout,
    embedding,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    lengths_to_padding_mask,
    linear,
    normal_init,
)
from ..ops.transformer_layer import (
    TransformerLayerConfig,
    decoder_layer,
    encoder_layer,
    init_decoder_layer,
    init_decoder_layer_cache,
    init_encoder_layer,
)
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model

DEFAULT_ENC_VGGBLOCK_CONFIG = ((32, 3, 2, 2, False),) * 2
DEFAULT_ENC_TRANSFORMER_CONFIG = ((256, 4, 1024, True, 0.2, 0.2, 0.2),) * 2
DEFAULT_DEC_TRANSFORMER_CONFIG = ((256, 2, 1024, True, 0.2, 0.2, 0.2),) * 2
DEFAULT_DEC_CONV_CONFIG = ((256, 3, True),) * 2


def _parse_config(expr, default):
    if expr is None:
        return default
    if not isinstance(expr, str):
        return tuple(expr)
    try:
        return tuple(ast.literal_eval(expr))
    except ValueError:
        m = re.match(r"^\s*(\[.*\]|\(.*\))\s*\*\s*(\d+)\s*$", expr)
        if not m:
            raise
        return tuple(ast.literal_eval(m.group(1)) * int(m.group(2)))


def _layer_cfg(cfg_tuple) -> TransformerLayerConfig:
    d, heads, ffn, norm_before, drop, attn_drop, relu_drop = cfg_tuple
    return TransformerLayerConfig(
        embed_dim=d, ffn_dim=ffn, num_heads=heads,
        dropout=drop, attention_dropout=attn_drop, activation_dropout=relu_drop,
        normalize_before=norm_before,
    )


# ---------------------------------------------------------------------------
# VGG block
# ---------------------------------------------------------------------------

def _ceil_pool_len(t: int, k: int) -> int:
    return -(-t // k)


class VGGBlockSpec(NamedTuple):
    out_channels: int
    conv_kernel_size: int
    pooling_kernel_size: int
    num_conv_layers: int
    layer_norm: bool


def init_vgg_block(key, spec: VGGBlockSpec, in_channels: int, input_dim: int):
    ks = jax.random.split(key, spec.num_conv_layers)
    convs = []
    c_in = in_channels
    for i in range(spec.num_conv_layers):
        k = spec.conv_kernel_size
        std = math.sqrt(2.0 / (k * k * c_in))
        convs.append(
            {
                "w": normal_init(ks[i], (k, k, c_in, spec.out_channels), std=std),
                "b": jnp.zeros((spec.out_channels,), jnp.float32),
            }
        )
        c_in = spec.out_channels
    p: Dict[str, Any] = {"convs": convs}
    if spec.layer_norm:
        p["lns"] = [init_layer_norm(input_dim) for _ in range(spec.num_conv_layers)]
    return p


def vgg_block(params, spec: VGGBlockSpec, x):
    """x: (B, T, F, C) -> pooled (B, ceil(T/k), ceil(F/k), C_out)."""
    k = spec.conv_kernel_size
    pad = k // 2
    for i, conv in enumerate(params["convs"]):
        x = jax.lax.conv_general_dilated(
            x, conv["w"].astype(x.dtype), (1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + conv["b"].astype(x.dtype)
        if "lns" in params:
            # reference LayerNorm normalizes the feature axis (last dim of
            # its NCHW layout); ours is NHWC so swap F to last
            x = layer_norm(params["lns"][i], x.swapaxes(2, 3)).swapaxes(2, 3)
        x = jax.nn.relu(x)
    pk = spec.pooling_kernel_size
    if pk > 1:
        # ceil-mode max pool: pad with -inf to a multiple of pk
        b, t, f, c = x.shape
        t2, f2 = _ceil_pool_len(t, pk) * pk, _ceil_pool_len(f, pk) * pk
        x = jnp.pad(
            x, ((0, 0), (0, t2 - t), (0, f2 - f), (0, 0)),
            constant_values=NEG_INF,
        )
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, pk, pk, 1),
            window_strides=(1, pk, pk, 1),
            padding="VALID",
        )
    return x


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class VGGTransformerEncoderConfig(NamedTuple):
    input_feat_per_channel: int = 40
    vggblock_config: Tuple = DEFAULT_ENC_VGGBLOCK_CONFIG
    transformer_config: Tuple = DEFAULT_ENC_TRANSFORMER_CONFIG
    encoder_output_dim: int = 512
    in_channels: int = 1
    transformer_context: Optional[Tuple[int, int]] = None
    transformer_sampling: Optional[Tuple[int, ...]] = None


class VGGTransformerEncoder:
    def __init__(self, cfg: VGGTransformerEncoderConfig):
        self.cfg = cfg
        self.blocks = [VGGBlockSpec(*b) for b in cfg.vggblock_config or ()]
        # static conv output dims
        f = cfg.input_feat_per_channel
        c = cfg.in_channels
        self.subsample = 1
        for b in self.blocks:
            f = _ceil_pool_len(f, b.pooling_kernel_size)
            c = b.out_channels
            self.subsample *= b.pooling_kernel_size
        self.conv_out_dim = f * c
        self.sampling = cfg.transformer_sampling or tuple(
            1 for _ in cfg.transformer_config
        )
        assert len(self.sampling) == len(cfg.transformer_config)

    def init(self, key):
        p: Dict[str, Any] = {"vgg": [], "proj": {}, "layers": []}
        c_in = self.cfg.in_channels
        f = self.cfg.input_feat_per_channel
        for i, b in enumerate(self.blocks):
            p["vgg"].append(
                init_vgg_block(jax.random.fold_in(key, i), b, c_in, f)
            )
            c_in = b.out_channels
            f = _ceil_pool_len(f, b.pooling_kernel_size)
        prev_dim = self.conv_out_dim
        for i, tc in enumerate(self.cfg.transformer_config):
            if prev_dim != tc[0]:
                p["proj"][str(i)] = init_linear(
                    jax.random.fold_in(key, 100 + i), prev_dim, tc[0]
                )
            p["layers"].append(
                init_encoder_layer(jax.random.fold_in(key, 200 + i), _layer_cfg(tc))
            )
            prev_dim = tc[0]
        p["fc_out"] = init_linear(
            jax.random.fold_in(key, 999), prev_dim, self.cfg.encoder_output_dim
        )
        p["ln_out"] = init_layer_norm(self.cfg.encoder_output_dim)
        return p

    def _context_mask(self, t: int, subsampling_factor: int):
        """(left, right) context mask, scaled to post-conv frames (reference
        lengths_to_attn_mask: contexts are input-frame-level, divided by the
        conv subsampling and ceil'd; the right edge clamps the mask start to
        the last column)."""
        ctx = self.cfg.transformer_context
        if ctx is None:
            return None
        left, right = ctx
        q = jnp.arange(t)[:, None]
        k = jnp.arange(t)[None, :]
        mask = jnp.zeros((t, t), jnp.float32)
        if left is not None and left >= 0:
            lc = math.ceil(left / subsampling_factor)
            mask = jnp.where(k < q - lc, NEG_INF, mask)
        if right is not None and right >= 0:
            rc = math.ceil(right / subsampling_factor)
            start = jnp.minimum(q + rc + 1, t - 1)
            mask = jnp.where(k >= start, NEG_INF, mask)
        return mask

    def __call__(self, params, x, src_lengths, rng=None, deterministic=True):
        """x: (B, T, F) -> EncoderOut (batch-first)."""
        rng = rng or RngStream(None)
        b, t_in, f_in = x.shape
        h = x.reshape(b, t_in, self.cfg.in_channels, self.cfg.input_feat_per_channel)
        # (B, T, C, F) -> (B, T, F, C) for NHWC convs
        h = h.transpose(0, 1, 3, 2)
        for bp, spec in zip(params["vgg"], self.blocks):
            h = vgg_block(bp, spec, h)
        b, t, f, c = h.shape
        # (B, T, F, C) -> (B, T, C*F) channels-major (reference view order)
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)

        subsampling_factor = int(t_in * 1.0 / t + 0.5)
        lengths = jnp.ceil(
            src_lengths.astype(jnp.float32) / subsampling_factor
        ).astype(jnp.int32)
        padding_mask = lengths_to_padding_mask(lengths, t)
        attn_mask = self._context_mask(t, subsampling_factor)

        for i, tc in enumerate(self.cfg.transformer_config):
            if str(i) in params["proj"]:
                h = linear(params["proj"][str(i)], h)
            h = encoder_layer(
                params["layers"][i], _layer_cfg(tc), h,
                key_padding_mask=padding_mask,
                attn_mask=attn_mask,
                rng=rng, deterministic=deterministic,
            )
            if self.sampling[i] != 1:
                k = self.sampling[i]
                h = h[:, ::k]
                lengths = jnp.ceil(lengths.astype(jnp.float32) / k).astype(jnp.int32)
                padding_mask = lengths_to_padding_mask(lengths, h.shape[1])
                if attn_mask is not None:
                    attn_mask = attn_mask[::k, ::k]
        h = linear(params["fc_out"], h)
        h = layer_norm(params["ln_out"], h)
        return EncoderOut(
            encoder_out=h,
            encoder_padding_mask=padding_mask,
            src_lengths=lengths,
        )


# ---------------------------------------------------------------------------
# Conv + transformer decoder
# ---------------------------------------------------------------------------

class VGGTransformerDecoder:
    def __init__(self, vocab_size: int, padding_idx: int, embed_dim: int,
                 transformer_config: Tuple, conv_config: Tuple, max_positions: int):
        self.vocab_size = vocab_size
        self.padding_idx = padding_idx
        self.embed_dim = embed_dim
        self.transformer_config = transformer_config
        self.conv_config = conv_config
        self.max_positions = max_positions

    def init(self, key):
        p: Dict[str, Any] = {
            "embed_tokens": init_embedding(
                jax.random.fold_in(key, 0), self.vocab_size, self.embed_dim,
                self.padding_idx,
            ),
            "convs": [],
            "conv_lns": {},
            "proj": {},
            "layers": [],
        }
        c_in = self.embed_dim
        for i, (c_out, k, ln) in enumerate(self.conv_config):
            std = math.sqrt(4.0 / (k * c_in))
            p["convs"].append(
                {
                    "w": normal_init(
                        jax.random.fold_in(key, 10 + i), (k, c_in, c_out), std=std
                    ),
                    "b": jnp.zeros((c_out,), jnp.float32),
                }
            )
            if ln:
                p["conv_lns"][str(i)] = init_layer_norm(c_out)
            c_in = c_out
        prev = c_in
        for i, tc in enumerate(self.transformer_config):
            if prev != tc[0]:
                p["proj"][str(i)] = init_linear(
                    jax.random.fold_in(key, 100 + i), prev, tc[0]
                )
            p["layers"].append(
                init_decoder_layer(jax.random.fold_in(key, 200 + i), _layer_cfg(tc))
            )
            prev = tc[0]
        p["fc_out"] = init_linear(
            jax.random.fold_in(key, 999), prev, self.vocab_size
        )
        return p

    def _convs(self, params, x, rng, deterministic):
        """Causal conv1d stack; x: (B, T, C)."""
        for i, (c_out, k, ln) in enumerate(self.conv_config):
            conv = params["convs"][i]
            x = jax.lax.conv_general_dilated(
                x, conv["w"].astype(x.dtype), (1,),
                padding=((k - 1, 0),),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + conv["b"].astype(x.dtype)
            if str(i) in params["conv_lns"]:
                x = layer_norm(params["conv_lns"][str(i)], x)
            x = jax.nn.relu(x)
        return x

    def __call__(self, params, prev_output_tokens, encoder_out=None,
                 encoder_padding_mask=None, rng=None, deterministic=True,
                 features_only=False, need_attn=False):
        rng = rng or RngStream(None)
        dtype = encoder_out.dtype if encoder_out is not None else jnp.float32
        x = embedding(params["embed_tokens"], prev_output_tokens, dtype)
        x = self._convs(params, x, rng, deterministic)
        mask = "causal"
        self_kpm = prev_output_tokens == self.padding_idx
        for i, tc in enumerate(self.transformer_config):
            if str(i) in params["proj"]:
                x = linear(params["proj"][str(i)], x)
            x, _, _ = decoder_layer(
                params["layers"][i], _layer_cfg(tc), x,
                encoder_out=encoder_out,
                encoder_padding_mask=encoder_padding_mask,
                self_attn_mask=mask,
                self_attn_padding_mask=self_kpm,
                rng=rng, deterministic=deterministic,
            )
        if features_only:
            return x, {"attn": None}
        return linear(params["fc_out"], x), {"attn": None}

    # incremental decoding: per-conv rolling input buffers + per-layer KV
    def init_cache(self, params, batch, max_len, encoder_out=None, dtype=jnp.float32):
        cache: Dict[str, Any] = {"convs": [], "layers": []}
        c_in = self.embed_dim
        for c_out, k, ln in self.conv_config:
            cache["convs"].append(jnp.zeros((batch, k - 1, c_in), dtype))
            c_in = c_out
        for i, tc in enumerate(self.transformer_config):
            cache["layers"].append(
                init_decoder_layer_cache(
                    params["layers"][i], _layer_cfg(tc), batch, max_len,
                    encoder_out, dtype,
                )
            )
        return cache

    def step(self, params, tokens, cache, step_index, encoder_padding_mask=None,
             need_attn=False):
        dtype = cache["layers"][0]["self"]["k"].dtype
        rng = RngStream(None)
        x = embedding(params["embed_tokens"], tokens, dtype)  # (B, 1, C)
        new_conv_bufs = []
        for i, (c_out, k, ln) in enumerate(self.conv_config):
            buf = cache["convs"][i]  # (B, k-1, C_in)
            window = jnp.concatenate([buf, x], axis=1)  # (B, k, C_in)
            conv = params["convs"][i]
            y = jnp.einsum(
                "bkc,kcd->bd", window, conv["w"].astype(dtype)
            ) + conv["b"].astype(dtype)
            new_conv_bufs.append(window[:, 1:])
            x = y[:, None, :]
            if str(i) in params["conv_lns"]:
                x = layer_norm(params["conv_lns"][str(i)], x)
            x = jax.nn.relu(x)
        new_layer_caches = []
        for i, tc in enumerate(self.transformer_config):
            if str(i) in params["proj"]:
                x = linear(params["proj"][str(i)], x)
            x, _, nc = decoder_layer(
                params["layers"][i], _layer_cfg(tc), x,
                encoder_padding_mask=encoder_padding_mask,
                rng=rng, deterministic=True,
                cache=cache["layers"][i], cache_index=step_index,
            )
            new_layer_caches.append(nc)
        logits = linear(params["fc_out"], x)[:, 0, :]
        return logits, {"convs": new_conv_bufs, "layers": new_layer_caches}, None


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------

@register_model("asr_vggtransformer")
class VGGTransformerModel(Model):
    def __init__(self, enc_cfg: VGGTransformerEncoderConfig, decoder: VGGTransformerDecoder):
        self.enc_cfg = enc_cfg
        self.encoder = VGGTransformerEncoder(enc_cfg)
        self.decoder = decoder
        self.max_source_positions = 6000
        self.max_target_positions = decoder.max_positions

    @staticmethod
    def add_args(parser):
        parser.add_argument("--input-feat-per-channel", type=int, metavar="N",
                            help="encoder input dimension per input channel")
        parser.add_argument("--vggblock-enc-config", type=str, metavar="EXPR",
                            help="VGG block configs [(out_c, k, pool_k, n_convs, ln), ...]")
        parser.add_argument("--transformer-enc-config", type=str, metavar="EXPR",
                            help="per-layer (d, h, ffn, norm_before, drop, adrop, rdrop)")
        parser.add_argument("--enc-output-dim", type=int, metavar="N",
                            help="encoder output dimension")
        parser.add_argument("--in-channels", type=int, metavar="N",
                            help="number of encoder input channels")
        parser.add_argument("--tgt-embed-dim", type=int, metavar="N",
                            help="embedding dimension of the decoder target tokens")
        parser.add_argument("--transformer-dec-config", type=str, metavar="EXPR")
        parser.add_argument("--conv-dec-config", type=str, metavar="EXPR",
                            help="decoder conv configs [(out_c, k, ln), ...]")
        parser.add_argument("--transformer-context", type=str, metavar="EXPR",
                            help="(left, right) attention context, -1 = unlimited")
        parser.add_argument("--transformer-sampling", type=str, metavar="EXPR",
                            help="per-layer frame subsampling factors")

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        enc_cfg = VGGTransformerEncoderConfig(
            input_feat_per_channel=args.input_feat_per_channel,
            vggblock_config=_parse_config(
                args.vggblock_enc_config, DEFAULT_ENC_VGGBLOCK_CONFIG
            ),
            transformer_config=_parse_config(
                args.transformer_enc_config, DEFAULT_ENC_TRANSFORMER_CONFIG
            ),
            encoder_output_dim=args.enc_output_dim,
            in_channels=args.in_channels,
            transformer_context=_parse_config(
                getattr(args, "transformer_context", None), None
            ),
            transformer_sampling=_parse_config(
                getattr(args, "transformer_sampling", None), None
            ),
        )
        tgt_dict = task.target_dictionary
        decoder = VGGTransformerDecoder(
            vocab_size=len(tgt_dict),
            padding_idx=tgt_dict.pad(),
            embed_dim=args.tgt_embed_dim,
            transformer_config=_parse_config(
                args.transformer_dec_config, DEFAULT_DEC_TRANSFORMER_CONFIG
            ),
            conv_config=_parse_config(args.conv_dec_config, DEFAULT_DEC_CONV_CONFIG),
            max_positions=1024,
        )
        return cls(enc_cfg, decoder)

    def init(self, key):
        ek, dk = jax.random.split(key)
        return {
            "params": {"encoder": self.encoder.init(ek), "decoder": self.decoder.init(dk)},
            "state": {},
        }

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        enc = self.encoder(
            variables["params"]["encoder"], src_tokens, src_lengths,
            rng=rng, deterministic=not training,
        )
        return enc, {}

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits, extra = self.decoder(
            variables["params"]["decoder"],
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        extra["encoder_out"] = enc
        return (logits, extra), {}

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len,
            encoder_out.encoder_out, dtype,
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        return self.decoder.step(
            variables["params"]["decoder"], tokens, cache, step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
        )


@register_model("asr_vggtransformer_encoder")
class VGGTransformerEncoderModel(Model):
    """Encoder-only CTC model (reference :714-880)."""

    def __init__(self, enc_cfg: VGGTransformerEncoderConfig, vocab_size: int):
        self.enc_cfg = enc_cfg
        self.encoder = VGGTransformerEncoder(enc_cfg)
        self.vocab_size = vocab_size
        self.max_source_positions = 6000
        self.max_target_positions = 1024

    @staticmethod
    def add_args(parser):
        parser.add_argument("--input-feat-per-channel", type=int, metavar="N")
        parser.add_argument("--vggblock-enc-config", type=str, metavar="EXPR")
        parser.add_argument("--transformer-enc-config", type=str, metavar="EXPR")
        parser.add_argument("--enc-output-dim", type=int, metavar="N",
                            help="encoder output dimension, projecting the LSTM output")
        parser.add_argument("--in-channels", type=int, metavar="N")
        parser.add_argument("--transformer-context", type=str, metavar="EXPR")
        parser.add_argument("--transformer-sampling", type=str, metavar="EXPR")

    @classmethod
    def build_model(cls, args, task):
        vggtransformer_enc_1(args)
        enc_cfg = VGGTransformerEncoderConfig(
            input_feat_per_channel=args.input_feat_per_channel,
            vggblock_config=_parse_config(
                args.vggblock_enc_config, DEFAULT_ENC_VGGBLOCK_CONFIG
            ),
            transformer_config=_parse_config(
                args.transformer_enc_config, DEFAULT_ENC_TRANSFORMER_CONFIG
            ),
            encoder_output_dim=args.enc_output_dim,
            in_channels=args.in_channels,
            transformer_context=_parse_config(
                getattr(args, "transformer_context", None), None
            ),
            transformer_sampling=_parse_config(
                getattr(args, "transformer_sampling", None), None
            ),
        )
        return cls(enc_cfg, len(task.target_dictionary))

    def init(self, key):
        ek, fk = jax.random.split(key)
        return {
            "params": {
                "encoder": self.encoder.init(ek),
                # separate vocab projection on top of the encoder output
                # (reference VGGTransformerEncoderOnly.fc_out, :826)
                "fc_out": init_linear(
                    fk, self.enc_cfg.encoder_output_dim, self.vocab_size
                ),
            },
            "state": {},
        }

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        enc = self.encoder(
            variables["params"]["encoder"], src_tokens, src_lengths,
            rng=rng, deterministic=not training,
        )
        logits = linear(variables["params"]["fc_out"], enc.encoder_out)
        # the projected vocab logits ARE the CTC stream / encoder output
        return (
            enc._replace(
                encoder_out=logits,
                ctc_out=logits,
                ctc_padding_mask=enc.encoder_padding_mask,
                ctc_lengths=enc.src_lengths,
            ),
            {},
        )

    def forward(self, variables, batch, rng=None, training=False):
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        return (enc.encoder_out, {"encoder_out": enc}), {}


@register_model_architecture("asr_vggtransformer", "asr_vggtransformer")
def base_architecture(args):
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 40)
    args.vggblock_enc_config = getattr(
        args, "vggblock_enc_config", DEFAULT_ENC_VGGBLOCK_CONFIG
    )
    args.transformer_enc_config = getattr(
        args, "transformer_enc_config", DEFAULT_ENC_TRANSFORMER_CONFIG
    )
    args.enc_output_dim = getattr(args, "enc_output_dim", 512)
    args.in_channels = getattr(args, "in_channels", 1)
    args.tgt_embed_dim = getattr(args, "tgt_embed_dim", 128)
    args.transformer_dec_config = getattr(
        args, "transformer_dec_config", DEFAULT_ENC_TRANSFORMER_CONFIG
    )
    args.conv_dec_config = getattr(args, "conv_dec_config", DEFAULT_DEC_CONV_CONFIG)
    args.transformer_context = getattr(args, "transformer_context", None)
    args.transformer_sampling = getattr(args, "transformer_sampling", None)


@register_model_architecture("asr_vggtransformer", "vggtransformer_1")
def vggtransformer_1(args):
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 80)
    args.vggblock_enc_config = getattr(
        args, "vggblock_enc_config", "[(64, 3, 2, 2, True), (128, 3, 2, 2, True)]"
    )
    args.transformer_enc_config = getattr(
        args, "transformer_enc_config",
        "((1024, 16, 4096, True, 0.15, 0.15, 0.15),) * 14",
    )
    args.enc_output_dim = getattr(args, "enc_output_dim", 1024)
    args.tgt_embed_dim = getattr(args, "tgt_embed_dim", 128)
    args.conv_dec_config = getattr(args, "conv_dec_config", "((256, 3, True),) * 4")
    args.transformer_dec_config = getattr(
        args, "transformer_dec_config",
        "((1024, 16, 4096, True, 0.15, 0.15, 0.15),) * 4",
    )
    base_architecture(args)


@register_model_architecture("asr_vggtransformer", "vggtransformer_2")
def vggtransformer_2(args):
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 80)
    args.vggblock_enc_config = getattr(
        args, "vggblock_enc_config", "[(64, 3, 2, 2, True), (128, 3, 2, 2, True)]"
    )
    args.transformer_enc_config = getattr(
        args, "transformer_enc_config",
        "((1024, 16, 4096, True, 0.15, 0.15, 0.15),) * 16",
    )
    args.enc_output_dim = getattr(args, "enc_output_dim", 1024)
    args.tgt_embed_dim = getattr(args, "tgt_embed_dim", 512)
    args.conv_dec_config = getattr(args, "conv_dec_config", "((256, 3, True),) * 4")
    args.transformer_dec_config = getattr(
        args, "transformer_dec_config",
        "((1024, 16, 4096, True, 0.15, 0.15, 0.15),) * 6",
    )
    base_architecture(args)


@register_model_architecture("asr_vggtransformer", "vggtransformer_base")
def vggtransformer_base(args):
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 80)
    args.vggblock_enc_config = getattr(
        args, "vggblock_enc_config", "[(64, 3, 2, 2, True), (128, 3, 2, 2, True)]"
    )
    args.transformer_enc_config = getattr(
        args, "transformer_enc_config",
        "((512, 8, 2048, True, 0.15, 0.15, 0.15),) * 12",
    )
    args.enc_output_dim = getattr(args, "enc_output_dim", 512)
    args.tgt_embed_dim = getattr(args, "tgt_embed_dim", 512)
    args.conv_dec_config = getattr(args, "conv_dec_config", "((256, 3, True),) * 4")
    args.transformer_dec_config = getattr(
        args, "transformer_dec_config",
        "((512, 8, 2048, True, 0.15, 0.15, 0.15),) * 6",
    )
    base_architecture(args)


@register_model_architecture("asr_vggtransformer_encoder", "vggtransformer_enc_1")
def vggtransformer_enc_1(args):
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 80)
    args.vggblock_enc_config = getattr(
        args, "vggblock_enc_config", "[(64, 3, 2, 2, True), (128, 3, 2, 2, True)]"
    )
    args.transformer_enc_config = getattr(
        args, "transformer_enc_config",
        "((1024, 16, 4096, True, 0.15, 0.15, 0.15),) * 16",
    )
    args.enc_output_dim = getattr(args, "enc_output_dim", 1024)
    args.in_channels = getattr(args, "in_channels", 1)
    args.transformer_context = getattr(args, "transformer_context", None)
    args.transformer_sampling = getattr(args, "transformer_sampling", None)
