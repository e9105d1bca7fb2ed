"""conv_transformer_context — context-aware ST (INTERSPEECH 2020).

Counterpart of examples/speech_recognition/models/conv_transformer_context.py
+ models/context_model.py: a context encoder (the previous utterance's
audio through a frozen pretrained audio encoder, or the previous target
text embedded) feeds gated context cross-attention in the encoder and/or
decoder (--context-position), with sequential or parallel decoder gating
(--context-decoder-attention-type); parallel mode exposes ctx_gates for the
ctxreg criterion. Supports loading + freezing a pretrained context-unaware
model (--pretrained-model / --freeze-pretrained).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


from ..ops.context_layer import (
    context_decoder_layer,
    context_encoder_layer,
    init_context_decoder_layer,
    init_context_decoder_layer_cache,
    init_context_encoder_layer,
)
from ..ops.conv_frontend import conv_frontend
from ..ops.core import (
    RngStream,
    dropout,
    embedding,
    get_activation,
    init_layer_norm,
    layer_norm,
    lengths_to_padding_mask,
    linear,
)
from ..ops.positional import PositionalEmbedding
from ..ops.transformer_layer import encoder_layer, init_encoder_layer
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .conv_transformer import (
    ConvTransformerEncoder,
    ConvTransformerEncoderConfig,
    ConvolutionalTransformerModel,
    _base_defaults,
    configs_from_args,
)
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig

logger = logging.getLogger(__name__)


class ContextConfig(NamedTuple):
    context_type: str = "tgt"  # 'tgt' | 'src'
    context_encoder_layers: int = 1
    context_position: str = "both"  # 'both' | 'encoder' | 'decoder'
    attention_type: str = "sequential"  # decoder gating mode

    @property
    def encoder_has_context(self) -> bool:
        return self.context_position in ("both", "encoder")

    @property
    def decoder_has_context(self) -> bool:
        return self.context_position in ("both", "decoder")


class PreviousTargetContextEncoder:
    """Embeds the previous target text (reference :140-196)."""

    def __init__(self, decoder_cfg: TransformerDecoderConfig, ctx_cfg: ContextConfig,
                 enc_layer_cfg):
        self.decoder_cfg = decoder_cfg
        self.ctx_cfg = ctx_cfg
        self.layer_cfg = enc_layer_cfg
        self.embed_scale = decoder_cfg.embed_dim ** 0.5
        self.pos = PositionalEmbedding(
            decoder_cfg.max_positions, decoder_cfg.embed_dim,
            decoder_cfg.padding_idx, decoder_cfg.learned_pos,
        )

    def init(self, key):
        ks = jax.random.split(key, self.ctx_cfg.context_encoder_layers + 1)
        p = {
            "layers": [
                init_encoder_layer(ks[i], self.layer_cfg)
                for i in range(self.ctx_cfg.context_encoder_layers)
            ]
        }
        if self.decoder_cfg.learned_pos:
            p["embed_positions"] = self.pos.init(ks[-1])
        return p

    def __call__(self, params, embed_params, context_tokens, context_lengths,
                 rng=None, deterministic=True):
        """context_tokens: (B, Tc) target-language ids. Uses the shared
        decoder token embedding (reference passes decoder_embed_tokens)."""
        rng = rng or RngStream(None)
        x = self.embed_scale * embedding(embed_params, context_tokens)
        x = x + self.pos.from_ids(
            params.get("embed_positions", {}), context_tokens, x.dtype
        )
        x = dropout(x, self.layer_cfg.dropout, rng, deterministic)
        padding_mask = lengths_to_padding_mask(context_lengths, x.shape[1])
        for lp in params["layers"]:
            x = encoder_layer(
                lp, self.layer_cfg, x, key_padding_mask=padding_mask,
                rng=rng, deterministic=deterministic,
            )
        return x, padding_mask


class PreviousAudioContextEncoder:
    """Encodes the previous utterance's audio through the (pretrained,
    frozen) audio encoder + N transformer layers (reference :99-138)."""

    def __init__(self, encoder_cfg: ConvTransformerEncoderConfig, ctx_cfg: ContextConfig):
        self.ctx_cfg = ctx_cfg
        # context-unaware audio encoder
        self.audio_encoder = ConvTransformerEncoder(
            encoder_cfg._replace(ctc_out_enabled=False, ctc_compress_out=False)
        )
        self.layer_cfg = encoder_cfg.layer_cfg
        self.dropout_p = encoder_cfg.dropout

    def init(self, key):
        k1, k2 = jax.random.split(key)
        audio_params, audio_state = self.audio_encoder.init(k1)
        ks = jax.random.split(k2, self.ctx_cfg.context_encoder_layers)
        return {
            "audio_encoder": audio_params,
            "audio_encoder_state": audio_state,
            "layers": [
                init_encoder_layer(ks[i], self.layer_cfg)
                for i in range(self.ctx_cfg.context_encoder_layers)
            ],
        }

    def __call__(self, params, embed_params, context_tokens, context_lengths,
                 rng=None, deterministic=True):
        """context_tokens: (B, Tc, F) previous audio."""
        rng = rng or RngStream(None)
        enc, _ = self.audio_encoder(
            params["audio_encoder"],
            params["audio_encoder_state"],
            context_tokens,
            context_lengths,
            rng=rng,
            deterministic=True,  # frozen pretrained path, eval-mode BN
            training=False,
        )
        x = dropout(enc.encoder_out, self.dropout_p, rng, deterministic)
        padding_mask = enc.encoder_padding_mask
        for lp in params["layers"]:
            x = encoder_layer(
                lp, self.layer_cfg, x, key_padding_mask=padding_mask,
                rng=rng, deterministic=deterministic,
            )
        return x, padding_mask


class ContextAwareConvTransformerEncoder(ConvTransformerEncoder):
    """Conv frontend + context-aware encoder layers (reference :199-260)."""

    def __init__(self, cfg: ConvTransformerEncoderConfig, ctx_cfg: ContextConfig):
        super().__init__(cfg)
        self.ctx_cfg = ctx_cfg

    def init(self, key):
        p, state = super().init(key)
        ks = jax.random.split(jax.random.fold_in(key, 99), self.cfg.layers)
        p["layers"] = [
            init_context_encoder_layer(
                ks[i], self.cfg.layer_cfg, self.ctx_cfg.encoder_has_context
            )
            for i in range(self.cfg.layers)
        ]
        return p, state

    def __call__(self, params, state, src_tokens, src_lengths,
                 context=None, context_padding_mask=None,
                 rng=None, deterministic=True, training=False):
        cfg = self.cfg
        act = get_activation(cfg.activation)
        rng = rng or RngStream(None)

        x, lengths, frontend_state = conv_frontend(
            params["frontend"], state["frontend"], cfg.frontend,
            src_tokens, src_lengths, rng=rng,
            deterministic=deterministic, training=training,
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

        for lp in params["layers"]:
            x = context_encoder_layer(
                lp, cfg.layer_cfg, x,
                key_padding_mask=padding_mask,
                context=context,
                context_padding_mask=context_padding_mask,
                rng=rng, deterministic=deterministic,
            )
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        return (
            EncoderOut(
                encoder_out=x,
                encoder_padding_mask=padding_mask,
                src_lengths=lengths,
                context_out=context,
                context_padding_mask=context_padding_mask,
            ),
            {"frontend": frontend_state},
        )


class TransformerContextAwareDecoder(TransformerDecoder):
    """Decoder with gated context attention; returns ctx_gates in extra."""

    def __init__(self, cfg: TransformerDecoderConfig, ctx_cfg: ContextConfig):
        super().__init__(cfg)
        self.ctx_cfg = ctx_cfg

    def init(self, key):
        p = super().init(key)
        cfg = self.cfg
        ks = jax.random.split(jax.random.fold_in(key, 55), cfg.layers)
        p["layers"] = [
            init_context_decoder_layer(
                ks[i], cfg.layer_cfg, self.ctx_cfg.decoder_has_context
            )
            for i in range(cfg.layers)
        ]
        return p

    def __call__(self, params, prev_output_tokens, encoder_out=None,
                 encoder_padding_mask=None, context=None,
                 context_padding_mask=None, rng=None, deterministic=True,
                 features_only=False, need_attn=False):
        rng = rng or RngStream(None)
        dtype = encoder_out.dtype if encoder_out is not None else jnp.float32
        x = self._embed(params, prev_output_tokens, dtype, rng, deterministic)
        mask = "causal"
        ctx_gates = []
        for lp in params["layers"]:
            x, gate, _ = context_decoder_layer(
                lp, self.cfg.layer_cfg, x,
                encoder_out=encoder_out,
                encoder_padding_mask=encoder_padding_mask,
                context=context,
                context_padding_mask=context_padding_mask,
                attention_type=self.ctx_cfg.attention_type,
                self_attn_mask=mask,
                rng=rng, deterministic=deterministic,
            )
            if gate is not None:
                ctx_gates.append(gate)
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        extra = {"attn": None, "ctx_gates": ctx_gates}
        if features_only:
            return x, extra
        return self.output_layer(params, x), extra

    def init_cache(self, params, batch, max_len, encoder_out=None,
                   dtype=jnp.float32, context_out=None):
        return [
            init_context_decoder_layer_cache(
                lp, self.cfg.layer_cfg, batch, max_len, encoder_out,
                context_out, dtype,
            )
            for lp in params["layers"]
        ]

    def step(self, params, tokens, cache, step_index,
             encoder_padding_mask=None, context_padding_mask=None,
             need_attn=False):
        dtype = cache[0]["self"]["k"].dtype
        rng = RngStream(None)
        x = self._embed(params, tokens, dtype, rng, True, step=step_index)
        new_cache = []
        for lp, lc in zip(params["layers"], cache):
            x, _, nc = context_decoder_layer(
                lp, self.cfg.layer_cfg, x,
                encoder_padding_mask=encoder_padding_mask,
                context_padding_mask=context_padding_mask,
                attention_type=self.ctx_cfg.attention_type,
                rng=rng, deterministic=True,
                cache=lc, cache_index=step_index,
            )
            new_cache.append(nc)
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        return self.output_layer(params, x)[:, 0, :], new_cache, None


@register_model("conv_transformer_context")
class ConvolutionalTransformerContextAwareModel(Model):
    def __init__(self, encoder_cfg, decoder_cfg, ctx_cfg: ContextConfig,
                 freeze_pretrained: str = "encoder",
                 pretrained_model: Optional[str] = None):
        self.encoder_cfg = encoder_cfg
        self.decoder_cfg = decoder_cfg
        self.ctx_cfg = ctx_cfg
        self.freeze_pretrained = freeze_pretrained
        self.pretrained_model = pretrained_model
        self.encoder = ContextAwareConvTransformerEncoder(encoder_cfg, ctx_cfg)
        self.decoder = TransformerContextAwareDecoder(decoder_cfg, ctx_cfg)
        if ctx_cfg.context_type == "src":
            self.context_encoder = PreviousAudioContextEncoder(encoder_cfg, ctx_cfg)
        else:
            self.context_encoder = PreviousTargetContextEncoder(
                decoder_cfg, ctx_cfg, encoder_cfg.layer_cfg
            )
        self.max_source_positions = encoder_cfg.max_positions
        self.max_target_positions = decoder_cfg.max_positions
        self._pretrained_param_paths: set = set()

    @staticmethod
    def add_args(parser):
        # the context model redefines --freeze-pretrained with str choices
        ConvolutionalTransformerModel.add_args(parser, include_freeze_pretrained=False)
        parser.add_argument("--context-encoder-layers", type=int, metavar="N",
                            help="num context encoder layers", default=1)
        parser.add_argument("--context-position", type=str, default="both",
                            choices=["both", "encoder", "decoder"])
        parser.add_argument("--context-decoder-attention-type", type=str,
                            default="sequential", choices=["parallel", "sequential"])
        parser.add_argument("--pretrained-model", type=str, default=None,
                            help="path to a pretrained context-unaware model")
        parser.add_argument("--freeze-pretrained", type=str, default="encoder",
                            choices=["all", "encoder", "none"])

    @classmethod
    def build_model(cls, args, task):
        base_context_architecture(args)
        encoder_cfg, decoder_cfg = configs_from_args(args, task)
        ctx_cfg = ContextConfig(
            context_type=getattr(args, "context_type", "tgt"),
            context_encoder_layers=getattr(args, "context_encoder_layers", 1),
            context_position=getattr(args, "context_position", "both"),
            attention_type=getattr(args, "context_decoder_attention_type", "sequential"),
        )
        return cls(
            encoder_cfg, decoder_cfg, ctx_cfg,
            freeze_pretrained=getattr(args, "freeze_pretrained", "encoder"),
            pretrained_model=getattr(args, "pretrained_model", None),
        )

    def init(self, key):
        ek, dk, ck = jax.random.split(key, 3)
        enc_params, enc_state = self.encoder.init(ek)
        variables = {
            "params": {
                "encoder": enc_params,
                "decoder": self.decoder.init(dk),
                "context_encoder": self.context_encoder.init(ck),
            },
            "state": {"encoder": enc_state},
        }
        if self.pretrained_model is not None:
            variables = self._load_pretrained(variables)
        return variables

    def _load_pretrained(self, variables):
        """Merge a context-unaware checkpoint's params into the tree
        (reference :79-96 non-strict load; missing 'context' keys expected).
        Also feeds the audio context encoder's pretrained audio encoder."""
        from ..train.checkpoint import load_checkpoint_to_cpu

        state = load_checkpoint_to_cpu(self.pretrained_model)
        pre = state["model"]

        def merge(dst, src, prefix):
            if isinstance(dst, dict) and isinstance(src, dict):
                out = {}
                for k in dst:
                    if k in src:
                        out[k] = merge(dst[k], src[k], prefix + (k,))
                    else:
                        out[k] = dst[k]
                return out
            if isinstance(dst, list) and isinstance(src, list):
                return [
                    merge(d, s, prefix + (str(i),))
                    for i, (d, s) in enumerate(zip(dst, src))
                ] + list(dst[len(src):])
            if hasattr(dst, "shape") and hasattr(src, "shape") and tuple(
                dst.shape
            ) == tuple(src.shape):
                self._pretrained_param_paths.add("/".join(prefix))
                return jnp.asarray(src)
            return dst

        params = dict(variables["params"])
        params["encoder"] = merge(params["encoder"], pre["encoder"], ("encoder",))
        params["decoder"] = merge(params["decoder"], pre["decoder"], ("decoder",))
        if self.ctx_cfg.context_type == "src":
            params["context_encoder"] = dict(params["context_encoder"])
            params["context_encoder"]["audio_encoder"] = merge(
                params["context_encoder"]["audio_encoder"], pre["encoder"],
                ("context_encoder", "audio_encoder"),
            )
            if state.get("model_state"):
                params["context_encoder"]["audio_encoder_state"] = (
                    jax.tree_util.tree_map(
                        jnp.asarray, state["model_state"]["encoder"]
                    )
                )
        variables["params"] = params
        return variables

    def frozen_param_filter(self, path: str) -> bool:
        """Trainer hook: True -> zero this param's gradient
        (reference freeze semantics :88-96)."""
        if self.freeze_pretrained == "none":
            return False
        if self.ctx_cfg.context_type == "src" and path.startswith(
            "context_encoder/audio_encoder"
        ):
            return True
        if path not in self._pretrained_param_paths:
            return False
        if self.freeze_pretrained == "all":
            return True
        return "decoder" not in path  # 'encoder' mode: freeze encoder only

    # -- functional API -------------------------------------------------------

    def encode_context(self, variables, context_tokens, context_lengths,
                       rng=None, training=False):
        return self.context_encoder(
            variables["params"]["context_encoder"],
            variables["params"]["decoder"]["embed_tokens"],
            context_tokens,
            context_lengths,
            rng=rng,
            deterministic=not training,
        )

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False,
               context_tokens=None, context_lengths=None):
        context = context_padding_mask = None
        if context_tokens is not None:
            context, context_padding_mask = self.encode_context(
                variables, context_tokens, context_lengths, rng, training
            )
        return self.encoder(
            variables["params"]["encoder"],
            variables["state"]["encoder"],
            src_tokens,
            src_lengths,
            context=context,
            context_padding_mask=context_padding_mask,
            rng=rng,
            deterministic=not training,
            training=training,
        )

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        encoder_out, enc_state = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training,
            context_tokens=batch.get("context_tokens"),
            context_lengths=batch.get("context_lengths"),
        )
        logits, extra = self.decoder(
            variables["params"]["decoder"],
            batch["prev_output_tokens"],
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            context=encoder_out.context_out,
            context_padding_mask=encoder_out.context_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        extra["encoder_out"] = encoder_out
        return (logits, extra), {"encoder": enc_state}

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len,
            encoder_out.encoder_out, dtype,
            context_out=encoder_out.context_out,
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        return self.decoder.step(
            variables["params"]["decoder"],
            tokens,
            cache,
            step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            context_padding_mask=encoder_out.context_padding_mask,
        )


@register_model_architecture("conv_transformer_context", "conv_transformer_context")
def base_context_architecture(args):
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)
    args.context_encoder_layers = getattr(args, "context_encoder_layers", 1)
    args.context_position = getattr(args, "context_position", "both")
    args.context_decoder_attention_type = getattr(
        args, "context_decoder_attention_type", "sequential"
    )


@register_model_architecture("conv_transformer_context", "conv_transformer_context_big")
def context_big(args):
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)
    args.context_encoder_layers = getattr(args, "context_encoder_layers", 1)
    args.context_position = getattr(args, "context_position", "both")
    args.context_decoder_attention_type = getattr(
        args, "context_decoder_attention_type", "sequential"
    )


@register_model_architecture("conv_transformer_context", "conv_transformer_context_big2")
def context_big2(args):
    """Reference conv_transformer_context.py:495-498 -> conv_transformer
    speechtransformer_big2 (512/2048/8)."""
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)
    args.context_encoder_layers = getattr(args, "context_encoder_layers", 1)
    args.context_position = getattr(args, "context_position", "both")
    args.context_decoder_attention_type = getattr(
        args, "context_decoder_attention_type", "sequential"
    )


@register_model_architecture("conv_transformer_context", "conv_transformer_context_giant")
def context_giant(args):
    """Reference conv_transformer_context.py:500-503 -> conv_transformer
    speechtransformer_giant (1024/4096/16)."""
    _base_defaults(args, enc_dim=1024, ffn_dim=4096, heads=16)
    args.context_encoder_layers = getattr(args, "context_encoder_layers", 1)
    args.context_position = getattr(args, "context_position", "both")
    args.context_decoder_attention_type = getattr(
        args, "context_decoder_attention_type", "sequential"
    )
