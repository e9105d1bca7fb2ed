"""Simultaneous translation: monotonic-attention transformers.

Counterpart of examples/simultaneous_translation/models/
transformer_monotonic_attention.py:35-360 + modules/
monotonic_transformer_layer.py:16-57:

  * ``transformer_unidirectional``: a standard transformer whose encoder
    self-attention is causal (each source position sees only its prefix) —
    the streaming-encoder baseline;
  * ``transformer_monotonic`` (MMA): unidirectional encoder + a decoder
    whose cross-attention is monotonic multihead attention
    (--simul-type hard_aligned / infinite_lookback / waitk); the forward
    returns per-layer {alpha, beta, p_choose} in extra['attn_list'] for the
    latency-augmented criterion.

The training path is fully jitted and fixed-shape. The reference's
stepwise read/write agent (decision_from_states / predict_from_states,
driven by an external SimulEval server) is host-side by nature; its
policy primitive — "read while p_choose < 0.5" over the monotonic energies
— is exposed via the returned p_choose tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import mha
from ..ops.core import (
    RngStream,
    dropout,
    get_activation,
    init_layer_norm,
    layer_norm,
    linear,
)
from ..ops.monotonic_attention import (
    MonotonicAttentionConfig,
    add_monotonic_args,
    init_monotonic_attention,
    monotonic_attention,
)
from ..ops.transformer_layer import encoder_layer, init_decoder_layer
from ..registry import register_model, register_model_architecture
from .base import Model
from .transformer import (
    TransformerEncoder,
    TransformerModel,
    base_architecture,
    transformer_iwslt_de_en,
    transformer_vaswani_wmt_en_de_big,
    transformer_vaswani_wmt_en_fr_big,
)
from .transformer_decoder import TransformerDecoder


class MonotonicTransformerEncoder(TransformerEncoder):
    """Encoder with causal (unidirectional) self-attention (reference
    TransformerMonotonicEncoderLayer :16-22)."""

    def __call__(self, params, src_tokens, src_lengths=None, rng=None,
                 deterministic=True, dtype=jnp.float32):
        cfg = self.cfg
        rng = rng or RngStream(None)
        from ..ops.core import embedding

        x = self.embed_scale * embedding(
            params["embed_tokens"], src_tokens, dtype
        )
        if self.pos is not None:
            x = x + self.pos.from_ids(
                params.get("embed_positions", {}), src_tokens, dtype
            )
        if cfg.layernorm_embedding:
            x = layer_norm(params["layernorm_embedding"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)
        padding_mask = src_tokens == cfg.padding_idx
        mask = "causal"
        for lp in params["layers"]:
            x = encoder_layer(
                lp, cfg.layer_cfg, x,
                key_padding_mask=padding_mask,
                attn_mask=mask,
                rng=rng, deterministic=deterministic,
            )
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        from .base import EncoderOut

        return EncoderOut(
            encoder_out=x,
            encoder_padding_mask=padding_mask,
            src_lengths=src_lengths,
        )


def monotonic_decoder_layer(
    params,
    cfg,
    mono_cfg: MonotonicAttentionConfig,
    x,
    encoder_out,
    encoder_padding_mask,
    self_attn_mask,
    self_attn_padding_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
):
    """Decoder layer whose cross-attention is MMA (reference
    TransformerMonotonicDecoderLayer :25-38). Returns (x, mma_extra)."""
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)
    x, _, _ = mha(
        params["self_attn"], cfg.self_attn_cfg, x,
        key_padding_mask=self_attn_padding_mask,
        attn_mask=self_attn_mask,
        rng=rng, deterministic=deterministic,
    )
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)
    x, mma_extra = monotonic_attention(
        params["encoder_attn"], mono_cfg, x, encoder_out, encoder_out,
        key_padding_mask=encoder_padding_mask,
        rng=rng, deterministic=deterministic,
    )
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["final_ln"], x)
    x = act(linear(params["fc1"], x))
    x = dropout(x, cfg.activation_dropout, rng, deterministic)
    x = linear(params["fc2"], x)
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["final_ln"], x)
    return x, mma_extra


class MonotonicTransformerDecoder(TransformerDecoder):
    """Decoder with MMA cross-attention; extra carries attn_list."""

    def __init__(self, cfg, mono_cfg: MonotonicAttentionConfig):
        super().__init__(cfg)
        self.mono_cfg = mono_cfg

    def init(self, key) -> Dict[str, Any]:
        p = super().init(key)
        cfg = self.cfg
        ks = jax.random.split(jax.random.fold_in(key, 555), cfg.layers)
        layers = []
        for i in range(cfg.layers):
            lp = init_decoder_layer(ks[i], cfg.layer_cfg, no_encoder_attn=True)
            km, _ = jax.random.split(jax.random.fold_in(ks[i], 1))
            lp["encoder_attn"] = init_monotonic_attention(km, self.mono_cfg)
            lp["encoder_attn_ln"] = init_layer_norm(cfg.embed_dim)
            layers.append(lp)
        p["layers"] = layers
        return p

    def __call__(
        self,
        params,
        prev_output_tokens,
        encoder_out=None,
        encoder_padding_mask=None,
        rng: Optional[RngStream] = None,
        deterministic: bool = True,
        features_only: bool = False,
        need_attn: bool = False,
    ):
        rng = rng or RngStream(None)
        dtype = encoder_out.dtype if encoder_out is not None else jnp.float32
        x = self._embed(params, prev_output_tokens, dtype, rng, deterministic)
        mask = "causal"
        self_kpm = prev_output_tokens == self.cfg.padding_idx
        attn_list = []
        for lp in params["layers"]:
            x, mma_extra = monotonic_decoder_layer(
                lp, self.cfg.layer_cfg, self.mono_cfg, x,
                encoder_out, encoder_padding_mask,
                self_attn_mask=mask,
                self_attn_padding_mask=self_kpm,
                rng=rng, deterministic=deterministic,
            )
            attn_list.append(mma_extra)
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        extra = {
            "attn": None,
            "attn_list": attn_list,
            "encoder_padding_mask": encoder_padding_mask,
        }
        if features_only:
            return x, extra
        return self.output_layer(params, x), extra


def _mono_cfg_from_args(args) -> MonotonicAttentionConfig:
    return MonotonicAttentionConfig(
        embed_dim=args.decoder_embed_dim,
        num_heads=args.decoder_attention_heads,
        simul_type=getattr(args, "simul_type", None) or "hard_aligned",
        dropout=args.attention_dropout,
        mass_preservation=getattr(args, "mass_preservation", True),
        noise_mean=getattr(args, "noise_mean", 0.0),
        noise_var=getattr(args, "noise_var", 1.0),
        energy_bias=getattr(args, "energy_bias", False),
        energy_bias_init=getattr(args, "energy_bias_init", -2.0),
        eps=getattr(args, "attention_eps", 1e-6),
        waitk_lagging=getattr(args, "waitk_lagging", 0) or 0,
    )


@register_model("transformer_unidirectional")
class TransformerUnidirectionalModel(TransformerModel):
    """Causal-encoder transformer (reference :35-39)."""

    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.encoder = MonotonicTransformerEncoder(encoder_cfg)


@register_model("transformer_monotonic")
class TransformerMonotonicModel(TransformerModel):
    """MMA transformer (reference :42-135)."""

    mono_cfg: MonotonicAttentionConfig = None

    def __init__(self, encoder_cfg, decoder_cfg, mono_cfg,
                 share_all_embeddings=False):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.encoder = MonotonicTransformerEncoder(encoder_cfg)
        self.mono_cfg = mono_cfg
        self.decoder = MonotonicTransformerDecoder(decoder_cfg, mono_cfg)

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        add_monotonic_args(parser)

    @classmethod
    def build_model(cls, args, task):
        base_monotonic_architecture(args)
        # build a plain TransformerModel to reuse its config assembly
        inner = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        return cls(
            inner.encoder_cfg, inner.decoder_cfg, _mono_cfg_from_args(args),
            inner.share_all_embeddings,
        )


@register_model_architecture("transformer_monotonic", "transformer_monotonic")
def base_monotonic_architecture(args):
    base_architecture(args)
    args.encoder_unidirectional = getattr(args, "encoder_unidirectional", False)


@register_model_architecture(
    "transformer_monotonic", "transformer_monotonic_iwslt_de_en"
)
def transformer_monotonic_iwslt_de_en(args):
    transformer_iwslt_de_en(args)
    base_monotonic_architecture(args)


@register_model_architecture(
    "transformer_monotonic", "transformer_monotonic_vaswani_wmt_en_de_big"
)
def transformer_monotonic_vaswani_wmt_en_de_big(args):
    transformer_vaswani_wmt_en_de_big(args)


@register_model_architecture(
    "transformer_monotonic", "transformer_monotonic_vaswani_wmt_en_fr_big"
)
def transformer_monotonic_vaswani_wmt_en_fr_big(args):
    """Reference transformer_monotonic_attention.py:349-353 — NOTE: the
    reference body calls ITSELF (infinite recursion, an upstream bug); the
    intent, by analogy with the en_de preset above, is the core
    transformer_vaswani_wmt_en_fr_big defaults."""
    transformer_vaswani_wmt_en_fr_big(args)


@register_model_architecture(
    "transformer_unidirectional", "transformer_unidirectional_iwslt_de_en"
)
def transformer_unidirectional_iwslt_de_en(args):
    transformer_iwslt_de_en(args)
