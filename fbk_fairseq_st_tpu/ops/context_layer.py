"""Context-aware transformer layers with sigmoid gating (INTERSPEECH 2020).

Counterparts of examples/speech_recognition/modules/
conv_transformer_context_layer.py: after self-attention (encoder) or
encoder-attention (decoder), a context cross-attention whose output is fused
by ``lambda = sigmoid(W_i . residual + W_s . ctx_attn)``:

  * sequential (encoder :75-86, decoder "sequential" :239-252):
    ``x = lambda * residual + (1 - lambda) * ctx_attn``;
  * parallel (decoder :252-259): context attention queries the same
    normalized input as encoder attention and gates against the
    encoder-attention output; exposes ``ctx_gate = 1 - lambda`` for the
    ctxreg regularizer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .attention import MHAConfig, init_mha, mha, precompute_cross_cache
from .core import (
    RngStream,
    dropout,
    get_activation,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from .transformer_layer import (
    TransformerLayerConfig,
    init_decoder_layer,
    init_decoder_layer_cache,
    init_encoder_layer,
)


def init_context_block(key, cfg: TransformerLayerConfig):
    ka, ki, ks = jax.random.split(key, 3)
    return {
        "context_attn": init_mha(ka, cfg.cross_attn_cfg),
        "context_gating_wi": init_linear(ki, cfg.embed_dim, cfg.embed_dim),
        "context_gating_ws": init_linear(ks, cfg.embed_dim, cfg.embed_dim),
        "context_ln": init_layer_norm(cfg.embed_dim),
    }


def _ctx_attend(params, cfg, query, context, context_padding_mask, rng,
                deterministic, cache=None):
    if cache is not None:
        out, _, _ = mha(
            params["context_attn"], cfg.cross_attn_cfg, query,
            key_padding_mask=context_padding_mask,
            rng=rng, deterministic=deterministic,
            cache=cache, static_kv=True,
        )
    else:
        out, _, _ = mha(
            params["context_attn"], cfg.cross_attn_cfg, query,
            key=context, key_padding_mask=context_padding_mask,
            rng=rng, deterministic=deterministic,
        )
    return dropout(out, cfg.dropout, rng, deterministic)


def init_context_encoder_layer(key, cfg: TransformerLayerConfig, add_context: bool):
    k1, k2 = jax.random.split(key)
    p = init_encoder_layer(k1, cfg)
    if add_context:
        p.update(init_context_block(k2, cfg))
    return p


def context_encoder_layer(
    params,
    cfg: TransformerLayerConfig,
    x,
    key_padding_mask=None,
    context=None,
    context_padding_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
):
    """Encoder layer with sequential gated context attention."""
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)
    x, _, _ = mha(
        params["self_attn"], cfg.self_attn_cfg, x,
        key_padding_mask=key_padding_mask, rng=rng, deterministic=deterministic,
    )
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)

    if "context_attn" in params and context is not None:
        residual = x
        if cfg.normalize_before:
            x = layer_norm(params["context_ln"], x)
        c = _ctx_attend(
            params, cfg, x, context, context_padding_mask, rng, deterministic
        )
        lam = jax.nn.sigmoid(
            linear(params["context_gating_wi"], residual)
            + linear(params["context_gating_ws"], c)
        )
        x = lam * residual + (1.0 - lam) * c
        if not cfg.normalize_before:
            x = layer_norm(params["context_ln"], x)

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
    return x


def init_context_decoder_layer(key, cfg: TransformerLayerConfig, add_context: bool):
    k1, k2 = jax.random.split(key)
    p = init_decoder_layer(k1, cfg)
    if add_context:
        p.update(init_context_block(k2, cfg))
    return p


def init_context_decoder_layer_cache(
    params, cfg: TransformerLayerConfig, batch: int, max_len: int,
    encoder_out=None, context_out=None, dtype=jnp.float32,
):
    cache = init_decoder_layer_cache(params, cfg, batch, max_len, encoder_out, dtype)
    if context_out is not None and "context_attn" in params:
        cache["ctx"] = precompute_cross_cache(
            params["context_attn"], cfg.cross_attn_cfg, context_out
        )
    return cache


def context_decoder_layer(
    params,
    cfg: TransformerLayerConfig,
    x,
    encoder_out=None,
    encoder_padding_mask=None,
    context=None,
    context_padding_mask=None,
    attention_type: str = "sequential",
    self_attn_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    cache: Optional[Dict[str, Any]] = None,
    cache_index=None,
):
    """Decoder layer with gated context attention.

    Returns (x, ctx_gate | None, new_cache | None).
    """
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)
    new_cache: Optional[Dict[str, Any]] = {} if cache is not None else None

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)
    x, _, self_cache = mha(
        params["self_attn"], cfg.self_attn_cfg, x,
        attn_mask=self_attn_mask, rng=rng, deterministic=deterministic,
        cache=cache.get("self") if cache is not None else None,
        cache_index=cache_index,
    )
    if new_cache is not None:
        new_cache["self"] = self_cache
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)

    # encoder attention
    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)
    query_ctx = x  # parallel mode queries the same normalized input
    cross_cache = cache.get("cross") if cache is not None else None
    if cross_cache is not None:
        x, _, _ = mha(
            params["encoder_attn"], cfg.cross_attn_cfg, x,
            key_padding_mask=encoder_padding_mask, rng=rng,
            deterministic=deterministic, cache=cross_cache, static_kv=True,
        )
        if new_cache is not None:
            new_cache["cross"] = cross_cache
    else:
        x, _, _ = mha(
            params["encoder_attn"], cfg.cross_attn_cfg, x,
            key=encoder_out, key_padding_mask=encoder_padding_mask,
            rng=rng, deterministic=deterministic,
        )
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)

    ctx_gate = None
    if "context_attn" in params and (
        context is not None or (cache is not None and "ctx" in cache)
    ):
        ctx_cache = cache.get("ctx") if cache is not None else None
        if ctx_cache is not None and new_cache is not None:
            new_cache["ctx"] = ctx_cache
        if attention_type == "sequential":
            residual = x
            if cfg.normalize_before:
                x = layer_norm(params["context_ln"], x)
            c = _ctx_attend(
                params, cfg, x, context, context_padding_mask, rng,
                deterministic, cache=ctx_cache,
            )
            lam = jax.nn.sigmoid(
                linear(params["context_gating_wi"], residual)
                + linear(params["context_gating_ws"], c)
            )
            x = lam * residual + (1.0 - lam) * c
            if not cfg.normalize_before:
                x = layer_norm(params["context_ln"], x)
        elif attention_type == "parallel":
            c = _ctx_attend(
                params, cfg, query_ctx, context, context_padding_mask, rng,
                deterministic, cache=ctx_cache,
            )
            lam = jax.nn.sigmoid(
                linear(params["context_gating_wi"], x)
                + linear(params["context_gating_ws"], c)
            )
            x = lam * x + (1.0 - lam) * c
            ctx_gate = 1.0 - lam
        else:
            raise RuntimeError(
                f"Invalid decoder context attention type {attention_type}"
            )

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
    return x, ctx_gate, new_cache
