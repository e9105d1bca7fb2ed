"""Transformer encoder/decoder layers (pre- or post-norm).

Functional counterparts of the reference layers
(fairseq/modules/transformer_layer.py): residual -> [LN] -> attn -> dropout
-> add -> [LN], then the same around the fc1/activation/fc2 FFN; LN placement
controlled by ``normalize_before``. The encoder layer optionally swaps
self-attention for LocalAttention with a distance penalty
(examples/speech_recognition/modules/conv_transformer_layer.py) — in this
build the penalty is a flag on the same fused MHA rather than a separate
module, so XLA sees one attention kernel either way.

Decoder layers carry two fixed-shape caches per layer: ``self`` (grown by
dynamic_update_slice each step) and ``cross`` (encoder K/V, precomputed).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import constrain_seq_parallel
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


class TransformerLayerConfig(NamedTuple):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = True
    # encoder self-attention distance penalty ('log' | 'gauss' | None)
    distance_penalty: Optional[str] = None
    init_variance: float = 1.0
    # decoder self-attention additionally attends over the encoder states
    # (reference --cross-self-attention, transformer_layer.py:286-307)
    cross_self_attention: bool = False
    # --quant-noise-pq training noise on every projection/FFN weight
    # (reference transformer.py:169-174 + modules/quant_noise.py)
    quant_noise_pq: float = 0.0
    quant_noise_block: int = 8

    @property
    def self_attn_cfg(self) -> MHAConfig:
        return MHAConfig(
            self.embed_dim,
            self.num_heads,
            dropout=self.attention_dropout,
            penalty=self.distance_penalty,
            init_variance=self.init_variance,
        )

    @property
    def cross_attn_cfg(self) -> MHAConfig:
        return MHAConfig(self.embed_dim, self.num_heads, dropout=self.attention_dropout)


# ---------------------------------------------------------------------------
# Encoder layer
# ---------------------------------------------------------------------------

def init_encoder_layer(key, cfg: TransformerLayerConfig):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(ks[0], cfg.self_attn_cfg),
        "self_attn_ln": init_layer_norm(cfg.embed_dim),
        "fc1": init_linear(ks[1], cfg.embed_dim, cfg.ffn_dim),
        "fc2": init_linear(ks[2], cfg.ffn_dim, cfg.embed_dim),
        "final_ln": init_layer_norm(cfg.embed_dim),
    }


def _pq_noised(params, cfg: TransformerLayerConfig, rng: "RngStream"):
    """Apply --quant-noise-pq block dropout to every projection weight of a
    layer (fc1/fc2 + q/k/v/out of each attention), the set the reference
    wraps with quant_noise() Linear hooks."""
    from ..quantization.quant_noise import quant_noise_linear

    out = dict(params)
    for name in ("fc1", "fc2"):
        if name in out:
            out[name] = dict(
                out[name],
                w=quant_noise_linear(
                    rng.next(), out[name]["w"],
                    cfg.quant_noise_pq, cfg.quant_noise_block,
                ),
            )
    for name in ("self_attn", "encoder_attn"):
        if name not in out:
            continue
        proj = dict(out[name])
        for k in ("q", "k", "v", "out"):
            if k in proj and isinstance(proj[k], dict) and "w" in proj[k]:
                proj[k] = dict(
                    proj[k],
                    w=quant_noise_linear(
                        rng.next(), proj[k]["w"],
                        cfg.quant_noise_pq, cfg.quant_noise_block,
                    ),
                )
        out[name] = proj
    return out


def encoder_layer(
    params,
    cfg: TransformerLayerConfig,
    x,
    key_padding_mask=None,
    attn_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
):
    """x: (B, T, D) -> (B, T, D). attn_mask: (T, T) additive fp32 (e.g. the
    vggtransformer left/right context mask)."""
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)
    if cfg.quant_noise_pq > 0 and not deterministic and rng.active:
        params = _pq_noised(params, cfg, rng)

    # Megatron-SP: under an active sequence-parallel scope the LN/dropout/
    # residual segments run time-sharded over the 'model' axis (GSPMD turns
    # the TP boundary all-reduces into reduce-scatter/all-gather pairs);
    # no-op otherwise (parallel/mesh.py constrain_seq_parallel)
    x = constrain_seq_parallel(x)
    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)
    x, _, _ = mha(
        params["self_attn"],
        cfg.self_attn_cfg,
        x,
        key_padding_mask=key_padding_mask,
        attn_mask=attn_mask,
        rng=rng,
        deterministic=deterministic,
    )
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = constrain_seq_parallel(residual + x)
    if not cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)

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


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------

def init_decoder_layer(key, cfg: TransformerLayerConfig, no_encoder_attn: bool = False):
    ks = jax.random.split(key, 4)
    p = {
        "self_attn": init_mha(ks[0], cfg.self_attn_cfg),
        "self_attn_ln": init_layer_norm(cfg.embed_dim),
        "fc1": init_linear(ks[1], cfg.embed_dim, cfg.ffn_dim),
        "fc2": init_linear(ks[2], cfg.ffn_dim, cfg.embed_dim),
        "final_ln": init_layer_norm(cfg.embed_dim),
    }
    if not no_encoder_attn:
        p["encoder_attn"] = init_mha(ks[3], cfg.cross_attn_cfg)
        p["encoder_attn_ln"] = init_layer_norm(cfg.embed_dim)
    return p


def init_decoder_layer_cache(
    params, cfg: TransformerLayerConfig, batch: int, max_len: int, encoder_out=None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    from .attention import _split_heads, init_cache

    if cfg.cross_self_attention and encoder_out is not None:
        # the self-attention buffer holds [encoder K/V; decoder K/V]: the
        # reference seeds its incremental buffer with cat(encoder_out, x) on
        # the first step (transformer_layer.py:286-307); here the encoder
        # rows are projected once and decode steps write at offset S + step
        s = encoder_out.shape[1]
        base = init_cache(batch, s + max_len, cfg.self_attn_cfg, dtype)
        k_enc = _split_heads(
            linear(params["self_attn"]["k"], encoder_out), cfg.num_heads
        ).astype(dtype)
        v_enc = _split_heads(
            linear(params["self_attn"]["v"], encoder_out), cfg.num_heads
        ).astype(dtype)
        cache = {
            "self": {
                "k": base["k"].at[:, :, :s, :].set(k_enc),
                "v": base["v"].at[:, :, :s, :].set(v_enc),
            }
        }
    else:
        cache = {"self": init_cache(batch, max_len, cfg.self_attn_cfg, dtype)}
    if encoder_out is not None and "encoder_attn" in params:
        cache["cross"] = precompute_cross_cache(
            params["encoder_attn"], cfg.cross_attn_cfg, encoder_out
        )
    return cache


def init_triangle_decoder_layer(key, cfg: TransformerLayerConfig):
    """Triangle decoder layer (IWSLT 2021; reference modules/
    triangle_transformer_layer.py:16-51): a second cross-attention over the
    auxiliary-decoder states, fused with encoder cross-attention output by
    fc_concat."""
    k1, k2 = jax.random.split(key)
    p = init_decoder_layer(k1, cfg, no_encoder_attn=False)
    ka, kf = jax.random.split(k2)
    p["aux_decoder_attn"] = init_mha(ka, cfg.cross_attn_cfg)
    p["aux_decoder_attn_ln"] = init_layer_norm(cfg.embed_dim)
    p["fc_concat"] = init_linear(kf, cfg.embed_dim * 2, cfg.embed_dim)
    return p


def init_triangle_decoder_layer_cache(
    params, cfg: TransformerLayerConfig, batch: int, max_len: int,
    encoder_out=None, aux_out=None, dtype=jnp.float32,
):
    cache = init_decoder_layer_cache(params, cfg, batch, max_len, encoder_out, dtype)
    if aux_out is not None:
        cache["aux"] = precompute_cross_cache(
            params["aux_decoder_attn"], cfg.cross_attn_cfg, aux_out
        )
    return cache


def triangle_decoder_layer(
    params,
    cfg: TransformerLayerConfig,
    x,
    encoder_out=None,
    encoder_padding_mask=None,
    aux_decoder_out=None,
    aux_decoder_padding_mask=None,
    self_attn_mask=None,
    self_attn_padding_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    cache: Optional[Dict[str, Any]] = None,
    cache_index=None,
):
    """Triangle layer forward (reference triangle_transformer_layer.py
    :52-210): self-attn, then parallel encoder + aux-decoder cross-attns
    (each dropout'd) concatenated and fused by fc_concat, then FFN.
    Pre-norm uses encoder_attn_ln before the pair; post-norm applies
    aux_decoder_attn_ln after the fused residual."""
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)
    new_cache: Optional[Dict[str, Any]] = {} if cache is not None else None

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)
    x, _, self_cache = mha(
        params["self_attn"],
        cfg.self_attn_cfg,
        x,
        key_padding_mask=self_attn_padding_mask,
        attn_mask=self_attn_mask,
        rng=rng,
        deterministic=deterministic,
        cache=cache.get("self") if cache is not None else None,
        cache_index=cache_index,
    )
    if new_cache is not None:
        new_cache["self"] = self_cache
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["encoder_attn_ln"], x)
    cross_cache = cache.get("cross") if cache is not None else None
    if cross_cache is not None:
        x1, _, _ = mha(
            params["encoder_attn"], cfg.cross_attn_cfg, x,
            key_padding_mask=encoder_padding_mask,
            rng=rng, deterministic=deterministic,
            cache=cross_cache, static_kv=True,
        )
        if new_cache is not None:
            new_cache["cross"] = cross_cache
    else:
        x1, _, _ = mha(
            params["encoder_attn"], cfg.cross_attn_cfg, x,
            key=encoder_out, key_padding_mask=encoder_padding_mask,
            rng=rng, deterministic=deterministic,
        )
    x1 = dropout(x1, cfg.dropout, rng, deterministic)

    aux_cache = cache.get("aux") if cache is not None else None
    if aux_cache is not None:
        x2, _, _ = mha(
            params["aux_decoder_attn"], cfg.cross_attn_cfg, x,
            key_padding_mask=aux_decoder_padding_mask,
            rng=rng, deterministic=deterministic,
            cache=aux_cache, static_kv=True,
        )
        if new_cache is not None:
            new_cache["aux"] = aux_cache
    else:
        x2, _, _ = mha(
            params["aux_decoder_attn"], cfg.cross_attn_cfg, x,
            key=aux_decoder_out, key_padding_mask=aux_decoder_padding_mask,
            rng=rng, deterministic=deterministic,
        )
    x2 = dropout(x2, cfg.dropout, rng, deterministic)

    x = linear(params["fc_concat"], jnp.concatenate([x1, x2], axis=-1))
    x = residual + x
    if not cfg.normalize_before:
        x = layer_norm(params["aux_decoder_attn_ln"], x)

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
    return x, None, new_cache


def decoder_layer(
    params,
    cfg: TransformerLayerConfig,
    x,
    encoder_out=None,
    encoder_padding_mask=None,
    self_attn_mask=None,
    self_attn_padding_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    cache: Optional[Dict[str, Any]] = None,
    cache_index=None,
    need_attn: bool = False,
):
    """x: (B, T, D). Returns (x, cross_attn_weights|None, new_cache|None)."""
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)
    if cfg.quant_noise_pq > 0 and not deterministic and rng.active:
        params = _pq_noised(params, cfg, rng)
    new_cache: Optional[Dict[str, Any]] = {} if cache is not None else None

    x = constrain_seq_parallel(x)  # no-op outside a sequence-parallel scope
    residual = x
    if cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)
    self_key = None
    self_cache_index = cache_index
    if cfg.cross_self_attention and encoder_out is not None and cache is None:
        # keys/values are cat(encoder_out, x): every decoder position may
        # attend to every encoder position, causal over the decoder suffix
        # (reference transformer_layer.py:286-307)
        b, t = x.shape[0], x.shape[1]
        s = encoder_out.shape[1]
        self_key = jnp.concatenate([encoder_out.astype(x.dtype), x], axis=1)
        if isinstance(self_attn_mask, str) and self_attn_mask == "causal":
            from .attention import causal_mask

            self_attn_mask = jnp.concatenate(
                [jnp.zeros((t, s), jnp.float32), causal_mask(t)], axis=1
            )
        epm = (
            encoder_padding_mask
            if encoder_padding_mask is not None
            else jnp.zeros((b, s), bool)
        )
        spm = (
            self_attn_padding_mask
            if self_attn_padding_mask is not None
            else jnp.zeros((b, t), bool)
        )
        self_attn_padding_mask = jnp.concatenate([epm, spm], axis=1)
    elif cfg.cross_self_attention and cache is not None:
        # incremental: the buffer is pre-seeded with S encoder rows
        # (init_decoder_layer_cache), so writes land at S + step
        buf_len = cache["self"]["k"].shape[2]
        s = (
            encoder_padding_mask.shape[1]
            if encoder_padding_mask is not None
            else 0
        )
        if s:
            b = x.shape[0]
            self_cache_index = cache_index + s
            self_attn_padding_mask = jnp.concatenate(
                [encoder_padding_mask, jnp.zeros((b, buf_len - s), bool)],
                axis=1,
            )
    x, _, self_cache = mha(
        params["self_attn"],
        cfg.self_attn_cfg,
        x,
        key=self_key,
        key_padding_mask=self_attn_padding_mask,
        attn_mask=self_attn_mask,
        rng=rng,
        deterministic=deterministic,
        cache=cache.get("self") if cache is not None else None,
        cache_index=self_cache_index,
    )
    if new_cache is not None:
        new_cache["self"] = self_cache
    x = dropout(x, cfg.dropout, rng, deterministic)
    x = constrain_seq_parallel(residual + x)
    if not cfg.normalize_before:
        x = layer_norm(params["self_attn_ln"], x)

    attn = None
    if "encoder_attn" in params:
        residual = x
        if cfg.normalize_before:
            x = layer_norm(params["encoder_attn_ln"], x)
        cross_cache = cache.get("cross") if cache is not None else None
        if cross_cache is not None:
            x, attn, _ = mha(
                params["encoder_attn"],
                cfg.cross_attn_cfg,
                x,
                key_padding_mask=encoder_padding_mask,
                rng=rng,
                deterministic=deterministic,
                cache=cross_cache,
                static_kv=True,
                need_weights=need_attn,
            )
            if new_cache is not None:
                new_cache["cross"] = cross_cache
        else:
            x, attn, _ = mha(
                params["encoder_attn"],
                cfg.cross_attn_cfg,
                x,
                key=encoder_out,
                key_padding_mask=encoder_padding_mask,
                rng=rng,
                deterministic=deterministic,
                need_weights=need_attn,
            )
        x = dropout(x, cfg.dropout, rng, deterministic)
        x = constrain_seq_parallel(residual + x)
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
    return x, attn, new_cache
