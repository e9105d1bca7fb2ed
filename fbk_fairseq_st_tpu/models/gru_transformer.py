"""gru_transformer: transformer with a bidirectional-GRU embedding
contextualizer (reference examples/byte_level_bpe/gru_transformer.py:17-46,
"Neural Machine Translation with Byte-Level Subwords"): token embeddings
(+ positions) pass through a 1-layer bi-GRU (hidden = embed_dim/2 per
direction, concatenated back to embed_dim) before the transformer encoder
stack — byte-level units carry little context on their own, so the GRU
contextualizes them first.

TPU formulation: the GRU is two ``lax.scan`` passes (forward/reverse) over
time with torch's gate layout (r, z, n rows in one packed (3H, ·) matrix),
so fork checkpoints port directly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, dropout, layer_norm
from ..ops.transformer_layer import encoder_layer
from ..registry import register_model, register_model_architecture
from .base import EncoderOut
from .transformer import (
    TransformerEncoder,
    TransformerModel,
    base_architecture,
)
from ..ops.core import embedding


def init_gru(key, input_dim: int, hidden: int) -> Dict[str, Any]:
    """Packed torch-layout GRU parameters: rows ordered [r; z; n]."""
    k1, k2 = jax.random.split(key)
    scale_ih = (1.0 / input_dim) ** 0.5
    scale_hh = (1.0 / hidden) ** 0.5
    return {
        "w_ih": jax.random.uniform(
            k1, (3 * hidden, input_dim), minval=-scale_ih, maxval=scale_ih
        ),
        "w_hh": jax.random.uniform(
            k2, (3 * hidden, hidden), minval=-scale_hh, maxval=scale_hh
        ),
        "b_ih": jnp.zeros((3 * hidden,), jnp.float32),
        "b_hh": jnp.zeros((3 * hidden,), jnp.float32),
    }


def gru_scan(p, xs, reverse: bool = False):
    """xs: (B, T, E) -> (B, T, H). Torch GRU cell semantics:
    r = sigma(W_ir x + b_ir + W_hr h + b_hr), z likewise,
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)), h' = (1-z) n + z h."""
    H = p["w_hh"].shape[1]
    w_ih = p["w_ih"].astype(xs.dtype)
    w_hh = p["w_hh"].astype(xs.dtype)
    b_ih = p["b_ih"].astype(xs.dtype)
    b_hh = p["b_hh"].astype(xs.dtype)

    def step(h, x):
        gi = x @ w_ih.T + b_ih
        gh = h @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((xs.shape[0], H), xs.dtype)
    _, ys = jax.lax.scan(
        step, h0, xs.transpose(1, 0, 2), reverse=reverse
    )
    return ys.transpose(1, 0, 2)


class GRUTransformerEncoder(TransformerEncoder):
    """TransformerEncoder whose embeddings are bi-GRU-contextualized."""

    def init(self, key, init_embed: bool = True):
        k_base, k_fwd, k_bwd = jax.random.split(key, 3)
        p = super().init(k_base, init_embed=init_embed)
        half = self.cfg.embed_dim // 2
        p["emb_ctx_fwd"] = init_gru(k_fwd, self.cfg.embed_dim, half)
        p["emb_ctx_bwd"] = init_gru(k_bwd, self.cfg.embed_dim, half)
        return p

    def __call__(self, params, src_tokens, src_lengths=None, rng=None,
                 deterministic=True, dtype=jnp.float32):
        cfg = self.cfg
        rng = rng or RngStream(None)
        x = self.embed_scale * embedding(
            params["embed_tokens"], src_tokens, dtype
        )
        if self.pos is not None:
            x = x + self.pos.from_ids(
                params.get("embed_positions", {}), src_tokens, dtype
            )
        # reference forward_embedding: dropout -> bi-GRU -> (layernorm) ->
        # dropout (gru_transformer.py:31-46)
        x = dropout(x, cfg.dropout, rng, deterministic)
        fwd = gru_scan(params["emb_ctx_fwd"], x)
        bwd = gru_scan(params["emb_ctx_bwd"], x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        if cfg.layernorm_embedding:
            x = layer_norm(params["layernorm_embedding"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)

        padding_mask = src_tokens == cfg.padding_idx
        for lp in params["layers"]:
            x = encoder_layer(
                lp, cfg.layer_cfg, x,
                key_padding_mask=padding_mask,
                rng=rng, deterministic=deterministic,
            )
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        return EncoderOut(
            encoder_out=x,
            encoder_padding_mask=padding_mask,
            src_lengths=src_lengths,
        )


@register_model("gru_transformer")
class GRUTransformerModel(TransformerModel):
    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.encoder = GRUTransformerEncoder(encoder_cfg)


@register_model_architecture("gru_transformer", "gru_transformer")
def gru_transformer_architecture(args):
    """Defaults per reference gru_transformer.py:49-77."""
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 2048)
    args.encoder_layers = getattr(args, "encoder_layers", 6)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 8)
    base_architecture(args)


@register_model_architecture("gru_transformer", "gru_transformer_big")
def gru_transformer_big(args):
    """Defaults per reference gru_transformer.py:80-104 (1024/4096/16)."""
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1024)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 4096)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    # reference gru_transformer.py:103 sets the big preset's dropout before
    # delegating; decoder dims inherit from the encoder dims downstream
    args.dropout = getattr(args, "dropout", 0.3)
    gru_transformer_architecture(args)
