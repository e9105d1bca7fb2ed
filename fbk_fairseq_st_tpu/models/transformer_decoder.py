"""TransformerDecoder — the decoder reused by every FBK ST model.

Functional counterpart of the reference TransformerDecoder
(fairseq/models/transformer.py:517-882): scaled token embedding + positional
embedding -> dropout -> N decoder layers (causal self-attn + encoder
cross-attn + FFN, pre/post-norm) -> optional final LayerNorm -> output
projection (tied to the input embedding when share_input_output_embed, else a
separate N(0, d^-0.5) matrix, transformer.py:586-597).

Two execution modes, both fixed-shape:
  * ``__call__``: full-sequence teacher forcing with a causal mask (training
    and scoring);
  * ``step``: one token per call against preallocated per-layer KV caches —
    the body of the jitted beam-search while_loop.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


from ..ops.core import (
    RngStream,
    dropout,
    embedding,
    embedding_table,
    init_embedding,
    init_layer_norm,
    layer_norm,
    normal_init,
)
from ..ops.positional import PositionalEmbedding
from ..ops.transformer_layer import (
    TransformerLayerConfig,
    decoder_layer,
    init_decoder_layer,
    init_decoder_layer_cache,
)


class TransformerDecoderConfig(NamedTuple):
    vocab_size: int
    embed_dim: int = 256
    ffn_dim: int = 768
    layers: int = 6
    heads: int = 4
    dropout: float = 0.3
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    learned_pos: bool = False
    max_positions: int = 1024
    padding_idx: int = 1
    share_input_output_embed: bool = False
    no_scale_embedding: bool = False
    layernorm_embedding: bool = False
    no_token_positional_embeddings: bool = False
    no_encoder_attn: bool = False
    # reference --cross-self-attention (transformer.py:155-158,583): decoder
    # self-attention keys include the encoder states
    cross_self_attention: bool = False
    quant_noise_pq: float = 0.0
    quant_noise_block: int = 8
    # LM --output-dictionary-size: the input embedding covers the full
    # vocabulary while vocab_size (the output projection) is truncated
    # (reference tasks/language_modeling.py:118-122); None = same as output
    input_vocab_size: Optional[int] = None
    adaptive_softmax_cutoff: Optional[tuple] = None
    adaptive_softmax_factor: float = 4.0
    layerdrop: float = 0.0
    adaptive_input_cutoff: Optional[tuple] = None
    adaptive_input_factor: float = 4.0
    # reference transformer_lm.py --no-decoder-final-norm (baevski presets):
    # pre-norm stacks normally end in a final LayerNorm; this drops it
    no_decoder_final_norm: bool = False
    # --tie-adaptive-weights / --tie-adaptive-proj (baevski_wiki103): share
    # the adaptive softmax output weights (and projections) with the
    # adaptive input embedding clusters
    tie_adaptive_weights: bool = False
    tie_adaptive_proj: bool = False
    # char-CNN word embeddings (reference CharacterTokenEmbedder); the
    # word->char table travels on the decoder object (arrays aren't hashable)
    char_embedder: Optional[tuple] = None  # ops.character_embedder config
    eos_idx: int = 2
    unk_idx: int = 3

    @property
    def layer_cfg(self) -> TransformerLayerConfig:
        return TransformerLayerConfig(
            embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            num_heads=self.heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
            cross_self_attention=self.cross_self_attention,
            quant_noise_pq=self.quant_noise_pq,
            quant_noise_block=self.quant_noise_block,
        )


class TransformerDecoder:
    def __init__(self, cfg: TransformerDecoderConfig, char_table=None):
        self.cfg = cfg
        self.char_table = char_table  # (V, max_char_len) np constant
        self.embed_scale = (
            1.0 if cfg.no_scale_embedding else cfg.embed_dim ** 0.5
        )
        self.pos = (
            None
            if cfg.no_token_positional_embeddings
            else PositionalEmbedding(
                cfg.max_positions, cfg.embed_dim, cfg.padding_idx, cfg.learned_pos
            )
        )

    def init(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        in_vocab = cfg.input_vocab_size or cfg.vocab_size
        if cfg.share_input_output_embed and in_vocab != cfg.vocab_size:
            raise ValueError(
                "--output-dictionary-size is incompatible with "
                "--share-decoder-input-output-embed"
            )
        ks = jax.random.split(key, cfg.layers + 3)
        if cfg.char_embedder is not None:
            from ..ops.character_embedder import init_character_embedder

            embed_p = {
                "char_embedder": init_character_embedder(
                    ks[0], cfg.char_embedder
                )
            }
        elif cfg.adaptive_input_cutoff is not None:
            from ..ops.adaptive_softmax import init_adaptive_input

            embed_p = {
                "adaptive_input": init_adaptive_input(
                    ks[0], in_vocab, cfg.padding_idx, cfg.embed_dim,
                    cfg.adaptive_input_factor, cfg.embed_dim,
                    cfg.adaptive_input_cutoff,
                )
            }
        else:
            embed_p = {
                "embed_tokens": init_embedding(
                    ks[0], in_vocab, cfg.embed_dim, cfg.padding_idx
                )
            }
        p: Dict[str, Any] = {
            **embed_p,
            "layers": [
                init_decoder_layer(ks[1 + i], cfg.layer_cfg, cfg.no_encoder_attn)
                for i in range(cfg.layers)
            ],
        }
        if self.pos is not None and cfg.learned_pos:
            p["embed_positions"] = self.pos.init(ks[-2])
        if cfg.normalize_before and not cfg.no_decoder_final_norm:
            p["final_ln"] = init_layer_norm(cfg.embed_dim)
        if cfg.layernorm_embedding:
            p["layernorm_embedding"] = init_layer_norm(cfg.embed_dim)
        if cfg.adaptive_softmax_cutoff is not None:
            from ..ops.adaptive_softmax import (
                init_adaptive_softmax,
                init_tied_adaptive_softmax,
            )

            if cfg.tie_adaptive_weights:
                if cfg.adaptive_input_cutoff is None:
                    raise ValueError(
                        "--tie-adaptive-weights requires --adaptive-input"
                    )
                if tuple(cfg.adaptive_input_cutoff) != tuple(
                    cfg.adaptive_softmax_cutoff
                ):
                    raise ValueError(
                        "tied adaptive softmax needs matching input/softmax "
                        "cutoffs (reference transformer_lm.py:141-148)"
                    )
                p["adaptive_softmax"] = init_tied_adaptive_softmax(
                    ks[-1], cfg.vocab_size, cfg.embed_dim,
                    cfg.adaptive_softmax_cutoff,
                    cfg.adaptive_softmax_factor, cfg.tie_adaptive_proj,
                )
            else:
                p["adaptive_softmax"] = init_adaptive_softmax(
                    ks[-1], cfg.vocab_size, cfg.embed_dim,
                    cfg.adaptive_softmax_cutoff, cfg.adaptive_softmax_factor,
                )
        elif not cfg.share_input_output_embed:
            p["embed_out"] = normal_init(
                ks[-1], (cfg.vocab_size, cfg.embed_dim), std=cfg.embed_dim ** -0.5
            )
        return p

    # -- shared embedding/entry ---------------------------------------------

    def _embed(self, params, tokens, dtype, rng, deterministic, step=None,
               token_embeddings=None):
        cfg = self.cfg
        if token_embeddings is not None:
            # NAT src-embedding-copy: caller supplies the input embeddings
            x = self.embed_scale * token_embeddings.astype(dtype)
        elif "char_embedder" in params:
            from ..ops.character_embedder import character_embed

            x = self.embed_scale * character_embed(
                params["char_embedder"], cfg.char_embedder, self.char_table,
                tokens, cfg.padding_idx, cfg.eos_idx, cfg.unk_idx,
            ).astype(dtype)
        elif "adaptive_input" in params:
            from ..ops.adaptive_softmax import _parse_cutoff, adaptive_embed

            x = self.embed_scale * adaptive_embed(
                params["adaptive_input"],
                _parse_cutoff(
                    cfg.adaptive_input_cutoff,
                    cfg.input_vocab_size or cfg.vocab_size,
                ),
                tokens, dtype,
            )
        else:
            x = self.embed_scale * embedding(
                params["embed_tokens"], tokens, dtype
            )
        if self.pos is not None:
            pos_params = params.get("embed_positions", {})
            x = x + self.pos.from_ids(pos_params, tokens, dtype, step=step)
        if cfg.layernorm_embedding:
            x = layer_norm(params["layernorm_embedding"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)
        return x

    def output_layer(self, params, x):
        if (
            "adaptive_input" in params
            and self.cfg.share_input_output_embed
            and self.cfg.adaptive_softmax_cutoff is None
        ):
            raise ValueError(
                "adaptive input embeddings cannot be tied to a dense output "
                "projection; use --adaptive-softmax-cutoff or disable "
                "--share-decoder-input-output-embed"
            )
        if self.cfg.adaptive_softmax_cutoff is not None:
            from ..ops.adaptive_softmax import (
                _parse_cutoff,
                adaptive_log_probs,
                tied_adaptive_log_probs,
            )

            cutoff = _parse_cutoff(
                self.cfg.adaptive_softmax_cutoff, self.cfg.vocab_size
            )
            # composed log-probs; log_softmax over them is the identity,
            # so downstream consumers can treat them as logits
            if self.cfg.tie_adaptive_weights:
                # Baevski & Auli full recipe: output weights ARE the
                # adaptive input embeddings (shared leaves; gradients flow
                # to both uses)
                return tied_adaptive_log_probs(
                    params["adaptive_softmax"],
                    params["adaptive_input"],
                    cutoff, x, self.cfg.tie_adaptive_proj,
                ).astype(x.dtype)
            return adaptive_log_probs(
                params["adaptive_softmax"], cutoff, x
            ).astype(x.dtype)
        if self.cfg.share_input_output_embed:
            w = embedding_table(params["embed_tokens"])
        else:
            w = params["embed_out"]
        return x @ w.T.astype(x.dtype)

    # -- full-sequence (training / scoring) ----------------------------------

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
        causal: bool = True,
        token_embeddings=None,
    ):
        """prev_output_tokens: (B, T) -> logits (B, T, V).

        ``causal=False`` gives the full-context decoder used by NAT models
        (mask-predict sees all positions).
        Returns (logits_or_features, {'attn': cross-attn of last layer|None}).
        """
        rng = rng or RngStream(None)
        dtype = encoder_out.dtype if encoder_out is not None else jnp.float32
        x = self._embed(
            params, prev_output_tokens, dtype, rng, deterministic,
            token_embeddings=token_embeddings,
        )
        mask = "causal" if causal else None
        # mask pad keys in self-attention (fairseq transformer.py
        # extract_features: self_attn_padding_mask when any pads)
        self_kpm = prev_output_tokens == self.cfg.padding_idx
        attn = None
        n = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            y, a, _ = decoder_layer(
                lp,
                self.cfg.layer_cfg,
                x,
                encoder_out=encoder_out,
                encoder_padding_mask=encoder_padding_mask,
                self_attn_mask=mask,
                self_attn_padding_mask=self_kpm,
                rng=rng,
                deterministic=deterministic,
                need_attn=need_attn and i == n - 1,
            )
            if self.cfg.layerdrop > 0 and not deterministic:
                keep = jax.random.bernoulli(
                    rng.next(), 1.0 - self.cfg.layerdrop
                )
                y = jnp.where(keep, y, x)
            x = y
            if a is not None:
                attn = a
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        if features_only:
            return x, {"attn": attn}
        return self.output_layer(params, x), {"attn": attn}

    # -- incremental decoding -------------------------------------------------

    def init_cache(
        self, params, batch: int, max_len: int, encoder_out=None, dtype=jnp.float32
    ):
        """Preallocated per-layer KV caches + precomputed cross K/V."""
        return [
            init_decoder_layer_cache(
                lp, self.cfg.layer_cfg, batch, max_len, encoder_out, dtype
            )
            for lp in params["layers"]
        ]

    def step(
        self,
        params,
        tokens,
        cache,
        step_index,
        encoder_padding_mask=None,
        need_attn: bool = False,
    ):
        """One decode step.

        tokens: (B, 1) current input token; step_index: traced int32 scalar.
        Returns (logits (B, V), new_cache, attn|None).
        """
        dtype = cache[0]["self"]["k"].dtype
        rng = RngStream(None)
        x = self._embed(params, tokens, dtype, rng, True, step=step_index)
        new_cache = []
        attn = None
        n = len(params["layers"])
        for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
            x, a, nc = decoder_layer(
                lp,
                self.cfg.layer_cfg,
                x,
                encoder_padding_mask=encoder_padding_mask,
                rng=rng,
                deterministic=True,
                cache=lc,
                cache_index=step_index,
                need_attn=need_attn and i == n - 1,
            )
            new_cache.append(nc)
            if a is not None:
                attn = a
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        logits = self.output_layer(params, x)[:, 0, :]
        return logits, new_cache, attn

    def max_positions(self) -> int:
        return self.cfg.max_positions


class TriangleTransformerDecoder(TransformerDecoder):
    """Decoder whose layers add a second cross-attention over the auxiliary
    (transcript) decoder states (reference conv_transformer_triangle.py
    TriangleTransformerDecoder + modules/triangle_transformer_layer.py)."""

    def init(self, key) -> Dict[str, Any]:
        from ..ops.transformer_layer import init_triangle_decoder_layer

        p = super().init(key)
        cfg = self.cfg
        ks = jax.random.split(jax.random.fold_in(key, 777), cfg.layers)
        p["layers"] = [
            init_triangle_decoder_layer(ks[i], cfg.layer_cfg)
            for i in range(cfg.layers)
        ]
        return p

    def __call__(
        self,
        params,
        prev_output_tokens,
        encoder_out=None,
        encoder_padding_mask=None,
        aux_decoder_out=None,
        aux_decoder_padding_mask=None,
        rng: Optional[RngStream] = None,
        deterministic: bool = True,
        features_only: bool = False,
        need_attn: bool = False,
    ):
        from ..ops.transformer_layer import triangle_decoder_layer

        rng = rng or RngStream(None)
        dtype = encoder_out.dtype if encoder_out is not None else jnp.float32
        x = self._embed(params, prev_output_tokens, dtype, rng, deterministic)
        mask = "causal"
        self_kpm = prev_output_tokens == self.cfg.padding_idx
        for lp in params["layers"]:
            x, _, _ = triangle_decoder_layer(
                lp,
                self.cfg.layer_cfg,
                x,
                encoder_out=encoder_out,
                encoder_padding_mask=encoder_padding_mask,
                aux_decoder_out=aux_decoder_out,
                aux_decoder_padding_mask=aux_decoder_padding_mask,
                self_attn_mask=mask,
                self_attn_padding_mask=self_kpm,
                rng=rng,
                deterministic=deterministic,
            )
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        if features_only:
            return x, {"attn": None}
        return self.output_layer(params, x), {"attn": None}

    def init_cache(
        self,
        params,
        batch: int,
        max_len: int,
        encoder_out=None,
        dtype=jnp.float32,
        aux_out=None,
    ):
        from ..ops.transformer_layer import init_triangle_decoder_layer_cache

        return [
            init_triangle_decoder_layer_cache(
                lp, self.cfg.layer_cfg, batch, max_len, encoder_out, aux_out, dtype
            )
            for lp in params["layers"]
        ]

    def step(
        self,
        params,
        tokens,
        cache,
        step_index,
        encoder_padding_mask=None,
        aux_decoder_padding_mask=None,
        need_attn: bool = False,
    ):
        from ..ops.transformer_layer import triangle_decoder_layer

        dtype = cache[0]["self"]["k"].dtype
        rng = RngStream(None)
        x = self._embed(params, tokens, dtype, rng, True, step=step_index)
        new_cache = []
        for lp, lc in zip(params["layers"], cache):
            x, _, nc = triangle_decoder_layer(
                lp,
                self.cfg.layer_cfg,
                x,
                encoder_padding_mask=encoder_padding_mask,
                aux_decoder_padding_mask=aux_decoder_padding_mask,
                rng=rng,
                deterministic=True,
                cache=lc,
                cache_index=step_index,
            )
            new_cache.append(nc)
        if "final_ln" in params:
            x = layer_norm(params["final_ln"], x)
        logits = self.output_layer(params, x)[:, 0, :]
        return logits, new_cache, None
