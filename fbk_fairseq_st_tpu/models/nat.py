"""Non-autoregressive translation: CMLM (mask-predict) transformer.

Counterpart of the reference NAT family's flagship member
(fairseq/models/nat/cmlm_transformer.py, Ghazvininejad et al. 2019): a
full-context (non-causal) transformer decoder predicts all masked target
positions at once, plus a length-prediction head over mean-pooled encoder
states; decoding is iterative mask-predict with skeptical unmasking
(generation/iterative_refinement_generator.py). The levenshtein/insertion
members (libnat consumers) remain on the round-2 queue — their edit-distance
core already exists (native/edit_dist.cpp, ops/edit_distance.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.core import NEG_INF, RngStream, normal_init
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .transformer import (
    TransformerEncoder,
    TransformerEncoderConfig,
    TransformerModel,
    base_architecture as transformer_base,
)
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig

MAX_LENGTH = 256  # length-prediction head range (reference defaults to 256)


@register_model("cmlm_transformer")
class CMLMTransformerModel(TransformerModel):
    """Conditional masked LM NAT model."""

    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False,
                 unk=3, bos=0, eos=2, pad=1):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.unk = unk
        self.bos = bos
        self.eos = eos
        self.pad = pad

    @classmethod
    def build_model(cls, args, task):
        cmlm_base_architecture(args)
        model = super().build_model(args, task)
        d = task.target_dictionary
        nat = cls(
            model.encoder_cfg, model.decoder_cfg, model.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
        )
        return nat

    def init(self, key):
        variables = super().init(key)
        variables["params"]["embed_length"] = normal_init(
            jax.random.fold_in(key, 777),
            (MAX_LENGTH, self.encoder_cfg.embed_dim),
            std=self.encoder_cfg.embed_dim ** -0.5,
        )
        return variables

    # -- length prediction -----------------------------------------------------

    def forward_length(self, variables, encoder_out: EncoderOut):
        """Length logits from mean-pooled (non-pad) encoder states."""
        x = encoder_out.encoder_out.astype(jnp.float32)
        mask = encoder_out.encoder_padding_mask
        keep = (~mask).astype(jnp.float32)[:, :, None]
        pooled = (x * keep).sum(axis=1) / jnp.maximum(keep.sum(axis=1), 1.0)
        w = variables["params"]["embed_length"].astype(jnp.float32)
        return pooled @ w.T  # (B, MAX_LENGTH)

    def length_targets(self, tgt_tokens):
        return jnp.clip(
            jnp.sum(tgt_tokens != self.pad, axis=1), 0, MAX_LENGTH - 1
        )

    # -- training forward --------------------------------------------------------

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        enc_params, dec_params = self._split_params(variables["params"])
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        length_out = self.forward_length(variables, enc)
        word_ins_out, extra = self.decoder(
            dec_params,
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
            causal=False,
        )
        extra["encoder_out"] = enc
        extra["length_out"] = length_out
        extra["length_tgt"] = self.length_targets(batch["target"])
        extra["word_ins_mask"] = batch["prev_output_tokens"] == self.unk
        return (word_ins_out, extra), {}

    # -- mask-predict decoding -----------------------------------------------------

    def initialize_output_tokens(self, variables, encoder_out: EncoderOut,
                                 max_len: int):
        """Predict lengths and build initial [bos, unk*L, eos] rows."""
        length_logits = self.forward_length(variables, encoder_out)
        length_tgt = jnp.argmax(length_logits, axis=-1)
        length_tgt = jnp.clip(length_tgt, 2, max_len - 1)
        b = length_logits.shape[0]
        pos = jnp.arange(max_len)[None, :]
        tokens = jnp.where(pos < length_tgt[:, None], self.unk, self.pad)
        tokens = tokens.at[:, 0].set(self.bos)
        tokens = jnp.where(pos == (length_tgt - 1)[:, None], self.eos, tokens)
        scores = jnp.zeros((b, max_len), jnp.float32)
        return tokens.astype(jnp.int32), scores

    def forward_decoder_step(self, variables, output_tokens, output_scores,
                             encoder_out: EncoderOut):
        """One mask-predict pass: fill unk positions with argmax predictions."""
        _, dec_params = self._split_params(variables["params"])
        logits, _ = self.decoder(
            dec_params,
            output_tokens,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            causal=False,
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        scores = jnp.max(lprobs, axis=-1)
        tokens = jnp.argmax(lprobs, axis=-1).astype(jnp.int32)
        masks = output_tokens == self.unk
        new_tokens = jnp.where(masks, tokens, output_tokens)
        new_scores = jnp.where(masks, scores, output_scores)
        return new_tokens, new_scores


@register_model_architecture("cmlm_transformer", "cmlm_transformer")
def cmlm_base_architecture(args):
    args.encoder_normalize_before = getattr(args, "encoder_normalize_before", False)
    args.decoder_normalize_before = getattr(args, "decoder_normalize_before", False)
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", True
    )
    transformer_base(args)


@register_model_architecture("cmlm_transformer", "cmlm_transformer_wmt_en_de")
def cmlm_wmt_en_de(args):
    cmlm_base_architecture(args)
