"""Ensembled Levenshtein decoding.

Counterpart of fairseq/models/nat/nonautoregressive_ensembles.py
(EnsembleLevT): at each refinement step the deletion / placeholder-insertion
/ word-filling log-probabilities are averaged across models before the
argmax edits are applied. Plugged in by the iterative refinement generator
when several Levenshtein models are loaded."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ..models.base import EncoderOut
from ..models.nat import apply_del_words, apply_ins_masks, apply_ins_words


class EnsembleLevT:
    """Presents the (encode / initialize_output_tokens / refinement_step)
    interface over a list of (LevenshteinTransformerModel, variables)."""

    def __init__(self, models: List):
        self.models = models
        model0 = models[0][0]
        self.pad = model0.pad
        self.bos = model0.bos
        self.eos = model0.eos
        self.unk = model0.unk
        self.max_target_positions = min(
            m.max_target_positions for m, _ in models
        )

    def encode(self, variables_unused, src_tokens, src_lengths, **kwargs):
        outs = []
        for model, variables in self.models:
            enc, _ = model.encode(variables, src_tokens, src_lengths)
            outs.append(enc)
        return outs, {}

    def initialize_output_tokens(self, variables_unused, encoder_outs,
                                 max_len: int):
        model, variables = self.models[0]
        return model.initialize_output_tokens(
            variables, encoder_outs[0], max_len
        )

    def _avg(self, fn_name: str, tokens, encoder_outs):
        lps = []
        for (model, variables), enc in zip(self.models, encoder_outs):
            logits = getattr(model, fn_name)(variables["params"], tokens, enc)
            lps.append(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
        return jax.scipy.special.logsumexp(
            jnp.stack(lps), axis=0
        ) - jnp.log(len(lps))

    def refinement_step(self, variables_unused, output_tokens, output_scores,
                        encoder_outs, eos_penalty: float = 0.0,
                        max_ratio: Optional[float] = None):
        L = output_tokens.shape[1]
        if max_ratio is None:
            max_lens = jnp.full(output_tokens.shape[:1], L - 1, jnp.int32)
        else:
            src_lens = jnp.sum(
                ~encoder_outs[0].encoder_padding_mask, axis=1
            ).astype(jnp.float32)
            max_lens = jnp.clip(
                (src_lens * max_ratio).astype(jnp.int32), 10, L - 1
            )

        # 1) delete
        can_del = jnp.sum(output_tokens != self.pad, axis=1) > 2
        del_lp = self._avg("forward_word_del", output_tokens, encoder_outs)
        del_pred = (jnp.argmax(del_lp, -1) == 1) & can_del[:, None]
        output_tokens, output_scores = apply_del_words(
            output_tokens, output_scores, del_pred,
            self.pad, self.bos, self.eos,
        )

        # 2) insert placeholders
        can_ins = jnp.sum(output_tokens != self.pad, axis=1) < max_lens
        ins_lp = self._avg("forward_mask_ins", output_tokens, encoder_outs)
        if eos_penalty > 0.0:
            ins_lp = ins_lp.at[:, :, 0].add(-eos_penalty)
        ins_pred = jnp.minimum(
            jnp.argmax(ins_lp, -1).astype(jnp.int32), max_lens[:, None]
        )
        ins_pred = jnp.where(can_ins[:, None], ins_pred, 0)
        output_tokens, output_scores = apply_ins_masks(
            output_tokens, output_scores, ins_pred,
            self.pad, self.unk, self.eos,
        )

        # 3) fill words
        word_lp = self._avg("forward_word_ins", output_tokens, encoder_outs)
        word_scores = jnp.max(word_lp, -1)
        word_pred = jnp.argmax(word_lp, -1).astype(jnp.int32)
        output_tokens, output_scores = apply_ins_words(
            output_tokens, output_scores, word_pred, word_scores, self.unk
        )
        return output_tokens, output_scores
