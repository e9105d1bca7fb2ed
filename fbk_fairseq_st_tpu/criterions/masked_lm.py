"""Masked LM loss.

Counterpart of fairseq/criterions/masked_lm.py:15-82: CE only at masked
positions (targets are pad everywhere else), sample_size = number of masked
tokens. The reference gathers masked rows before the output projection
(:30-48) to save GPU memory; on TPU that would make the program shape
data-dependent, so logits cover all positions and the loss is masked — same
gradients, one static shape.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..parallel.vocab_parallel import vocab_parallel_cross_entropy
from ..registry import register_criterion
from .base import Criterion, get_perplexity


@register_criterion("masked_lm")
class MaskedLmLoss(Criterion):
    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        logits = net_output[0]
        target = batch["target"]
        masked = target != self.padding_idx

        per_tok = vocab_parallel_cross_entropy(
            logits, jnp.where(masked, target, 0)
        )
        loss = jnp.sum(per_tok * masked.astype(per_tok.dtype))
        sample_size = jnp.sum(masked)
        # device-side counts (host 'ntokens'/'nsentences' metadata are not
        # part of the jitted batch)
        logging_output = {
            "loss": loss,
            "ntokens": jnp.sum(batch["src_tokens"] != self.padding_idx),
            "nsentences": jnp.sum(
                jnp.any(batch["src_tokens"] != self.padding_idx, axis=1)
            ),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["loss"].avg)
        )
