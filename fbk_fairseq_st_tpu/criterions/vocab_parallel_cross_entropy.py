"""Vocab-parallel cross entropy criterion for tensor-parallel training.

Counterpart of the reference VocabParallelCrossEntropyCriterion
(fairseq/model_parallel/criterions/vocab_parallel_cross_entropy.py:18-75,
which requires the external Megatron submodule). Here the loss works on raw
logits through :func:`..parallel.vocab_parallel.vocab_parallel_cross_entropy`
— under a TP mesh GSPMD lowers it to the Megatron local-reduce + all-reduce
pattern; on a single chip it is plain CE. Same sample_size/logging semantics
as the reference (:42-51)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..parallel.vocab_parallel import vocab_parallel_cross_entropy
from ..registry import register_criterion
from .base import Criterion, get_perplexity


@register_criterion("vocab_parallel_cross_entropy")
class VocabParallelCrossEntropyCriterion(Criterion):
    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        logits = net_output[0]
        target = batch["target"]
        per_tok = vocab_parallel_cross_entropy(logits, target)
        keep = (target != self.padding_idx).astype(per_tok.dtype)
        loss = jnp.sum(per_tok * keep)
        ntokens = jnp.sum(target != self.padding_idx)
        nsentences = target.shape[0]
        sample_size = jnp.asarray(nsentences) if self.sentence_avg else ntokens
        logging_output = {
            "loss": loss,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        if sample_size != ntokens:
            metrics.log_scalar(
                "nll_loss", loss_sum / ntokens / math.log(2), ntokens, round=3
            )
            metrics.log_derived(
                "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
            )
        else:
            metrics.log_derived(
                "ppl", lambda meters: get_perplexity(meters["loss"].avg)
            )
