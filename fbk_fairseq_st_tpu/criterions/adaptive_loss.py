"""Adaptive-softmax loss.

Counterpart of fairseq/criterions/adaptive_loss.py:16-99. The reference sums
per-cluster CE over gathered subsets; the TPU adaptive softmax already
composes exact full-vocabulary log probabilities (head + low-rank tails), so
the loss is one masked NLL over them — identical value, one static shape."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity


@register_criterion("adaptive_loss")
class AdaptiveLoss(Criterion):
    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        lprobs = net_output[0].astype(jnp.float32)  # already log-probs
        target = batch["target"]
        nll = -jnp.take_along_axis(
            lprobs, target[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        keep = (target != self.padding_idx).astype(nll.dtype)
        loss = jnp.sum(nll * keep)
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
