"""Legacy masked LM loss: MLM cross entropy + optional next-sentence
prediction.

Counterpart of fairseq/criterions/legacy_masked_lm.py (masked_lm_loss with
--nsp-loss-weight)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity


@register_criterion("legacy_masked_lm_loss")
class LegacyMaskedLmLoss(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.nsp_loss_weight = getattr(args, "nsp_loss_weight", 1.0)
        self.masked_lm_only = getattr(args, "masked_lm_only", False)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--nsp-loss-weight", default=1.0, type=float,
                            help="weight for next-sentence-prediction loss")
        # reference legacy_masked_lm.py:59-61 (XLM-style training computes
        # only the MLM term even when sentence targets exist in the batch)
        parser.add_argument("--masked-lm-only", default=False,
                            action="store_true",
                            help="compute MLM loss only")

    def __call__(self, model, variables, batch, rng=None, training=False):
        (logits, extra), new_state = model.forward(
            variables, batch, rng, training
        )
        target = batch["target"]
        masked = target != self.padding_idx
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            lprobs, jnp.where(masked, target, 0)[..., None], axis=-1
        )[..., 0]
        lm_loss = jnp.sum(nll * masked.astype(nll.dtype))

        sentence_loss = 0.0
        nsentences = target.shape[0]
        if (
            not self.masked_lm_only
            and batch.get("sentence_target") is not None
            and extra.get("sentence_logits") is not None
        ):
            st = batch["sentence_target"]
            valid = st >= 0
            slp = jax.nn.log_softmax(
                extra["sentence_logits"].astype(jnp.float32), axis=-1
            )
            snll = -jnp.take_along_axis(
                slp, jnp.where(valid, st, 0)[:, None], axis=-1
            )[:, 0]
            sentence_loss = jnp.sum(snll * valid.astype(snll.dtype))

        sample_size = jnp.maximum(jnp.sum(masked), 1)
        loss = lm_loss / sample_size + self.nsp_loss_weight * (
            sentence_loss / nsentences
        )
        logging_output = {
            "loss": loss,
            "lm_loss": lm_loss,
            "sentence_loss": sentence_loss,
            "ntokens": jnp.sum(batch["src_tokens"] != self.padding_idx),
            "nsentences": jnp.asarray(nsentences),
            "sample_size": jnp.asarray(1.0),
        }
        return loss, jnp.asarray(1.0), logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss / max(sample_size, 1) / math.log(2), sample_size,
            round=3,
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["loss"].avg)
        )
