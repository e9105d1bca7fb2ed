"""Label-smoothed CE + supervised attention alignment loss.

Counterpart of fairseq/criterions/
label_smoothed_cross_entropy_with_alignment.py:14-98. The reference indexes
the flattened attention with a variable-length alignment list; here the
collater pre-builds a dense (B, T_tgt, T_src) weight grid (1/freq per
target position) and the loss is ``-sum(W * log(attn))`` — identical math,
fixed shapes."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..registry import register_criterion
from .base import get_perplexity
from .label_smoothed_cross_entropy import LabelSmoothedCrossEntropyCriterion


@register_criterion("label_smoothed_cross_entropy_with_alignment")
class LabelSmoothedCrossEntropyCriterionWithAlignment(
    LabelSmoothedCrossEntropyCriterion
):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.alignment_lambda = getattr(args, "alignment_lambda", 0.05)

    @classmethod
    def add_args(cls, parser):
        LabelSmoothedCrossEntropyCriterion.add_args(parser)
        parser.add_argument("--alignment-lambda", default=0.05, type=float,
                            metavar="D", help="weight for the alignment loss")

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        loss, nll_loss = self.compute_loss(model, net_output, batch)
        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
        sample_size = jnp.asarray(nsentences) if self.sentence_avg else ntokens

        logging_output = {
            "loss": loss,
            "nll_loss": nll_loss,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        attn = net_output[1].get("attn")
        weights = batch.get("align_weights")
        if attn is not None and weights is not None:
            attn = attn.astype(jnp.float32)
            if attn.ndim == 4:  # (B, H, T_tgt, T_src): head average
                attn = attn.mean(axis=1)
            align_loss = -jnp.sum(
                weights * jnp.log(jnp.maximum(attn, 1e-9))
            )
            loss = loss + self.alignment_lambda * align_loss
            logging_output["alignment_loss"] = align_loss
            logging_output["loss"] = loss
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        nll_loss_sum = sum(log.get("nll_loss", 0) for log in logging_outputs)
        align_sum = sum(
            log.get("alignment_loss", 0) for log in logging_outputs
        )
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "nll_loss", nll_loss_sum / ntokens / math.log(2), ntokens, round=3
        )
        metrics.log_scalar(
            "alignment_loss", align_sum / sample_size / math.log(2),
            sample_size, round=3,
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
        )
