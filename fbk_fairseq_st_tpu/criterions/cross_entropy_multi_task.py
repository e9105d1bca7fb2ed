"""cross_entropy_multi_task: LS-CE + weighted NLL on the classifier head.

Counterpart of examples/speech_recognition/criterions/
cross_entropy_multi_task.py:12-100 (incl. optional per-class weights for
unbalanced classes).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity
from .label_smoothed_cross_entropy import label_smoothed_nll_loss


@register_criterion("cross_entropy_multi_task")
class CrossEntropyMultitask(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.eps = getattr(args, "label_smoothing", 0.0)
        self.auxiliary_loss_weight = getattr(args, "auxiliary_loss_weight", 1.0)
        w = getattr(args, "auxiliary_loss_class_weights", None)
        self.auxiliary_loss_class_weights = (
            jnp.asarray(w, jnp.float32) if w is not None else None
        )

    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--auxiliary-loss-weight", default=1.0, type=float, metavar="W",
            help="The weight to apply to the auxiliary loss function when summing losses",
        )
        parser.add_argument(
            "--auxiliary-loss-class-weights", default=None, type=float,
            nargs="+", metavar="Ws",
            help="Individual class weights for balancing uneven classes",
        )
        parser.add_argument(
            "--label-smoothing", default=0.0, type=float, metavar="D",
            help="epsilon for label smoothing, 0 means no label smoothing",
        )

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        decoder_out, aux_logits = net_output
        lprobs = model.get_normalized_probs(decoder_out, log_probs=True)
        lprobs = lprobs.reshape(-1, lprobs.shape[-1])
        target = batch["target"].reshape(-1)
        loss, nll_loss = label_smoothed_nll_loss(
            lprobs, target, self.eps, ignore_index=self.padding_idx
        )

        aux_lprobs = model.auxiliary_decoder.get_normalized_probs(
            aux_logits, log_probs=True
        )
        aux_target = batch["auxiliary_target"].reshape(-1)
        per = -jnp.take_along_axis(aux_lprobs, aux_target[:, None], axis=-1)[:, 0]
        if self.auxiliary_loss_class_weights is not None:
            per = per * self.auxiliary_loss_class_weights[aux_target]
        auxiliary_loss = jnp.sum(per)
        loss = loss + self.auxiliary_loss_weight * auxiliary_loss

        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
        sample_size = jnp.asarray(nsentences) if self.sentence_avg else ntokens
        logging_output = {
            "loss": loss,
            "nll_loss": nll_loss,
            "auxiliary_loss": auxiliary_loss,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        auxiliary_loss_sum = sum(
            log.get("auxiliary_loss", 0) for log in logging_outputs
        )
        nll_loss_sum = sum(log.get("nll_loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        nsentences = sum(log.get("nsentences", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "nll_loss", nll_loss_sum / ntokens / math.log(2), ntokens, round=3
        )
        if nsentences > 0:
            metrics.log_scalar(
                "auxiliary_loss",
                auxiliary_loss_sum / nsentences / math.log(2),
                nsentences, round=3,
            )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
        )
