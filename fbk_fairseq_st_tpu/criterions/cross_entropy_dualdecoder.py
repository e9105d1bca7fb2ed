"""cross_entropy_dualdecoder: weighted label-smoothed CE on both decoders.

Counterpart of examples/speech_recognition/criterions/
cross_entropy_dualdecoder.py:9-97: loss = primary_weight * LS-CE(target) +
auxiliary_weight * LS-CE(transcript), logged separately with both ppls.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity
from .label_smoothed_cross_entropy import label_smoothed_nll_loss


@register_criterion("cross_entropy_dualdecoder")
class CrossEntropyDualDecoder(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.eps = getattr(args, "label_smoothing", 0.0)
        self.primary_loss_weight = getattr(args, "primary_loss_weight", 0.5)
        self.auxiliary_loss_weight = getattr(args, "auxiliary_loss_weight", 0.5)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--primary-loss-weight", default=0.5, type=float, metavar="W",
            help="The weight to apply to the primary loss function when summing losses",
        )
        parser.add_argument(
            "--auxiliary-loss-weight", default=0.5, type=float, metavar="W",
            help="The weight to apply to the auxiliary loss function when summing losses",
        )
        parser.add_argument(
            "--label-smoothing", default=0.0, type=float, metavar="D",
            help="epsilon for label smoothing, 0 means no label smoothing",
        )

    def compute_loss(self, model, net_output, batch):
        loss, logging = self._losses(model, net_output, batch)
        return loss, logging["primary_nll_loss"]

    def _losses(self, model, net_output, batch):
        decoder_out, aux_out = net_output
        lprobs = model.get_normalized_probs(decoder_out, log_probs=True)
        lprobs = lprobs.reshape(-1, lprobs.shape[-1])
        target = batch["target"].reshape(-1)
        primary_loss, primary_nll = label_smoothed_nll_loss(
            lprobs, target, self.eps, ignore_index=self.padding_idx
        )
        aux_lprobs = model.get_normalized_probs(aux_out, log_probs=True)
        aux_lprobs = aux_lprobs.reshape(-1, aux_lprobs.shape[-1])
        aux_target = model.get_auxiliary_target(batch, aux_out).reshape(-1)
        aux_loss, aux_nll = label_smoothed_nll_loss(
            aux_lprobs, aux_target, self.eps, ignore_index=self.padding_idx
        )
        loss = (
            self.primary_loss_weight * primary_loss
            + self.auxiliary_loss_weight * aux_loss
        )
        return loss, {
            "primary_loss": primary_loss,
            "primary_nll_loss": primary_nll,
            "auxiliary_loss": aux_loss,
            "auxiliary_nll_loss": aux_nll,
        }

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        loss, parts = self._losses(model, net_output, batch)
        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
        sample_size = jnp.asarray(nsentences) if self.sentence_avg else ntokens
        logging_output = {
            "loss": loss,
            **parts,
            "ntokens": ntokens,
            "auxiliary_ntokens": jnp.sum(model.get_auxiliary_token_lens(batch)),
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        primary_loss_sum = sum(log.get("primary_loss", 0) for log in logging_outputs)
        auxiliary_loss_sum = sum(log.get("auxiliary_loss", 0) for log in logging_outputs)
        primary_nll = sum(log.get("primary_nll_loss", 0) for log in logging_outputs)
        auxiliary_nll = sum(log.get("auxiliary_nll_loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        auxiliary_ntokens = sum(log.get("auxiliary_ntokens", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "primary_loss", primary_loss_sum / sample_size / math.log(2),
            sample_size, round=3,
        )
        metrics.log_scalar(
            "auxiliary_loss", auxiliary_loss_sum / sample_size / math.log(2),
            sample_size, round=3,
        )
        metrics.log_scalar(
            "primary_nll_loss", primary_nll / ntokens / math.log(2), ntokens, round=3
        )
        if auxiliary_ntokens > 0:
            metrics.log_scalar(
                "auxiliary_nll_loss",
                auxiliary_nll / auxiliary_ntokens / math.log(2),
                auxiliary_ntokens, round=3,
            )
        metrics.log_derived(
            "primary_ppl",
            lambda meters: get_perplexity(meters["primary_nll_loss"].avg),
        )
        metrics.log_derived(
            "auxiliary_ppl",
            lambda meters: get_perplexity(meters["auxiliary_nll_loss"].avg),
        )
