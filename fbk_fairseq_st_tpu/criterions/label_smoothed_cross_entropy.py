"""(Label-smoothed) cross-entropy criterions.

Math identical to the reference (fairseq/criterions/
label_smoothed_cross_entropy.py:12-30): per-token
``nll = -lprob[target]``, ``smooth = -sum(lprobs)``, pads zeroed,
``loss = (1-eps)*sum(nll) + (eps/V)*sum(smooth)``; sample_size = ntokens
(or nsentences with --sentence-avg).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity


def label_smoothed_nll_loss(lprobs, target, epsilon: float, ignore_index=None):
    """lprobs: (N, V) log-probs; target: (N,) int. Returns summed (loss, nll)."""
    nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    if ignore_index is not None:
        keep = (target != ignore_index).astype(lprobs.dtype)
        nll = nll * keep
        smooth = smooth * keep
    nll_sum = jnp.sum(nll)
    smooth_sum = jnp.sum(smooth)
    eps_i = epsilon / lprobs.shape[-1]
    return (1.0 - epsilon) * nll_sum + eps_i * smooth_sum, nll_sum


def label_smoothed_nll_from_logits(logits, target, epsilon: float,
                                   ignore_index=None):
    """Same math as :func:`label_smoothed_nll_loss`, computed from raw
    logits with per-row REDUCTIONS only:

        nll_i    = lse_i - logit_i[target_i]
        smooth_i = V * lse_i - sum_v logit_i[v]

    The log_softmax formulation materializes an fp32 (B, T, V) tensor (plus
    a layout copy XLA inserts behind it — 0.9 ms/step of the big bench
    config, PERF.md); here the fp32 conversion fuses into the logsumexp /
    sum reductions and only (B, T) rows ever hit HBM. Keeps the (B, T, V)
    shape — reshaping to (N, V) is what forced the layout copy."""
    v = logits.shape[-1]
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    tgt_logit = jnp.take_along_axis(lf, target[..., None], axis=-1)[..., 0]
    sum_logits = jnp.sum(lf, axis=-1)
    nll = lse - tgt_logit
    smooth = v * lse - sum_logits
    if ignore_index is not None:
        keep = (target != ignore_index).astype(nll.dtype)
        nll = nll * keep
        smooth = smooth * keep
    nll_sum = jnp.sum(nll)
    return (
        (1.0 - epsilon) * nll_sum + (epsilon / v) * jnp.sum(smooth),
        nll_sum,
    )


@register_criterion("label_smoothed_cross_entropy")
class LabelSmoothedCrossEntropyCriterion(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.eps = getattr(args, "label_smoothing", 0.0)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--label-smoothing", default=0.0, type=float, metavar="D",
            help="epsilon for label smoothing, 0 means no label smoothing",
        )

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
        return loss, sample_size, logging_output, new_state

    def compute_loss(self, model, net_output, batch):
        from ..models.base import Model

        if type(model).get_normalized_probs is Model.get_normalized_probs:
            # standard softmax-over-logits models: reduction-only fast path
            logits = (
                net_output[0] if isinstance(net_output, tuple) else net_output
            )
            return label_smoothed_nll_from_logits(
                logits, batch["target"], self.eps,
                ignore_index=self.padding_idx,
            )
        # models with custom probability heads (adaptive softmax etc.)
        lprobs = model.get_normalized_probs(net_output, log_probs=True)
        lprobs = lprobs.reshape(-1, lprobs.shape[-1])
        target = batch["target"].reshape(-1)
        return label_smoothed_nll_loss(
            lprobs, target, self.eps, ignore_index=self.padding_idx
        )

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        nll_loss_sum = sum(log.get("nll_loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "nll_loss", nll_loss_sum / ntokens / math.log(2), ntokens, round=3
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
        )


@register_criterion("cross_entropy")
class CrossEntropyCriterion(Criterion):
    """Plain NLL (fairseq/criterions/cross_entropy.py)."""

    def compute_loss(self, model, net_output, batch):
        lprobs = model.get_normalized_probs(net_output, log_probs=True)
        lprobs = lprobs.reshape(-1, lprobs.shape[-1])
        target = batch["target"].reshape(-1)
        nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
        nll = nll * (target != self.padding_idx)
        loss = jnp.sum(nll)
        return loss, loss

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        loss, _ = self.compute_loss(model, net_output, batch)
        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
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
