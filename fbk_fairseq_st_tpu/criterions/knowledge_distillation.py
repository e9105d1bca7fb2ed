"""knowledge_distillation criterion (CliC-IT 2020).

Counterpart of fairseq/criterions/knowledge_distillation.py:17-110:
``loss = (1-lambda) * NLL(truth) + lambda * CE(student || teacher top-k)``
with temperature scaling of both student logits and teacher logits; teacher
distributions come from the batch's top-k (idxs, logits).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity


@register_criterion("knowledge_distillation")
class CrossEntropyKnowledgeDistillationCriterion(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self._lambda = getattr(args, "kd_lambda", 0.0)
        self.temperature = getattr(args, "kd_temperature", 1.0)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--kd-lambda", default=0.0, type=float, metavar="D",
            help="Value for lambda in Knowledge Distillation (ie. the weight "
            "of teacher output vs ground truth)",
        )
        parser.add_argument(
            "--kd-temperature", default=1.0, type=float, metavar="D",
            help="Temperature to be used. Temperature is used to soften the "
            "nets output in order to increase the dark knowledge effect.",
        )

    def compute_loss(self, model, net_output, batch):
        logits = net_output[0] if isinstance(net_output, tuple) else net_output
        target = batch["target"].reshape(-1)
        mask = (target != self.padding_idx).astype(jnp.float32)

        teacher_loss = 0.0
        if self._lambda > 0.0:
            lprobs_t = jax.nn.log_softmax(
                (logits / self.temperature).astype(jnp.float32), axis=-1
            )
            v = lprobs_t.shape[-1]
            lprobs_t = lprobs_t.reshape(-1, v)
            teacher_idxs = batch["teacher_idxs"].reshape(-1, batch["teacher_idxs"].shape[-1])
            teacher_logits = batch["teacher_probs"].reshape(
                -1, batch["teacher_probs"].shape[-1]
            )
            teacher_probs = jax.nn.softmax(
                teacher_logits.astype(jnp.float32) / self.temperature, axis=-1
            )
            sel = jnp.take_along_axis(lprobs_t, teacher_idxs, axis=-1)
            teacher_loss = -(sel * teacher_probs).sum(axis=-1) * mask

        truth_loss = 0.0
        if self._lambda < 1.0:
            lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lprobs = lprobs.reshape(-1, lprobs.shape[-1])
            nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
            truth_loss = nll * mask

        loss = jnp.sum(
            (1.0 - self._lambda) * truth_loss + self._lambda * teacher_loss
        )
        nll_for_log = jnp.sum(truth_loss) if self._lambda < 1.0 else loss
        return loss, nll_for_log

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        loss, nll = self.compute_loss(model, net_output, batch)
        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
        sample_size = jnp.asarray(nsentences) if self.sentence_avg else ntokens
        logging_output = {
            "loss": loss,
            "nll_loss": nll,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        nll_sum = sum(log.get("nll_loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "nll_loss", nll_sum / ntokens / math.log(2), ntokens, round=3
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
        )
