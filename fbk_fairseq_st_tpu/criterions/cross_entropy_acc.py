"""cross_entropy_acc: CE with frame-accuracy logging (upstream ASR;
reference examples/speech_recognition/criterions/cross_entropy_acc.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion


@register_criterion("cross_entropy_acc")
class CrossEntropyWithAccCriterion(Criterion):
    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        logits = net_output[0] if isinstance(net_output, tuple) else net_output
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lprobs = lprobs.reshape(-1, lprobs.shape[-1])
        target = batch["target"].reshape(-1)
        mask = target != self.padding_idx
        nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
        loss = jnp.sum(nll * mask)
        preds = jnp.argmax(lprobs, axis=-1)
        correct = jnp.sum((preds == target) & mask)
        total = jnp.sum(mask)
        ntokens = total
        nsentences = batch["target"].shape[0]
        sample_size = jnp.asarray(nsentences) if self.sentence_avg else ntokens
        logging_output = {
            "loss": loss,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
            "correct": correct,
            "total": total,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        correct = sum(log.get("correct", 0) for log in logging_outputs)
        total = sum(log.get("total", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        if total > 0:
            metrics.log_scalar("accuracy", 100.0 * correct / total, total, round=3)
