"""Sentence ranking loss: CE over per-option ranking-head scores.

Counterpart of fairseq/criterions/sentence_ranking.py:15-120 (the
--save-predictions stream is written at reduce time from host-side
logging rather than inside the loss)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion


@register_criterion("sentence_ranking")
class SentenceRankingCriterion(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.ranking_head_name = getattr(
            args, "ranking_head_name", "sentence_classification_head"
        )
        self.num_classes = args.num_classes

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--save-predictions", metavar="FILE",
                            help="file to save predictions to")
        parser.add_argument("--ranking-head-name",
                            default="sentence_classification_head",
                            help="name of the ranking head to use")

    def __call__(self, model, variables, batch, rng=None, training=False):
        scores = []
        new_state = None
        for idx in range(self.num_classes):
            (score, _), new_state = model.forward(
                variables, batch[f"net_input{idx + 1}"], rng, training,
                classification_head_name=self.ranking_head_name,
            )
            scores.append(score)
        logits = jnp.concatenate(scores, axis=1).astype(jnp.float32)

        targets = batch.get("target")
        if targets is not None:
            valid = targets >= 0
            lprobs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                lprobs, jnp.where(valid, targets, 0)[:, None], axis=1
            )[:, 0]
            loss = jnp.sum(nll * valid.astype(nll.dtype))
            sample_size = jnp.sum(valid)
            ncorrect = jnp.sum((jnp.argmax(logits, axis=1) == targets) & valid)
        else:
            loss = jnp.asarray(0.0)
            sample_size = jnp.asarray(logits.shape[0])
            ncorrect = None

        logging_output = {
            "loss": loss,
            "ntokens": jnp.asarray(batch.get("ntokens", 0)),
            "nsentences": sample_size,
            "sample_size": sample_size,
        }
        if ncorrect is not None:
            logging_output["ncorrect"] = ncorrect
        return loss, sample_size, logging_output, new_state or {}

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        nsentences = sum(log.get("nsentences", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / max(sample_size, 1) / math.log(2),
            sample_size, round=3,
        )
        if len(logging_outputs) > 0 and "ncorrect" in logging_outputs[0]:
            ncorrect = sum(log.get("ncorrect", 0) for log in logging_outputs)
            metrics.log_scalar(
                "accuracy", 100.0 * ncorrect / max(nsentences, 1),
                nsentences, round=1,
            )
