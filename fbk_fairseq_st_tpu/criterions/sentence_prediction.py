"""Sentence prediction loss (classification CE / regression MSE).

Counterpart of fairseq/criterions/sentence_prediction.py:15-95, including
the accuracy logging for classification. Padding rows of fixed-shape
batches carry target -1 (classification) and are masked out."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..parallel.vocab_parallel import vocab_parallel_cross_entropy
from ..registry import register_criterion
from .base import Criterion


@register_criterion("sentence_prediction")
class SentencePredictionCriterion(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.classification_head_name = getattr(
            args, "classification_head_name", "sentence_classification_head"
        )
        self.regression_target = getattr(args, "regression_target", False)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--classification-head-name",
            default="sentence_classification_head",
            help="name of the classification head to use",
        )

    def __call__(self, model, variables, batch, rng=None, training=False):
        (logits, _), new_state = model.forward(
            variables, batch, rng, training,
            classification_head_name=self.classification_head_name,
        )
        targets = batch["target"]
        if not self.regression_target:
            valid = targets >= 0  # fixed-shape padding rows are -1
            per_row = vocab_parallel_cross_entropy(
                logits, jnp.where(valid, targets, 0)
            )
            loss = jnp.sum(per_row * valid.astype(per_row.dtype))
            sample_size = jnp.sum(valid)
            preds = jnp.argmax(logits, axis=-1)
            ncorrect = jnp.sum((preds == targets) & valid)
        else:
            diff = logits.astype(jnp.float32) - targets.astype(jnp.float32)
            valid = jnp.any(targets != 0, axis=-1) | True  # all rows count
            loss = jnp.sum(diff ** 2)
            sample_size = jnp.asarray(targets.shape[0])
            ncorrect = None

        logging_output = {
            "loss": loss,
            "ntokens": jnp.sum(batch["src_tokens"] != self.padding_idx),
            "nsentences": sample_size,
            "sample_size": sample_size,
        }
        if ncorrect is not None:
            logging_output["ncorrect"] = ncorrect
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        nsentences = sum(log.get("nsentences", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        if sample_size != ntokens:
            metrics.log_scalar(
                "nll_loss", loss_sum / ntokens / math.log(2), ntokens, round=3
            )
        if len(logging_outputs) > 0 and "ncorrect" in logging_outputs[0]:
            ncorrect = sum(log.get("ncorrect", 0) for log in logging_outputs)
            metrics.log_scalar(
                "accuracy", 100.0 * ncorrect / nsentences, nsentences, round=1
            )
