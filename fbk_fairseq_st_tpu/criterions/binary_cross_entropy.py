"""Binary cross entropy / InfoNCE for wav2vec CPC training.

Counterpart of fairseq/criterions/binary_cross_entropy.py:20-142. Works on
the model's dense masked logits layout (steps, copies, B, T) instead of the
reference's packed flat buffer: invalid (beyond-horizon) positions carry a
validity mask and are zeroed out of the loss."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion


@register_criterion("binary_cross_entropy")
class BinaryCrossEntropyCriterion(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.infonce = getattr(args, "infonce", False)
        lw = getattr(args, "loss_weights", None)
        self.loss_weights = None if lw is None else (
            lw if isinstance(lw, (list, tuple)) else eval(lw)  # noqa: S307
        )
        lk = getattr(args, "log_keys", None)
        self.log_keys = [] if lk is None else (
            lk if isinstance(lk, (list, tuple)) else eval(lk)  # noqa: S307
        )

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--infonce", action="store_true",
                            help="use InfoNCE (CE over negatives) instead "
                                 "of binary cross entropy")
        parser.add_argument("--loss-weights", type=str, default=None,
                            help="weights for additional loss terms")
        # reference binary_cross_entropy.py:32-33
        parser.add_argument("--log-keys", type=str, default=None,
                            help="output keys to log (python list literal, "
                                 "e.g. \"['prob_perplexity']\")")

    def __call__(self, model, variables, batch, rng=None, training=False):
        (logits, extra), new_state = model.forward(
            variables, batch, rng, training
        )
        logits = extra["cpc_logits"].astype(jnp.float32)  # (S, N, B, T)
        targets = extra["cpc_targets"]
        weights = extra.get("cpc_weights")
        valid = extra["cpc_valid"].astype(jnp.float32)

        if self.infonce:
            # CE over the copies axis; positive = index 0
            lprobs = jax.nn.log_softmax(logits, axis=1)
            per = -lprobs[:, 0]  # (S, B, T)
            vmask = valid[:, 0]
            loss = jnp.sum(per * vmask)
            sample_size = jnp.sum(vmask)
            corr = jnp.sum(
                (jnp.argmax(logits, axis=1) == 0).astype(jnp.float32) * vmask
            )
        else:
            per = (
                jnp.maximum(logits, 0.0)
                - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            if weights is not None:
                per = per * weights
            loss = jnp.sum(per * valid)
            sample_size = jnp.sum(targets * valid)
            corr = jnp.sum(
                ((logits > 0) == (targets > 0.5)).astype(jnp.float32) * valid
            )

        if self.loss_weights is not None:
            extra_losses = []
            if "prob_perplexity" in extra:
                extra_losses.append(
                    extra["num_vars"] - extra["prob_perplexity"]
                )
            if "kmeans_loss" in extra:
                extra_losses.append(extra["kmeans_loss"])
            lws = self.loss_weights
            if len(lws) == 1 and len(extra_losses) != 1:
                lws = lws * len(extra_losses)
            for p, coef in zip(extra_losses, lws):
                if coef != 0 and p is not None:
                    loss = loss + coef * p * sample_size

        logging_output = {
            "loss": loss,
            "ntokens": sample_size,
            "nsentences": jnp.asarray(logits.shape[2]),
            "sample_size": sample_size,
            "correct": corr,
            "count": jnp.sum(valid if not self.infonce else valid[:, 0]),
        }
        # --log-keys: surface scalar model outputs (codebook perplexities,
        # temperatures, ...) in the training log (reference
        # binary_cross_entropy.py:83-85)
        for lk in self.log_keys:
            if lk in extra:
                logging_output[lk] = jnp.asarray(extra[lk], jnp.float32)
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss",
            loss_sum / max(sample_size, 1) / math.log(2),
            sample_size, round=3,
        )
        correct = sum(log.get("correct", 0) for log in logging_outputs)
        count = sum(log.get("count", 0) for log in logging_outputs)
        if count > 0:
            metrics.log_scalar("accuracy", correct / count, count, round=4)
