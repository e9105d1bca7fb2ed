"""Criterion ABC.

Counterpart of the reference FairseqCriterion (fairseq/criterions/
fairseq_criterion.py): ``forward(model, sample) -> (loss, sample_size,
logging_output)``. Here the call is pure and jit-traceable:

    loss, sample_size, logging_output, new_model_state =
        criterion(model, variables, batch, rng=..., training=...)

``loss`` is an un-normalized scalar sum (the pjit train step psums loss and
sample_size across the data axis and divides — exactly the reference
Trainer's world-size/global-sample_size grad normalization,
trainer.py:423-433). ``logging_output`` is a flat dict of scalar jnp values;
all criterions here are summable across workers
(logging_outputs_can_be_summed in the reference), so metrics reduction is a
single tree-psum.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax.numpy as jnp


class Criterion:
    def __init__(self, task, args):
        self.task = task
        self.args = args
        tgt = getattr(task, "target_dictionary", None)
        self.padding_idx = tgt.pad() if tgt is not None else -100
        self.sentence_avg = getattr(args, "sentence_avg", False)

    @classmethod
    def add_args(cls, parser) -> None:
        pass

    @classmethod
    def build_criterion(cls, args, task) -> "Criterion":
        return cls(task, args)

    def __call__(
        self, model, variables, batch, rng=None, training: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Any], Any]:
        raise NotImplementedError

    @staticmethod
    def reduce_metrics(logging_outputs, metrics) -> None:
        """Aggregate logging outputs (host-side, values already summed)."""
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        if sample_size > 0:
            metrics.log_scalar(
                "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
            )

    @staticmethod
    def logging_outputs_can_be_summed() -> bool:
        return True


def get_perplexity(loss_base2) -> float:
    if loss_base2 is None:
        return 0.0
    try:
        return float(round(2 ** loss_base2, 2))
    except OverflowError:
        return float("inf")
