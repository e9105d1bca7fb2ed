"""Criterion registry package."""

from .base import Criterion  # noqa: F401
from . import (  # noqa: F401
    adaptive_loss,
    binary_cross_entropy,
    composite_loss,
    cross_entropy_dualdecoder,
    cross_entropy_acc,
    cross_entropy_multi_task,
    asg,
    ctc,
    knowledge_distillation,
    latency_augmented,
    label_smoothed_cross_entropy,
    legacy_masked_lm,
    label_smoothed_cross_entropy_with_alignment,
    masked_lm,
    nat_loss,
    label_smoothed_cross_entropy_ctx_reg,
    sentence_prediction,
    sentence_ranking,
    vocab_parallel_cross_entropy,
    wsc,
)
