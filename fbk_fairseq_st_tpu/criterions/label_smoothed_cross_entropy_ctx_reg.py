"""label_smoothed_cross_entropy_ctxreg: LS-CE + alpha * sum(context gates).

Counterpart of examples/speech_recognition/criterions/
label_smoothed_cross_entropy_ctx_reg.py:33-100: penalizes the decoder's
parallel-attention context gates so the model ignores context unless useful
(ACL Findings 2021 segmentation robustness work).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import register_criterion
from .label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    label_smoothed_nll_loss,
)


@register_criterion("label_smoothed_cross_entropy_ctxreg")
class LabelSmoothedCrossEntropyCtxRegCriterion(LabelSmoothedCrossEntropyCriterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.alpha = getattr(args, "ctx_reg_alpha", 0.0)

    @classmethod
    def add_args(cls, parser):
        LabelSmoothedCrossEntropyCriterion.add_args(parser)
        parser.add_argument(
            "--ctx-reg-alpha", default=0.0, type=float, metavar="D",
            help="weight of the context-gate regularization penalty",
        )

    def compute_loss(self, model, net_output, batch):
        lprobs = model.get_normalized_probs(net_output, log_probs=True)
        lprobs = lprobs.reshape(-1, lprobs.shape[-1])
        target = batch["target"].reshape(-1)
        loss, nll_loss = label_smoothed_nll_loss(
            lprobs, target, self.eps, ignore_index=self.padding_idx
        )
        extra = net_output[1] if isinstance(net_output, tuple) else {}
        ctx_gates = extra.get("ctx_gates") or []
        if ctx_gates and self.alpha != 0.0:
            penalty = self.alpha * sum(jnp.sum(g) for g in ctx_gates)
            loss = loss + penalty
        return loss, nll_loss
