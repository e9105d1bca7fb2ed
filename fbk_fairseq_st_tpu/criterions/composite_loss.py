"""Composite loss: average an underlying criterion over a model's multiple
outputs/targets.

Counterpart of fairseq/criterions/composite_loss.py:13-99 (used with
multi-target models such as the vggtransformer encoder-only CTC variants):
``model.forward`` returns a LIST of logits in net_output[0] and the batch
carries a matching list of targets."""

from __future__ import annotations

from ..registry import CRITERIONS, register_criterion
from .base import Criterion


class _SingleOutput:
    """Shim exposing one output of a multi-output model."""

    def __init__(self, model, out, extra):
        self._model = model
        self._out = out
        self._extra = extra

    def forward(self, variables, batch, rng=None, training=False):
        return (self._out, self._extra), {}

    def __getattr__(self, name):
        return getattr(self._model, name)


@register_criterion("composite_loss")
class CompositeLoss(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        under = getattr(args, "underlying_criterion", None)
        assert under, "--underlying-criterion required for composite_loss"
        self.underlying = CRITERIONS[under].build_criterion(args, task)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--underlying-criterion", type=str, metavar="VAL",
                            help="underlying criterion for the composite "
                                 "loss")

    def __call__(self, model, variables, batch, rng=None, training=False):
        (outs, extra), new_state = model.forward(
            variables, batch, rng, training
        )
        targets = batch["target"]
        if not isinstance(outs, (list, tuple)):
            outs, targets = [outs], [targets]
        total_loss, total_ss = 0.0, 0.0
        logging_output = {}
        for o, t in zip(outs, targets):
            shim = _SingleOutput(model, o, extra)
            sub = dict(batch)
            sub["target"] = t
            loss, ss, logging_output, _ = self.underlying(
                shim, variables, sub, rng=rng, training=training
            )
            total_loss = total_loss + loss
            total_ss = total_ss + ss
        n = len(outs)
        total_loss = total_loss / n
        total_ss = total_ss / n
        logging_output["loss"] = total_loss
        return total_loss, total_ss, logging_output, new_state

    def reduce_metrics(self, logging_outputs, metrics):
        self.underlying.reduce_metrics(logging_outputs, metrics)
