"""Optimizers as optax gradient transformations.

Counterpart of the reference FairseqOptimizer registry (fairseq/optim/*.py).
Each registered optimizer builds an optax transform that maps gradients to
*unsigned, lr-free* parameter deltas; the train step then applies
``params -= lr * delta`` with the lr supplied per step by the host-side LR
scheduler (a traced scalar, so lr changes never retrace).

The reference's FP16Optimizer/MemoryEfficientFP16Optimizer (dynamic loss
scaling, fp32 master params) have no TPU counterpart by design: bf16 shares
fp32's exponent range, so compute runs in bf16 while the optimizer holds
fp32 params — the master-copy layout without loss scaling. The reference's
apex FusedAdam/FusedLAMB fusion is what XLA does to optax update trees
automatically.
"""

from __future__ import annotations

import ast

import optax

from ..registry import register_optimizer


def _parse_betas(s) -> tuple:
    if isinstance(s, (tuple, list)):
        return tuple(s)
    return tuple(ast.literal_eval(s))


class Optimizer:
    @classmethod
    def add_args(cls, parser) -> None:
        pass

    @classmethod
    def build_optimizer(cls, args) -> optax.GradientTransformation:
        raise NotImplementedError


def _with_weight_decay(tx, weight_decay: float):
    """Coupled L2 (grad += wd * param before statistics), matching
    torch.optim's weight_decay used by the reference optimizers."""
    if weight_decay and weight_decay > 0:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("adam")
class Adam(Optimizer):
    """fairseq/optim/adam.py (torch Adam / apex FusedAdam)."""

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--adam-betas", default="(0.9, 0.999)", metavar="B",
                            help="betas for Adam optimizer")
        parser.add_argument("--use-old-adam", action="store_true",
                            default=False,
                            help="parity no-op: the reference uses this to "
                                 "opt out of apex FusedAdam (adam.py:54-58); "
                                 "this build has one XLA adam path")
        parser.add_argument("--adam-eps", type=float, default=1e-8, metavar="D",
                            help="epsilon for Adam optimizer")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float,
                            metavar="WD", help="weight decay")

    @classmethod
    def build_optimizer(cls, args):
        b1, b2 = _parse_betas(getattr(args, "adam_betas", "(0.9, 0.999)"))
        tx = optax.scale_by_adam(
            b1=b1, b2=b2, eps=getattr(args, "adam_eps", 1e-8)
        )
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("adadelta")
class Adadelta(Optimizer):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--adadelta-rho", type=float, default=0.9, metavar="RHO")
        parser.add_argument("--adadelta-eps", type=float, default=1e-6, metavar="EPS")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")
        parser.add_argument("--anneal-eps", action="store_true")

    @classmethod
    def build_optimizer(cls, args):
        tx = optax.scale_by_adadelta(
            rho=getattr(args, "adadelta_rho", 0.9),
            eps=getattr(args, "adadelta_eps", 1e-6),
        )
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("adagrad")
class Adagrad(Optimizer):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")

    @classmethod
    def build_optimizer(cls, args):
        tx = optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10)
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("adamax")
class Adamax(Optimizer):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--adamax-betas", default="(0.9, 0.999)", metavar="B")
        parser.add_argument("--adamax-eps", type=float, default=1e-8, metavar="D")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")
        parser.add_argument("--no-bias-correction", default=False, action="store_true")

    @classmethod
    def build_optimizer(cls, args):
        b1, b2 = _parse_betas(getattr(args, "adamax_betas", "(0.9, 0.999)"))
        tx = optax.scale_by_adamax(
            b1=b1, b2=b2, eps=getattr(args, "adamax_eps", 1e-8)
        )
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("adafactor")
class Adafactor(Optimizer):
    """fairseq/optim/adafactor.py -> optax.adafactor's factored second
    moments; lr is injected per-step so relative-step mode is disabled
    (matching --lr-scheduler-driven usage)."""

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--adafactor-eps", default="(1e-30, 1e-3)", metavar="E")
        parser.add_argument("--clip-threshold", type=float, default=1.0, metavar="C")
        parser.add_argument("--decay-rate", type=float, default=-0.8, metavar="D")
        parser.add_argument("--beta1", type=float, default=None, metavar="B")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")
        parser.add_argument("--scale-parameter", action="store_true")
        parser.add_argument("--relative-step", action="store_true")
        parser.add_argument("--warmup-init", action="store_true")

    @classmethod
    def build_optimizer(cls, args):
        eps = _parse_betas(getattr(args, "adafactor_eps", "(1e-30, 1e-3)"))
        tx = optax.chain(
            optax.scale_by_factored_rms(
                decay_rate=-getattr(args, "decay_rate", -0.8),
                epsilon=eps[0],
            ),
            optax.clip_by_block_rms(getattr(args, "clip_threshold", 1.0)),
        )
        b1 = getattr(args, "beta1", None)
        if b1:
            tx = optax.chain(tx, optax.trace(decay=b1))
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("sgd")
class SGD(Optimizer):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--momentum", default=0.0, type=float, metavar="M")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")

    @classmethod
    def build_optimizer(cls, args):
        m = getattr(args, "momentum", 0.0)
        tx = optax.trace(decay=m) if m else optax.identity()
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("nag")
class NAG(Optimizer):
    """fairseq/optim/nag.py — Nesterov accelerated gradient."""

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--momentum", default=0.99, type=float, metavar="M")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")

    @classmethod
    def build_optimizer(cls, args):
        tx = optax.trace(decay=getattr(args, "momentum", 0.99), nesterov=True)
        return _with_weight_decay(tx, getattr(args, "weight_decay", 0.0))


@register_optimizer("lamb")
class LAMB(Optimizer):
    """fairseq/optim/fused_lamb.py (apex FusedLAMB) -> optax trust-ratio."""

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--lamb-betas", default="(0.9, 0.999)", metavar="B")
        parser.add_argument("--lamb-eps", type=float, default=1e-8, metavar="D")
        parser.add_argument("--weight-decay", "--wd", default=0.0, type=float, metavar="WD")

    @classmethod
    def build_optimizer(cls, args):
        b1, b2 = _parse_betas(getattr(args, "lamb_betas", "(0.9, 0.999)"))
        wd = getattr(args, "weight_decay", 0.0)
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=getattr(args, "lamb_eps", 1e-8)),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_trust_ratio(),
        )
