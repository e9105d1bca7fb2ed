"""nat_loss: masked-position CE + length-prediction loss.

Counterpart of fairseq/criterions/nat_loss.py for the CMLM family:
label-smoothed CE over the masked target positions (word_ins) plus a CE
length loss weighted by --length-loss-factor.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion, get_perplexity


@register_criterion("nat_loss")
class NATLoss(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.eps = getattr(args, "label_smoothing", 0.0)
        self.length_loss_factor = getattr(args, "length_loss_factor", 0.1)

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--label-smoothing", default=0.0, type=float, metavar="D")
        parser.add_argument("--length-loss-factor", default=0.1, type=float,
                            help="weight of the length prediction loss")

    def _label_smoothed_ce(self, logits, target, mask, ls):
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if target.ndim == logits.ndim:
            # soft labels (insertion transformer): CE against a distribution
            nll = -jnp.sum(target.astype(jnp.float32) * lprobs, axis=-1)
        else:
            nll = -jnp.take_along_axis(
                lprobs, target[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
        per_tok = (
            (1.0 - ls) * nll + ls * (-jnp.mean(lprobs, axis=-1))
            if ls > 0 else nll
        )
        keep = mask.astype(per_tok.dtype)
        n = jnp.maximum(jnp.sum(keep), 1.0)
        return jnp.sum(per_tok * keep) / n, jnp.sum(nll * keep) / n

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        logits, extra = net_output

        if "losses" in extra:
            # multi-head NAT (levenshtein): mean CE per factor, summed
            # (reference nat_loss.py _compute_loss over the outputs dict)
            loss = 0.0
            nll_loss = 0.0
            per_factor = {}
            for name, spec in extra["losses"].items():
                if "loss" in spec:  # pre-computed factor (CRF NLL)
                    loss = loss + spec.get("factor", 1.0) * spec["loss"]
                    per_factor[name + "-loss"] = spec["loss"]
                    continue
                factor_loss, factor_nll = self._label_smoothed_ce(
                    spec["out"], spec["tgt"], spec["mask"],
                    spec.get("ls", 0.0),
                )
                loss = loss + spec.get("factor", 1.0) * factor_loss
                per_factor[name + "-loss"] = factor_loss
                if spec.get("nll_loss", False):
                    nll_loss = nll_loss + factor_nll
            if "length_out" in extra:
                length_lprobs = jax.nn.log_softmax(
                    extra["length_out"].astype(jnp.float32), axis=-1
                )
                length_nll = -jnp.take_along_axis(
                    length_lprobs, extra["length_tgt"][:, None], axis=-1
                )[:, 0]
                length_loss = jnp.mean(length_nll)
                loss = loss + self.length_loss_factor * length_loss
                per_factor["length-loss"] = length_loss
            nsentences = batch["target"].shape[0]
            logging_output = {
                "loss": loss,
                "nll_loss": nll_loss,
                "ntokens": jnp.sum(batch["target"] != self.padding_idx),
                "nsentences": jnp.asarray(nsentences),
                "sample_size": jnp.asarray(1.0),
                **per_factor,
            }
            return loss, jnp.asarray(1.0), logging_output, new_state

        mask = extra["word_ins_mask"]

        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        target = batch["target"]
        nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(lprobs, axis=-1)
        per_tok = (1.0 - self.eps) * nll + self.eps * smooth
        keep = mask & (target != self.padding_idx)
        word_ins_loss = jnp.sum(per_tok * keep)
        n_masked = jnp.maximum(jnp.sum(keep), 1)

        length_lprobs = jax.nn.log_softmax(extra["length_out"], axis=-1)
        length_nll = -jnp.take_along_axis(
            length_lprobs, extra["length_tgt"][:, None], axis=-1
        )[:, 0]
        length_loss = jnp.sum(length_nll)

        # per-factor mean losses summed (reference nat_loss averages per
        # factor then sums)
        loss = word_ins_loss / n_masked + self.length_loss_factor * (
            length_loss / batch["target"].shape[0]
        )
        nsentences = batch["target"].shape[0]
        sample_size = jnp.asarray(1.0)  # losses already normalized
        logging_output = {
            "loss": loss,
            "nll_loss": jnp.sum(nll * keep) / n_masked,
            "length_loss": length_loss / nsentences,
            "ntokens": jnp.sum(batch["target"] != self.padding_idx),
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        loss = sum(log.get("loss", 0) for log in logging_outputs)
        nll = sum(log.get("nll_loss", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss / max(sample_size, 1) / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "nll_loss", nll / max(sample_size, 1) / math.log(2), sample_size, round=3
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
        )
