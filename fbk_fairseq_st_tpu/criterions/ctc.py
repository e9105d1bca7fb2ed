"""CTC criterions: ``ctc_loss`` and joint ``ctc_multi_loss``.

Counterparts of examples/speech_recognition/criterions/CTC_loss.py and
ctc_multi_loss.py:

  * ``ctc_loss``: summed CTC NLL (zero_infinity) over encoder-output
    log-probs, with UER logging via greedy dedup/deblank + edit distance
    (compute_ctc_uer :31-74) — here both the loss (optax) and the edit
    distance run on device, no host loop;
  * ``ctc_multi_loss``: one forward pass; CTC features come from the
    encoder's ctc_out (present both when CTC compression is on and when the
    model was built for this criterion — the reference migrates the
    criterion-owned fc_out into the model with raw_state_dict_upgrade,
    conv_transformer.py:105-112, which is this build's canonical layout);
    ``loss = ctc_weight * ctc + underlying`` with the underlying criterion
    (--underlying-criterion) computing on the decoder output of the same
    pass (ctc_multi_loss.py:140-173). sample_size follows the reference:
    the CTC sample size (transcript token count).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.ctc import ctc_greedy_decode, ctc_loss
from ..ops.edit_distance import levenshtein
from ..registry import CRITERIONS, register_criterion
from .base import Criterion, get_perplexity


def _ctc_uer(ctc_logits, input_lengths, targets, target_lengths, blank_idx, pad_idx):
    """errors/total per compute_ctc_uer, fully on device."""
    pred, pred_counts = ctc_greedy_decode(ctc_logits, input_lengths, blank_idx)
    # targets are padded with pad_idx; mask by lengths
    errors = levenshtein(pred, pred_counts, targets, target_lengths)
    return jnp.sum(errors), jnp.sum(target_lengths)


@register_criterion("ctc_loss")
class CTCCriterion(Criterion):
    """Encoder-only CTC training (wav2letter-style ASR)."""

    def __init__(self, task, args):
        super().__init__(task, args)
        self.blank_idx = task.target_dictionary.index("<ctc_blank>")
        self.use_source_side_sample_size = getattr(
            args, "use_source_side_sample_size", False
        )

    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--use-source-side-sample-size",
            action="store_true",
            default=False,
            help="when compute average loss, using number of source tokens as "
            "denominator. This argument will be no-op if sentence-avg is used.",
        )

    def __call__(self, model, variables, batch, rng=None, training=False):
        encoder_out, new_state = model.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits = encoder_out.ctc_out if encoder_out.ctc_out is not None else (
            encoder_out.encoder_out
        )
        input_lengths = (
            encoder_out.ctc_lengths
            if encoder_out.ctc_lengths is not None
            else encoder_out.src_lengths
        )
        return self._compute(logits, input_lengths, batch, {"encoder": new_state})

    def _compute(self, logits, input_lengths, batch, new_state):
        targets = batch["target"]
        target_lengths = batch["target_lengths"]
        loss = ctc_loss(
            logits, input_lengths, targets, target_lengths, blank_id=self.blank_idx
        )
        errors, total = _ctc_uer(
            logits, input_lengths, targets, target_lengths,
            self.blank_idx, self.padding_idx,
        )
        ntokens = jnp.sum(target_lengths)
        nsentences = targets.shape[0]
        if self.sentence_avg:
            sample_size = jnp.asarray(nsentences)
        elif self.use_source_side_sample_size:
            sample_size = jnp.sum(input_lengths)
        else:
            sample_size = ntokens
        logging_output = {
            "loss": loss,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
            "errors": errors,
            "total": total,
            "nframes": jnp.sum(batch["src_lengths"]),
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        nsentences = sum(log.get("nsentences", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        errors = sum(log.get("errors", 0) for log in logging_outputs)
        total = sum(log.get("total", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        if total > 0:
            metrics.log_scalar(
                "acc", 100.0 - min(errors * 100.0 / total, 100.0), round=3
            )
        if sample_size != ntokens:
            metrics.log_scalar(
                "nll_loss", loss_sum / ntokens / math.log(2), ntokens, round=3
            )


@register_criterion("ctc_multi_loss")
class CTCMultiLoss(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        assert task.source_dictionary is not None
        self.blank_idx = task.source_dictionary.index("<ctc_blank>")
        self.src_pad_idx = task.source_dictionary.pad()
        self.ctc_weight = getattr(args, "ctc_weight", 1.0)
        self.real_criterion = self.build_real_criterion(args, task)

    @staticmethod
    def build_real_criterion(args, task):
        saved = args.criterion
        args.criterion = args.underlying_criterion
        assert saved != args.underlying_criterion
        underlying = CRITERIONS[args.underlying_criterion].build_criterion(args, task)
        args.criterion = saved
        return underlying

    @classmethod
    def add_args(cls, parser):
        CTCCriterion.add_args(parser)
        parser.add_argument(
            "--ctc-encoder-layer", default=6, type=int, metavar="LAYER_NUM",
            help="The encoder layer whose feature are used to compute the CTC loss",
        )
        parser.add_argument(
            "--ctc-weight", default=1.0, type=float, metavar="W",
            help="The relative weight to assign to the CTC loss",
        )
        parser.add_argument(
            "--underlying-criterion", type=str, metavar="VAL", required=True,
            help="underlying criterion to use for the model output loss",
        )

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng, training)
        encoder_out = net_output[1]["encoder_out"]
        assert encoder_out.ctc_out is not None, (
            "ctc_multi_loss needs a model emitting ctc_out (conv_transformer "
            "builds ctc_fc when criterion==ctc_multi_loss)"
        )
        ctc_logits = encoder_out.ctc_out
        ctc_lengths = (
            encoder_out.ctc_lengths
            if encoder_out.ctc_lengths is not None
            else encoder_out.src_lengths
        )

        transcripts = batch["transcript_target"]
        transcript_lengths = batch["transcript_target_lengths"]
        ctc = ctc_loss(
            ctc_logits, ctc_lengths, transcripts, transcript_lengths,
            blank_id=self.blank_idx,
        )
        errors, total = _ctc_uer(
            ctc_logits, ctc_lengths, transcripts, transcript_lengths,
            self.blank_idx, self.src_pad_idx,
        )

        real_loss, real_nll = self.real_criterion.compute_loss(
            model, net_output, batch
        )
        loss = self.ctc_weight * ctc + real_loss

        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
        real_sample_size = (
            jnp.asarray(nsentences) if self.sentence_avg else ntokens
        )
        ctc_sample_size = jnp.sum(transcript_lengths)
        logging_output = {
            "loss": loss,
            "nll_loss": real_nll,
            "ctc_loss": ctc,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": real_sample_size,
            "ctc_errors": errors,
            "ctc_total": total,
            "nframes": jnp.sum(batch["src_lengths"]),
        }
        return loss, ctc_sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        ctc_loss_sum = sum(log.get("ctc_loss", 0) for log in logging_outputs)
        if logging_outputs and "nll_loss" in logging_outputs[0]:
            nll_loss_sum = sum(log.get("nll_loss", 0) for log in logging_outputs)
        else:
            nll_loss_sum = loss_sum - ctc_loss_sum
        ntokens = sum(log.get("ntokens", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        ctc_errors = sum(log.get("ctc_errors", 0) for log in logging_outputs)
        ctc_total = sum(log.get("ctc_total", 0) for log in logging_outputs)
        nframes = sum(log.get("nframes", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        metrics.log_scalar(
            "nll_loss", nll_loss_sum / ntokens / math.log(2), ntokens, round=3
        )
        metrics.log_derived(
            "ppl", lambda meters: get_perplexity(meters["nll_loss"].avg)
        )
        metrics.log_scalar(
            "ctc_loss", ctc_loss_sum / sample_size / math.log(2), sample_size, round=3
        )
        if ctc_total > 0:
            metrics.log_scalar(
                "ctc_acc", 100.0 - min(ctc_errors * 100.0 / ctc_total, 100.0)
            )
        metrics.log_scalar("nframes", nframes)
