"""WSC / WinoGrande criterions: masked-LM pseudo-likelihood margin losses.

Counterparts of examples/roberta/wsc/wsc_criterion.py:16 (``wsc``) and :139
(``winogrande``). The reference loops over examples on the host, running one
forward per query and one per candidate set (:72-100). Here the whole batch
is scored in two fixed-shape forwards — one over queries ``(B, T)``, one
over the padded candidate block ``(B*C, T)`` — with validity masks standing
in for the ragged structure, so the loss jit-compiles and shards over the
data axis like every other criterion.

Scoring (wsc_criterion.py:47-53): replace the focus-phrase positions with
``<mask>``, run the masked LM, and average the log-probability the model
assigns to the original phrase tokens at those positions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..registry import register_criterion
from .base import Criterion


@register_criterion("wsc")
class WSCCriterion(Criterion):
    def __init__(self, task, args):
        super().__init__(task, args)
        self.mask_idx = task.mask
        self.alpha = getattr(args, "wsc_margin_alpha", 1.0)
        self.beta = getattr(args, "wsc_margin_beta", 0.0)
        self.use_ce = getattr(args, "wsc_cross_entropy", False)
        if getattr(args, "save_predictions", None):
            import logging

            logging.getLogger(__name__).warning(
                "--save-predictions is not supported inside the compiled "
                "loss; use the validate CLI for prediction dumps"
            )

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--wsc-margin-alpha", type=float, metavar="A",
                            default=1.0)
        parser.add_argument("--wsc-margin-beta", type=float, metavar="B",
                            default=0.0)
        parser.add_argument("--wsc-cross-entropy", action="store_true",
                            help="use cross entropy instead of margin loss")
        parser.add_argument("--save-predictions", metavar="FILE")

    # -- masked pseudo-likelihood score ----------------------------------

    def _score(self, model, variables, tokens, mask, rng, training):
        """Mean masked-position log-prob of the original tokens;
        (..., T) -> (...)."""
        masked = jnp.where(mask, self.mask_idx, tokens)
        (logits, _), _ = model.forward(
            variables,
            {"src_tokens": masked, "src_lengths": mask.sum(-1)},
            rng, training,
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        scores = jnp.take_along_axis(lprobs, tokens[..., None], axis=-1)[
            ..., 0
        ]
        m = mask.astype(scores.dtype)
        return (scores * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)

    def _pair_loss(self, q, c, c_valid):
        """Per-example loss given query score ``q`` (B,), candidate scores
        ``c`` (B, C), validity (B, C) — reference get_loss (:55-67); the
        margin form sums ``-q`` once per candidate exactly as the
        broadcasted reference expression does."""
        if self.use_ce:
            neg_inf = jnp.asarray(-1e9, c.dtype)
            cands = jnp.where(c_valid, c, neg_inf)
            all_scores = jnp.concatenate([q[:, None], cands], axis=1)
            return -q + jax.scipy.special.logsumexp(all_scores, axis=1)
        margin = jnp.maximum(c - q[:, None] + self.beta, 0.0)
        per_cand = (-q[:, None] + self.alpha * margin) * c_valid.astype(
            q.dtype
        )
        return per_cand.sum(-1)

    def __call__(self, model, variables, batch, rng=None, training=False):
        q_tokens = batch["query_tokens"]
        q_masks = batch["query_masks"]
        q_valid = batch["query_valid"]
        c_tokens = batch["candidate_tokens"]
        c_masks = batch["candidate_masks"]
        c_valid = batch["candidate_valid"]
        labels = batch["labels"]  # (B,) in {-1 unlabeled/pad, 0, 1}

        bsz, n_cand, t_c = c_tokens.shape
        q_scores = self._score(
            model, variables, q_tokens, q_masks, rng, training
        )
        c_scores = self._score(
            model, variables,
            c_tokens.reshape(bsz * n_cand, t_c),
            c_masks.reshape(bsz * n_cand, t_c),
            rng, training,
        ).reshape(bsz, n_cand)

        # prediction: query outscores EVERY valid candidate (:85)
        beats = (q_scores[:, None] >= c_scores) | ~c_valid
        pred = jnp.all(beats, axis=1) & q_valid

        labeled = (labels >= 0) & q_valid
        ncorrect = jnp.sum(
            (pred.astype(jnp.int32) == labels) & labeled
        )
        nqueries = jnp.sum(labeled)

        # loss only over positive instances (:93-96)
        positive = (labels == 1) & q_valid
        per_ex = self._pair_loss(q_scores, c_scores, c_valid)
        loss = jnp.sum(per_ex * positive.astype(per_ex.dtype))

        sample_size = jnp.maximum(nqueries, 1)
        logging_output = {
            "loss": loss,
            "ntokens": jnp.asarray(batch.get("ntokens", 0)),
            "nsentences": jnp.sum(q_valid),
            "sample_size": sample_size,
            "ncorrect": ncorrect,
            "nqueries": nqueries,
        }
        return loss, sample_size, logging_output, {}

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / max(sample_size, 1) / math.log(2),
            sample_size, round=3,
        )
        nqueries = sum(log.get("nqueries", 0) for log in logging_outputs)
        if nqueries > 0:
            ncorrect = sum(log.get("ncorrect", 0) for log in logging_outputs)
            metrics.log_scalar(
                "accuracy", 100.0 * ncorrect / nqueries, nqueries, round=1
            )


@register_criterion("winogrande")
class WinograndeCriterion(WSCCriterion):
    """Reference wsc_criterion.py:139-166: every example is a positive
    (query is the correct option by construction), single candidate."""

    def __call__(self, model, variables, batch, rng=None, training=False):
        q_tokens = batch["query_tokens"]
        q_masks = batch["query_masks"]
        q_valid = batch["query_valid"]
        c_tokens = batch["candidate_tokens"][:, 0]
        c_masks = batch["candidate_masks"][:, 0]

        q_scores = self._score(
            model, variables, q_tokens, q_masks, rng, training
        )
        c_scores = self._score(
            model, variables, c_tokens, c_masks, rng, training
        )

        valid = q_valid
        pred = (q_scores >= c_scores) & valid
        per_ex = self._pair_loss(
            q_scores, c_scores[:, None], valid[:, None]
        )
        loss = jnp.sum(per_ex * valid.astype(per_ex.dtype))
        sample_size = jnp.maximum(jnp.sum(valid), 1)
        logging_output = {
            "loss": loss,
            "ntokens": jnp.asarray(batch.get("ntokens", 0)),
            "nsentences": jnp.sum(valid),
            "sample_size": sample_size,
            "ncorrect": jnp.sum(pred),
            "nqueries": jnp.sum(valid),
        }
        return loss, sample_size, logging_output, {}
