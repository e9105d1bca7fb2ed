"""Iterative refinement decoding for NAT models (mask-predict).

Counterpart of fairseq/iterative_refinement_generator.py:1-315 for the CMLM
member: predict the length, start from all-unk rows, then for max_iter
rounds fill masks with the full-context decoder's argmax and skeptically
re-mask the lowest-scoring tokens with a linearly decaying ratio
(cmlm_transformer.py _skeptical_unmasking). Each round is one jitted
fixed-shape call; rounds run host-side (max_iter is small and constant).

Length-beam decoding (--iter-decode-with-beam, reference :136-146): the
top-N predicted lengths each seed a candidate row; candidates decode in one
batched jit call and the best average-token-score candidate wins — or an
external autoregressive reranker (--iter-decode-with-external-reranker,
reference rerank :66-98: the LAST --path checkpoint) rescores them
teacher-forced. --retain-iter-history returns every round's tokens
(reference :149, printed as E- lines by generate).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


class IterativeRefinementGenerator:
    def __init__(self, tgt_dict, max_iter: int = 10, max_len_a: float = 0,
                 max_len_b: int = 200, beam_size: int = 1,
                 reranking: bool = False, retain_history: bool = False,
                 decoding_format=None):
        self.tgt_dict = tgt_dict
        self.pad = tgt_dict.pad()
        self.unk = tgt_dict.unk()
        self.bos = tgt_dict.bos()
        self.eos = tgt_dict.eos()
        self.max_iter = max_iter
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.beam_size = beam_size
        self.reranking = reranking
        self.retain_history = retain_history
        # accepted and passed through like the reference (:193); the
        # registered NAT models ignore it there too
        self.decoding_format = decoding_format
        self._jitted = {}

    def _init_tokens_from_lengths(self, length_tgt, max_len):
        """[bos, unk*(L-2), eos, pad...] rows for given lengths — the same
        layout as the models' initialize_output_tokens."""
        length_tgt = jnp.clip(length_tgt, 2, max_len - 1)
        pos = jnp.arange(max_len)[None, :]
        tokens = jnp.where(pos < length_tgt[:, None], self.unk, self.pad)
        tokens = tokens.at[:, 0].set(self.bos)
        tokens = jnp.where(pos == (length_tgt - 1)[:, None], self.eos, tokens)
        scores = jnp.zeros(tokens.shape, jnp.float32)
        return tokens.astype(jnp.int32), scores

    def generate(self, models, sample, prefix_tokens=None, **kwargs):
        reranker = None
        if self.reranking:
            assert len(models) > 1, (
                "--iter-decode-with-external-reranker assumes the last "
                "--path checkpoint is the reranker"
            )
            assert self.beam_size > 1, (
                "reranking requires --iter-decode-with-beam > 1"
            )
            reranker = models[-1]
            models = models[:-1]
        if len(models) > 1 and all(
            hasattr(m, "refinement_step") for m, _ in models
        ):
            # Levenshtein ensemble: average the edit-head log-probs
            from .nonautoregressive_ensembles import EnsembleLevT

            models = [(EnsembleLevT(models), None)]
        model, variables = models[0]
        net_input = sample["net_input"]
        src_tokens = jnp.asarray(net_input["src_tokens"])
        src_lengths = jnp.asarray(net_input["src_lengths"])
        max_len = min(
            int(self.max_len_a * src_tokens.shape[1] + self.max_len_b),
            getattr(model, "max_target_positions", 256) - 1,
            255,
        )
        beam = self.beam_size
        if beam > 1 and hasattr(model, "refinement_step"):
            raise ValueError(
                f"{type(model).__name__} does not support length-beam "
                "decoding (as in the reference: allow_length_beam is False "
                "for edit-based models)"
            )

        key = (id(model), src_tokens.shape, max_len, beam,
               self.retain_history)
        if key not in self._jitted and hasattr(model, "refinement_step"):
            # levenshtein-style models own their whole iteration
            # (delete/insert/fill) — no CMLM re-masking between steps

            def run_refine(src_tokens, src_lengths):
                enc, _ = model.encode(variables, src_tokens, src_lengths)
                tokens, scores = model.initialize_output_tokens(
                    variables, enc, max_len
                )
                history = [tokens] if self.retain_history else None
                for _ in range(self.max_iter):
                    tokens, scores = model.refinement_step(
                        variables, tokens, scores, enc
                    )
                    if history is not None:
                        history.append(tokens)
                return tokens, scores, (
                    jnp.stack(history) if history is not None else jnp.zeros(0)
                )

            self._jitted[key] = jax.jit(run_refine)
        if key not in self._jitted:

            def run(src_tokens, src_lengths):
                enc, _ = model.encode(variables, src_tokens, src_lengths)
                if beam > 1:
                    # length beam (reference :136-146): top-N predicted
                    # lengths, encoder states replicated beam-first so row
                    # b*beam+j is sentence b's j-th length candidate
                    length_logits = model.forward_length(variables, enc)
                    _, top_lengths = jax.lax.top_k(length_logits, beam)
                    if hasattr(model, "decode_lengths"):
                        # --pred-length-offset: classes are src-relative
                        top_lengths = model.decode_lengths(top_lengths, enc)
                    enc = jax.tree_util.tree_map(
                        lambda x: jnp.repeat(x, beam, axis=0)
                        if hasattr(x, "ndim") and x.ndim >= 1
                        and x.shape[0] == length_logits.shape[0]
                        else x,
                        enc,
                    )
                    tokens, scores = self._init_tokens_from_lengths(
                        top_lengths.reshape(-1), max_len
                    )
                else:
                    tokens, scores = model.initialize_output_tokens(
                        variables, enc, max_len
                    )
                history = [tokens] if self.retain_history else None
                for step in range(self.max_iter):
                    tokens, scores = model.forward_decoder_step(
                        variables, tokens, scores, enc
                    )
                    if history is not None:
                        history.append(tokens)
                    if step < self.max_iter - 1:
                        # skeptical unmasking: re-mask lowest-scoring tokens
                        p = 1.0 - (step + 1) / self.max_iter
                        maskable = (
                            (tokens != self.pad)
                            & (tokens != self.bos)
                            & (tokens != self.eos)
                        )
                        n_maskable = jnp.sum(maskable, axis=1, keepdims=True)
                        boundary = jnp.floor(
                            n_maskable.astype(jnp.float32) * p
                        ).astype(jnp.int32)
                        masked_scores = jnp.where(maskable, scores, jnp.inf)
                        ranks = jnp.argsort(
                            jnp.argsort(masked_scores, axis=1), axis=1
                        )
                        remask = (ranks < boundary) & maskable
                        tokens = jnp.where(remask, self.unk, tokens)
                        scores = jnp.where(remask, 0.0, scores)
                return tokens, scores, (
                    jnp.stack(history) if history is not None else jnp.zeros(0)
                )

            self._jitted[key] = jax.jit(run)

        tokens, scores, history = jax.device_get(
            self._jitted[key](src_tokens, src_lengths)
        )
        if not self.retain_history:
            history = None

        candidates = self._finalize(tokens, scores, history)
        if beam > 1:
            if reranker is not None:
                self._rerank(
                    reranker, candidates, src_tokens, src_lengths, beam
                )
            # keep the best length candidate per sentence (reference
            # :287-293: argmax over each group's scores)
            results = []
            for b in range(len(candidates) // beam):
                group = candidates[b * beam: (b + 1) * beam]
                results.append(max(group, key=lambda h: h[0]["score"]))
            return results
        return candidates

    def _finalize(self, tokens, scores, history=None) -> List[List[dict]]:
        results: List[List[dict]] = []
        for b in range(tokens.shape[0]):
            row = tokens[b]
            keep = row != self.pad
            toks = row[keep]
            # strip bos; keep eos terminal like the AR generator outputs
            if len(toks) and toks[0] == self.bos:
                toks = toks[1:]
            pos_scores = scores[b][keep][1:] if len(toks) else scores[b][:0]
            hypo = {
                "tokens": toks.astype(np.int64),
                "score": float(pos_scores.mean()) if len(pos_scores) else 0.0,
                "positional_scores": pos_scores.astype(np.float32),
                "alignment": None,
                "attention": None,
                "steps": self.max_iter,
            }
            if history is not None:
                hist_rows = []
                for h in history[:, b]:
                    h_keep = h[(h != self.pad)]
                    if len(h_keep) and h_keep[0] == self.bos:
                        h_keep = h_keep[1:]
                    hist_rows.append(h_keep.astype(np.int64))
                hypo["history"] = hist_rows
            results.append([hypo])
        return results

    def _rerank(self, reranker, candidates, src_tokens, src_lengths, beam):
        """Teacher-forced rescoring with an autoregressive model (reference
        rerank :66-98): each candidate's score becomes the reranker's
        length-normalized log-probability of its tokens."""
        re_model, re_vars = reranker
        bsz = src_tokens.shape[0]
        max_t = max(
            (len(c[0]["tokens"]) for c in candidates if c), default=1
        )
        prev = np.full((bsz * beam, max_t), self.pad, np.int64)
        tgts = np.full((bsz * beam, max_t), self.pad, np.int64)
        for i, cand in enumerate(candidates):
            toks = np.asarray(cand[0]["tokens"])
            if len(toks) == 0:
                continue
            prev[i, : len(toks)] = np.concatenate([[self.eos], toks[:-1]])
            tgts[i, : len(toks)] = toks

        enc, _ = re_model.encode(re_vars, src_tokens, src_lengths)
        enc_rep = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, beam, axis=0)
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == bsz
            else x,
            enc,
        )
        logits, _ = re_model.decoder(
            re_vars["params"]["decoder"],
            jnp.asarray(prev),
            encoder_out=enc_rep.encoder_out,
            encoder_padding_mask=enc_rep.encoder_padding_mask,
        )
        lprobs = jax.device_get(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )
        tok_lp = np.take_along_axis(lprobs, tgts[..., None], axis=-1)[..., 0]
        mask = tgts != self.pad
        denom = np.maximum(mask.sum(axis=1), 1)
        scores = (tok_lp * mask).sum(axis=1) / denom
        for i, cand in enumerate(candidates):
            cand[0]["score"] = float(scores[i])
