"""Iterative refinement decoding for NAT models (mask-predict).

Counterpart of fairseq/iterative_refinement_generator.py:1-315 for the CMLM
member: predict the length, start from all-unk rows, then for max_iter
rounds fill masks with the full-context decoder's argmax and skeptically
re-mask the lowest-scoring tokens with a linearly decaying ratio
(cmlm_transformer.py _skeptical_unmasking). Each round is one jitted
fixed-shape call; rounds run host-side (max_iter is small and constant).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


class IterativeRefinementGenerator:
    def __init__(self, tgt_dict, max_iter: int = 10, max_len_a: float = 0,
                 max_len_b: int = 200):
        self.tgt_dict = tgt_dict
        self.pad = tgt_dict.pad()
        self.unk = tgt_dict.unk()
        self.bos = tgt_dict.bos()
        self.eos = tgt_dict.eos()
        self.max_iter = max_iter
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self._jitted = {}

    def generate(self, models, sample, prefix_tokens=None, **kwargs):
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

        key = (id(model), src_tokens.shape, max_len)
        if key not in self._jitted and hasattr(model, "refinement_step"):
            # levenshtein-style models own their whole iteration
            # (delete/insert/fill) — no CMLM re-masking between steps

            def run_refine(src_tokens, src_lengths):
                enc, _ = model.encode(variables, src_tokens, src_lengths)
                tokens, scores = model.initialize_output_tokens(
                    variables, enc, max_len
                )
                for _ in range(self.max_iter):
                    tokens, scores = model.refinement_step(
                        variables, tokens, scores, enc
                    )
                return tokens, scores

            self._jitted[key] = jax.jit(run_refine)
        if key not in self._jitted:

            def run(src_tokens, src_lengths):
                enc, _ = model.encode(variables, src_tokens, src_lengths)
                tokens, scores = model.initialize_output_tokens(
                    variables, enc, max_len
                )
                for step in range(self.max_iter):
                    tokens, scores = model.forward_decoder_step(
                        variables, tokens, scores, enc
                    )
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
                return tokens, scores

            self._jitted[key] = jax.jit(run)

        tokens, scores = jax.device_get(self._jitted[key](src_tokens, src_lengths))

        results: List[List[dict]] = []
        for b in range(tokens.shape[0]):
            row = tokens[b]
            keep = row != self.pad
            toks = row[keep]
            # strip bos; keep eos terminal like the AR generator outputs
            if len(toks) and toks[0] == self.bos:
                toks = toks[1:]
            pos_scores = scores[b][keep][1:] if len(toks) else scores[b][:0]
            results.append(
                [
                    {
                        "tokens": toks.astype(np.int64),
                        "score": float(pos_scores.mean()) if len(pos_scores) else 0.0,
                        "positional_scores": pos_scores.astype(np.float32),
                        "alignment": None,
                        "attention": None,
                    }
                ]
            )
        return results
