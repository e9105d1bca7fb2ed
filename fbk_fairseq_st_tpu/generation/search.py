"""Search strategies operating on (step, lprobs, scores) like the reference
(fairseq/search.py): each returns 2*beam candidate (scores, token indices,
beam indices) per sentence, score-sorted descending.

All are pure fixed-shape functions usable inside the jitted decode loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import NEG_INF


class SearchOutput(NamedTuple):
    scores: jax.Array  # (B, 2K) cumulative candidate scores
    indices: jax.Array  # (B, 2K) token ids
    beams: jax.Array  # (B, 2K) source beam per candidate


class BeamSearch:
    """fairseq/search.py:50-84."""

    needs_rng = False

    def __init__(self, tgt_dict):
        self.pad = tgt_dict.pad()
        self.eos = tgt_dict.eos()
        self.vocab_size = len(tgt_dict)

    def step(self, step: int, lprobs, scores, rng=None) -> SearchOutput:
        """lprobs: (B, K, V) this step's log-probs; scores: (B, K) cumulative
        scores up to the previous step (step is a traced scalar)."""
        b, k, v = lprobs.shape
        cum = lprobs + scores[:, :, None]
        # at step 0 all beams are identical: search only beam 0
        cum = jnp.where(step == 0, _first_beam_only(lprobs), cum)
        top_scores, top_idx = jax.lax.top_k(cum.reshape(b, k * v), 2 * k)
        return SearchOutput(
            scores=top_scores,
            indices=top_idx % v,
            beams=top_idx // v,
        )


def _first_beam_only(lprobs):
    """Mask all beams but the first with NEG_INF (step-0 semantics)."""
    b, k, v = lprobs.shape
    mask = jnp.arange(k)[None, :, None] == 0
    return jnp.where(mask, lprobs, NEG_INF)


class LengthConstrainedBeamSearch(BeamSearch):
    """fairseq/search.py:86-101: force eos outside [min_len_a*src+b,
    max_len_a*src+b] per sentence."""

    def __init__(self, tgt_dict, min_len_a, min_len_b, max_len_a, max_len_b):
        super().__init__(tgt_dict)
        self.min_len_a = min_len_a
        self.min_len_b = min_len_b
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.src_lengths = None  # set by the generator per batch

    def step(self, step, lprobs, scores, rng=None) -> SearchOutput:
        min_lens = self.min_len_a * self.src_lengths + self.min_len_b
        max_lens = self.max_len_a * self.src_lengths + self.max_len_b
        eos = self.eos
        below = (step < min_lens)[:, None, None]
        above = (step >= max_lens)[:, None, None]
        v = lprobs.shape[-1]
        is_eos = (jnp.arange(v) == eos)[None, None, :]
        lprobs = jnp.where(below & is_eos, NEG_INF, lprobs)
        lprobs = jnp.where(above & ~is_eos, NEG_INF, lprobs)
        lprobs = jnp.where(above & is_eos, 0.0, lprobs)
        return super().step(step, lprobs, scores, rng)


class DiverseBeamSearch:
    """fairseq/search.py:103-162 (Vijayakumar et al. 2016): beams split into
    G groups; each group's lprobs are penalized by the token counts already
    chosen by previous groups this step."""

    needs_rng = False

    def __init__(self, tgt_dict, num_groups: int, diversity_strength: float):
        self.pad = tgt_dict.pad()
        self.eos = tgt_dict.eos()
        self.num_groups = num_groups
        self.diversity_strength = -diversity_strength
        self.beam = BeamSearch(tgt_dict)

    def step(self, step: int, lprobs, scores, rng=None) -> SearchOutput:
        b, k, v = lprobs.shape
        g = self.num_groups
        if k % g != 0:
            raise ValueError(
                "DiverseBeamSearch requires --beam to be divisible by the "
                "number of groups"
            )
        diversity_buf = jnp.zeros((b, v), jnp.float32)
        out_scores, out_indices, out_beams = [], [], []
        for grp in range(g):
            lprobs_g = lprobs[:, grp::g, :]
            scores_g = scores[:, grp::g]
            if grp > 0:
                lprobs_g = lprobs_g + self.diversity_strength * diversity_buf[:, None, :]
            res = self.beam.step(step, lprobs_g, scores_g, rng)
            # scatter-add chosen tokens into the diversity buffer
            one_hot = jax.nn.one_hot(res.indices, v, dtype=jnp.float32).sum(axis=1)
            diversity_buf = diversity_buf + one_hot
            out_scores.append(res.scores)
            out_indices.append(res.indices)
            out_beams.append(res.beams * g + grp)
        # interleave groups (reference stacks then views)
        scores_o = jnp.stack(out_scores, axis=2).reshape(b, -1)
        indices_o = jnp.stack(out_indices, axis=2).reshape(b, -1)
        beams_o = jnp.stack(out_beams, axis=2).reshape(b, -1)
        return SearchOutput(scores_o, indices_o, beams_o)


class Sampling:
    """fairseq/search.py:164-279: ancestral sampling with optional top-k /
    top-p (nucleus) truncation."""

    needs_rng = True

    def __init__(self, tgt_dict, sampling_topk: int = -1, sampling_topp: float = -1.0):
        self.pad = tgt_dict.pad()
        self.eos = tgt_dict.eos()
        self.sampling_topk = sampling_topk
        self.sampling_topp = sampling_topp

    def step(self, step: int, lprobs, scores, rng=None) -> SearchOutput:
        b, k, v = lprobs.shape
        # at step 0 sample from beam 0 only
        base = jnp.where(step == 0, lprobs[:, :1, :].repeat(k, axis=1), lprobs)

        probs = jnp.exp(base.astype(jnp.float32))
        if self.sampling_topk > 0:
            kth = jax.lax.top_k(probs, self.sampling_topk)[0][..., -1:]
            probs = jnp.where(probs < kth, 0.0, probs)
        if self.sampling_topp > 0:
            sorted_p = jnp.sort(probs, axis=-1)[..., ::-1]
            cumsum = jnp.cumsum(sorted_p, axis=-1)
            # smallest set with cumulative mass > p: keep tokens whose
            # rank-cumsum (exclusive) < p
            exclusive = cumsum - sorted_p
            keep_sorted = exclusive < self.sampling_topp
            # threshold value = smallest kept prob
            thresh = jnp.min(
                jnp.where(keep_sorted, sorted_p, jnp.inf), axis=-1, keepdims=True
            )
            probs = jnp.where(probs >= thresh, probs, 0.0)
        probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-20)

        toks = jax.random.categorical(
            rng, jnp.log(jnp.maximum(probs, 1e-20)), axis=-1, shape=(2, b, k)
        )
        # 2K candidates: two samples per beam (the reference samples beam
        # candidates with replacement; duplicates are fine for sampling)
        toks = jnp.concatenate([toks[0], toks[1]], axis=1)  # (B, 2K)
        beams = jnp.concatenate(
            [jnp.arange(k)[None, :].repeat(b, 0)] * 2, axis=1
        )
        gathered = jnp.take_along_axis(
            jnp.concatenate([base, base], axis=1), toks[:, :, None], axis=-1
        )[..., 0]
        prev = jnp.concatenate([scores, scores], axis=1)
        prev = jnp.where(step == 0, jnp.zeros_like(prev), prev)
        return SearchOutput(prev + gathered, toks, beams)


class DiverseSiblingsSearch:
    """fairseq/search.py:281-343 (Li & Jurafsky 2016): rank penalty within
    siblings of the same beam."""

    needs_rng = False

    def __init__(self, tgt_dict, diversity_rate: float):
        self.eos = tgt_dict.eos()
        self.diversity_rate = diversity_rate
        self.beam = BeamSearch(tgt_dict)

    def step(self, step: int, lprobs, scores, rng=None) -> SearchOutput:
        b, k, v = lprobs.shape
        kk = 2 * k
        # top 2K siblings per beam, penalized by rank * diversity_rate
        sib_scores, sib_indices = jax.lax.top_k(lprobs, kk)  # (B, K, 2K)
        penalty = (jnp.arange(kk, dtype=jnp.float32) + 1) * self.diversity_rate
        cum = sib_scores - penalty[None, None, :] + scores[:, :, None]
        flat_scores = cum.reshape(b, k * kk)
        flat_tokens = sib_indices.reshape(b, k * kk)
        top_scores, top_pos = jax.lax.top_k(flat_scores, kk)
        tokens = jnp.take_along_axis(flat_tokens, top_pos, axis=1)
        beams = top_pos // kk
        sib = SearchOutput(top_scores, tokens, beams)
        # step 0 is a PLAIN beam step in the reference (search.py:315-316):
        # all beams identical, no rank penalty on the recorded scores
        plain = self.beam.step(step, lprobs, scores, rng)
        return SearchOutput(
            jnp.where(step == 0, plain.scores, sib.scores),
            jnp.where(step == 0, plain.indices, sib.indices),
            jnp.where(step == 0, plain.beams, sib.beams),
        )
