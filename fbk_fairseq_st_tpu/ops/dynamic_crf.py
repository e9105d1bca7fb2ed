"""Dynamic CRF layer: low-rank transition CRF with beam-approximated
normalizer (Sun et al. 2019, "Fast Structured Decoding for Sequence
Models").

Counterpart of fairseq/modules/dynamic_crf_layer.py:28-180. TPU
formulation: the per-step python loops become ``lax.scan`` over time — the
forward pass scans (K,) log-marginals against (K, K) beam transition
blocks, Viterbi scans argmax indices and back-traces with a second reverse
scan — everything fixed-shape (B, T, K)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_dynamic_crf(key, num_embedding: int, low_rank: int = 32):
    k1, k2 = jax.random.split(key)
    std = low_rank ** -0.5
    return {
        "E1": jax.random.normal(k1, (num_embedding, low_rank)) * std,
        "E2": jax.random.normal(k2, (num_embedding, low_rank)) * std,
    }


def _beam_transitions(params, beam_targets):
    """beam_targets: (B, T, K) -> (B, T-1, K, K) transition scores."""
    e1 = jnp.take(jnp.asarray(params["E1"]), beam_targets[:, :-1], axis=0)
    e2 = jnp.take(jnp.asarray(params["E2"]), beam_targets[:, 1:], axis=0)
    return jnp.einsum("btkr,btlr->btkl", e1, e2)


def crf_score(params, emissions, targets, masks):
    """Unnormalized path score (reference :88-98)."""
    emission_scores = jnp.take_along_axis(
        emissions, targets[:, :, None], axis=2
    )[:, :, 0]
    transition = jnp.sum(
        jnp.take(jnp.asarray(params["E1"]), targets[:, :-1], axis=0)
        * jnp.take(jnp.asarray(params["E2"]), targets[:, 1:], axis=0),
        axis=2,
    )
    scores = emission_scores.at[:, 1:].add(transition)
    scores = scores * masks.astype(scores.dtype)
    return scores.sum(-1)


def _beam_around(emissions, targets, beam):
    """Top-beam tokens per position, forcing targets into the beam when
    given (reference :100-110)."""
    if targets is not None:
        forced = emissions.at[
            jnp.arange(emissions.shape[0])[:, None],
            jnp.arange(emissions.shape[1])[None, :],
            targets,
        ].set(jnp.inf)
        _, beam_targets = jax.lax.top_k(forced, beam)
        beam_emissions = jnp.take_along_axis(emissions, beam_targets, axis=2)
    else:
        beam_emissions, beam_targets = jax.lax.top_k(emissions, beam)
    return beam_emissions, beam_targets


def crf_normalizer(params, emissions, targets, masks, beam: int):
    """Beam-approximated log partition (reference :100-131) via lax.scan."""
    beam_emissions, beam_targets = _beam_around(emissions, targets, beam)
    trans = _beam_transitions(params, beam_targets)  # (B, T-1, K, K)

    def step(score, inputs):
        trans_t, emit_t, mask_t = inputs
        nxt = jax.scipy.special.logsumexp(
            score[:, :, None] + trans_t, axis=1
        ) + emit_t
        score = jnp.where(mask_t[:, None], nxt, score)
        return score, None

    score0 = beam_emissions[:, 0]
    xs = (
        trans.swapaxes(0, 1),  # (T-1, B, K, K)
        beam_emissions[:, 1:].swapaxes(0, 1),
        masks[:, 1:].swapaxes(0, 1),
    )
    final, _ = jax.lax.scan(step, score0, xs)
    return jax.scipy.special.logsumexp(final, axis=1)


def crf_log_likelihood(params, emissions, targets, masks, beam: int = 64):
    emissions = emissions.astype(jnp.float32)
    return crf_score(params, emissions, targets, masks) - crf_normalizer(
        params, emissions, targets, masks, beam
    )


def crf_viterbi(params, emissions, masks, beam: int = 64
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam Viterbi decode (reference :133-180). Returns (scores (B, T),
    tokens (B, T))."""
    emissions = emissions.astype(jnp.float32)
    B, T, V = emissions.shape
    beam_emissions, beam_targets = _beam_around(emissions, None, beam)
    trans = _beam_transitions(params, beam_targets)

    dummy = jnp.broadcast_to(jnp.arange(beam)[None, :], (B, beam))

    def fwd(score, inputs):
        trans_t, emit_t, mask_t = inputs
        cand = score[:, :, None] + trans_t  # (B, K, K)
        nxt = jnp.max(cand, axis=1) + emit_t
        idx = jnp.argmax(cand, axis=1)
        new_score = jnp.where(mask_t[:, None], nxt, score)
        idx = jnp.where(mask_t[:, None], idx, dummy)
        return new_score, (score, idx)

    score0 = beam_emissions[:, 0]
    xs = (
        trans.swapaxes(0, 1),
        beam_emissions[:, 1:].swapaxes(0, 1),
        masks[:, 1:].swapaxes(0, 1),
    )
    final, (traj_scores, traj_idx) = jax.lax.scan(fwd, score0, xs)
    best_score = jnp.max(final, axis=1)
    best_index = jnp.argmax(final, axis=1)

    def back(prev_index, inputs):
        idx_t, scores_t = inputs  # (B, K), (B, K)
        tok = jnp.take_along_axis(idx_t, prev_index[:, None], axis=1)[:, 0]
        sc = jnp.take_along_axis(scores_t, prev_index[:, None], axis=1)[:, 0]
        return tok, (tok, sc)

    _, (toks_rev, scores_rev) = jax.lax.scan(
        back, best_index, (traj_idx[::-1], traj_scores[::-1])
    )
    beam_indices = jnp.concatenate(
        [toks_rev[::-1].T, best_index[:, None]], axis=1
    )  # (B, T) indices into the beam
    finalized_scores = jnp.concatenate(
        [scores_rev[::-1].T, best_score[:, None]], axis=1
    )
    finalized_tokens = jnp.take_along_axis(
        beam_targets, beam_indices[:, :, None], axis=2
    )[:, :, 0]
    # per-position incremental scores (reference :179: s[1:] -= s[:-1])
    finalized_scores = finalized_scores.at[:, 1:].add(
        -finalized_scores[:, :-1]
    )
    return finalized_scores, finalized_tokens
