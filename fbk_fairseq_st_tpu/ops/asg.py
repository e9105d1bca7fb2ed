"""ASG: Auto Segmentation Criterion (Collobert et al. 2016, wav2letter).

The reference cannot run this without the external wav2letter bindings
(reference criterions/ASG_loss.py:50 imports wav2letter.criterion.ASGLoss);
here the loss is implemented natively as two log-semiring recursions over
unnormalized emissions plus a learned (V, V) transition matrix:

    FCC (full connection): logadd over ALL label paths
        alpha[t, v] = em[t, v] + logadd_u(alpha[t-1, u] + trans[v, u])
    FAL (forced alignment): logadd over alignments of the packed target
        beta[t, l] = em[t, y_l] + logadd(beta[t-1, l]   + trans[y_l, y_l],
                                         beta[t-1, l-1] + trans[y_l, y_l-1])
    loss = FCC - FAL        (a globally normalized sequence criterion —
                             no local softmax, no blank; repeats are
                             handled by replabels, data/replabels.py)

``trans[dest, src]`` follows wav2letter's row-destination convention.
Both recursions are one ``lax.scan`` over time with per-batch length
masking — static shapes, MXU-shaped (B, V, V) logadds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30  # finite -inf: masked lanes stay NaN-free under where()

SCALE_MODES = ("none", "input_sz", "input_sz_sqrt", "target_sz",
               "target_sz_sqrt")


def _scale(loss, input_lengths, target_lengths, mode: str):
    t = jnp.maximum(input_lengths.astype(jnp.float32), 1.0)
    l = jnp.maximum(target_lengths.astype(jnp.float32), 1.0)
    if mode == "none":
        return loss
    if mode == "input_sz":
        return loss / t
    if mode == "input_sz_sqrt":
        return loss / jnp.sqrt(t)
    if mode == "target_sz":
        return loss / l
    if mode == "target_sz_sqrt":
        return loss / jnp.sqrt(l)
    raise ValueError(f"unknown scale mode {mode!r}")


def asg_loss(
    emissions: jax.Array,
    transitions: jax.Array,
    targets: jax.Array,
    input_lengths: jax.Array,
    target_lengths: jax.Array,
    scale_mode: str = "target_sz_sqrt",
) -> jax.Array:
    """Per-utterance ASG loss.

    Args:
        emissions: (B, T, V) unnormalized scores.
        transitions: (V, V), ``transitions[dest, src]``.
        targets: (B, L) replabel-packed target ids (pad arbitrary).
        input_lengths / target_lengths: (B,).
    Returns (B,) losses.
    """
    emissions = emissions.astype(jnp.float32)
    transitions = transitions.astype(jnp.float32)
    B, T, V = emissions.shape
    L = targets.shape[1]

    # ---- FCC: logadd over all paths --------------------------------------
    def fcc_step(alpha, t):
        em = emissions[:, t]  # (B, V)
        new = em + jax.nn.logsumexp(
            alpha[:, None, :] + transitions[None, :, :], axis=-1
        )
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    alpha0 = emissions[:, 0]
    alpha, _ = lax.scan(fcc_step, alpha0, jnp.arange(1, T))
    fcc = jax.nn.logsumexp(alpha, axis=-1)  # (B,)

    # ---- FAL: logadd over alignments of the target -----------------------
    # em[t, y_l] per batch: (B, T, L)
    tgt_em = jnp.take_along_axis(
        emissions, jnp.broadcast_to(targets[:, None, :], (B, T, L)), axis=2
    )
    stay_trans = transitions[targets, targets]  # (B, L)
    move_trans = jnp.concatenate(
        [
            jnp.zeros((B, 1), jnp.float32),
            transitions[targets[:, 1:], targets[:, :-1]],
        ],
        axis=1,
    )  # (B, L): score of entering l from l-1 (l=0 unused)

    pos = jnp.arange(L)[None, :]

    def fal_step(beta, t):
        em_t = tgt_em[:, t]  # (B, L)
        stay = beta + stay_trans
        prev = jnp.concatenate([jnp.full((B, 1), NEG), beta[:, :-1]], axis=1)
        move = prev + move_trans
        new = em_t + jnp.logaddexp(stay, move)
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, beta), None

    beta0 = jnp.where(pos == 0, tgt_em[:, 0], NEG)
    beta, _ = lax.scan(fal_step, beta0, jnp.arange(1, T))
    fal = jnp.take_along_axis(
        beta, jnp.maximum(target_lengths - 1, 0)[:, None], axis=1
    )[:, 0]

    return _scale(fcc - fal, input_lengths, target_lengths, scale_mode)


def asg_viterbi_decode(emissions, transitions, input_lengths):
    """Best-path decode under ASG scoring (emissions + transitions): the
    native counterpart of the reference's W2lViterbiDecoder over ASG models
    (w2l_decoder.py:84). Returns (paths (B, T), scores (B,))."""
    emissions = emissions.astype(jnp.float32)
    transitions = transitions.astype(jnp.float32)
    B, T, V = emissions.shape

    def step(carry, t):
        score = carry  # (B, V)
        cand = score[:, None, :] + transitions[None, :, :]  # (B, V_to, V_from)
        best_prev = jnp.argmax(cand, axis=-1)  # (B, V)
        new = emissions[:, t] + jnp.max(cand, axis=-1)
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, score), jnp.where(
            active, best_prev, jnp.broadcast_to(jnp.arange(V)[None], (B, V))
        )

    score0 = emissions[:, 0]
    final, backptrs = lax.scan(step, score0, jnp.arange(1, T))
    # backtrack
    last = jnp.argmax(final, axis=-1)  # (B,)

    def back(carry, bp):
        cur = carry
        prev = jnp.take_along_axis(bp, cur[:, None], axis=1)[:, 0]
        return prev, cur  # emit the state at t+1; carry the state at t

    first, path_rest = lax.scan(back, last, backptrs, reverse=True)
    paths = jnp.concatenate([first[None, :], path_rest], axis=0)  # (T, B)
    return paths.T, jnp.max(final, axis=-1)
