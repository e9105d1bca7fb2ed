"""CTC utilities: loss, greedy decoding, and EACL-2021 CTC compression.

The reference's CTC compression (examples/speech_recognition/models/
conv_transformer.py:278-291 + CTCCompressStrategy :385-426) collapses runs of
consecutive equal greedy-CTC predictions into single vectors. There it is a
host-side Python loop (itertools.groupby per batch element + a dense (B, T,
T') weight matrix bmm) — a per-step device->host sync.

TPU-native reformulation (static shapes, no host sync):
  * segment ids: ``seg = cumsum(pred[t] != pred[t-1]) - 1`` per row;
  * per-strategy frame weights (avg / weighted / softmax) computed with
    masked segment-sums (``jax.ops.segment_sum`` under vmap);
  * compression is one weighted segment-sum of the frame vectors into a
    padded (B, T_out, D) buffer — output length stays statically bounded
    (#segments <= T), the new length vector drives downstream masks.

Equivalent to the reference weight-matrix bmm: weights_matrix[b, t, s] =
w[b, t] * [seg[b, t] == s], so x^T @ W == segment_sum(w * x).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def ctc_greedy_predictions(logits, lengths):
    """Greedy per-frame argmax; frames beyond length return -1.

    logits: (B, T, V); lengths: (B,).
    """
    pred = jnp.argmax(logits, axis=-1)
    valid = jnp.arange(logits.shape[1])[None, :] < lengths[:, None]
    return jnp.where(valid, pred, -1), valid


def ctc_segments(pred, valid):
    """Run-length segment ids per row.

    Returns (seg (B, T) int32 with seg[t] in [0, T); invalid frames get the
    id of the following-run continuation but are weight-masked by callers,
    new_lengths (B,) = number of runs within the valid region).
    """
    boundary = jnp.concatenate(
        [
            jnp.ones(pred.shape[:1] + (1,), jnp.int32),
            (pred[:, 1:] != pred[:, :-1]).astype(jnp.int32),
        ],
        axis=1,
    )
    boundary = boundary * valid.astype(jnp.int32)
    seg = jnp.cumsum(boundary, axis=1) - 1
    seg = jnp.maximum(seg, 0)
    new_lengths = jnp.max(
        jnp.where(valid, seg, -1), axis=1
    ) + 1
    return seg, new_lengths


def ctc_compress(
    x,
    ctc_logits,
    lengths,
    strategy: str = "avg",
    out_len: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Collapse consecutive equal-CTC-prediction frames of *x*.

    Args:
      x: (B, T, D) encoder states.
      ctc_logits: (B, T, V).
      lengths: (B,) valid frame counts.
      strategy: 'avg' | 'weighted' | 'softmax' (CTCCompressStrategy).
      out_len: static output length bound (default T).

    Returns (compressed (B, out_len, D), new_lengths (B,)).
    """
    b, t, d = x.shape
    out_len = out_len or t
    prob = jax.nn.softmax(ctc_logits.astype(jnp.float32), axis=-1)
    pred, valid = ctc_greedy_predictions(ctc_logits, lengths)
    seg, new_lengths = ctc_segments(pred, valid)
    validf = valid.astype(jnp.float32)

    # probability of the predicted class per frame (for weighted/softmax)
    p_pred = jnp.take_along_axis(
        prob, jnp.maximum(pred, 0)[..., None], axis=-1
    )[..., 0]

    def seg_sum(vals):  # (B, T) -> (B, out_len) masked segment sum
        return jax.vmap(
            lambda v, s: jax.ops.segment_sum(v, s, num_segments=out_len)
        )(vals, seg)

    if strategy == "avg":
        counts = seg_sum(validf)
        denom = jnp.take_along_axis(jnp.maximum(counts, 1.0), seg, axis=1)
        w = validf / denom
    elif strategy == "weighted":
        totals = seg_sum(p_pred * validf)
        denom = jnp.take_along_axis(jnp.maximum(totals, 1e-9), seg, axis=1)
        w = p_pred * validf / denom
    elif strategy == "softmax":
        # softmax of the predicted-class probs within each run
        e = jnp.exp(p_pred) * validf
        totals = seg_sum(e)
        denom = jnp.take_along_axis(jnp.maximum(totals, 1e-9), seg, axis=1)
        w = e / denom
    else:
        raise ValueError(f"unknown ctc compress strategy {strategy!r}")

    compressed = jax.vmap(
        lambda v, s: jax.ops.segment_sum(v, s, num_segments=out_len)
    )(x * w[..., None].astype(x.dtype), seg)
    new_lengths = jnp.minimum(new_lengths, out_len)
    return compressed, new_lengths


def ctc_loss(
    logits,
    logit_lengths,
    labels,
    label_lengths,
    blank_id: int = 0,
):
    """Per-sequence CTC negative log likelihood, summed (reference
    criterions/CTC_loss.py uses F.ctc_loss(reduction='sum',
    zero_infinity=True)).

    logits: (B, T, V) unnormalized; labels: (B, L) int32 padded with
    anything (mask from label_lengths).
    """
    b, t, _ = logits.shape
    logit_paddings = (
        jnp.arange(t)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    l = labels.shape[1]
    label_paddings = (
        jnp.arange(l)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_paddings,
        labels,
        label_paddings,
        blank_id=blank_id,
    )
    # zero_infinity semantics (torch F.ctc_loss): infeasible alignments
    # contribute 0. A CTC alignment is infeasible iff
    # T < L + #consecutive-duplicate-pairs (optax returns a large
    # log_epsilon-scaled penalty rather than inf, so detect structurally).
    valid_lab = jnp.arange(l)[None, :] < label_lengths[:, None]
    repeats = jnp.sum(
        (labels[:, 1:] == labels[:, :-1]) & valid_lab[:, 1:], axis=1
    )
    feasible = logit_lengths >= (label_lengths + repeats)
    per_seq = jnp.where(
        feasible & jnp.isfinite(per_seq), per_seq, 0.0
    )
    return jnp.sum(per_seq)


def ctc_greedy_decode(logits, lengths, blank_id: int = 0):
    """Greedy CTC decode: collapse repeats then remove blanks.

    Returns (tokens (B, T) padded with -1, token_counts (B,)) — host-side
    post-processing turns these into strings for UER logging (reference
    criterions/CTC_loss.py:31-74).
    """
    pred, valid = ctc_greedy_predictions(logits, lengths)
    first_of_run = jnp.concatenate(
        [jnp.ones(pred.shape[:1] + (1,), bool), pred[:, 1:] != pred[:, :-1]],
        axis=1,
    )
    keep = first_of_run & valid & (pred != blank_id)
    # stable compaction: position of each kept token in the output row
    out_pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    t = pred.shape[1]

    def compact(row_pred, row_keep, row_pos):
        out = jnp.full((t,), -1, row_pred.dtype)
        idx = jnp.where(row_keep, row_pos, t)  # dropped -> scatter OOB
        return out.at[idx].set(jnp.where(row_keep, row_pred, -1), mode="drop")

    tokens = jax.vmap(compact)(pred, keep, out_pos)
    counts = jnp.sum(keep.astype(jnp.int32), axis=1)
    return tokens, counts
