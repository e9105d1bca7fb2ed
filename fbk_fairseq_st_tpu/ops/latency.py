"""Latency metrics for simultaneous translation training.

Counterpart of examples/simultaneous_translation/utils/latency.py:9-436:
average_proportion, average_lagging, differentiable_average_lagging (the
DAL recurrence is a lax.scan over target steps), variance_delay, and the
LatencyTraining loss combining expected delays from monotonic-attention
alignments. Batch-first throughout ((B, T) delays, (B, 1) src_lens)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp


def _prepare(delays, src_lens, target_padding_mask, start_from_zero=True):
    """delays (B, T); src_lens (B, 1) -> (delays, src_lens, tgt_lens)."""
    if start_from_zero:
        delays = delays + 1
    b, t = delays.shape
    if target_padding_mask is None:
        tgt_lens = jnp.full((b, 1), t, delays.dtype)
    else:
        tgt_lens = jnp.sum(~target_padding_mask, axis=1, keepdims=True).astype(
            delays.dtype
        )
        delays = jnp.where(target_padding_mask, 0.0, delays)
    # all-pad dummy rows (fixed-shape batch fill) have length 0; clamp so
    # the 1/gamma and /tgt_lens terms stay finite (their delays are already
    # masked to 0, so the clamped rows contribute nothing)
    tgt_lens = jnp.maximum(tgt_lens, 1.0)
    src_lens = jnp.maximum(src_lens.astype(delays.dtype), 1.0)
    return delays, src_lens, tgt_lens


def average_proportion(delays, src_lens, target_padding_mask=None,
                       start_from_zero=True):
    """AP = sum(delays) / (|x|*|y|) (reference :82-100)."""
    delays, src_lens, tgt_lens = _prepare(
        delays, src_lens, target_padding_mask, start_from_zero
    )
    return jnp.sum(delays, axis=1, keepdims=True) / (src_lens * tgt_lens)


def average_lagging(delays, src_lens, target_padding_mask=None,
                    start_from_zero=True):
    """AL (STACL; reference :103-132)."""
    delays, src_lens, tgt_lens = _prepare(
        delays, src_lens, target_padding_mask, start_from_zero
    )
    b, t = delays.shape
    reached = delays >= src_lens  # (B, T)
    # mask positions AFTER the first delay that reaches |x|
    lag_mask = jnp.concatenate(
        [jnp.zeros((b, 1), bool), reached[:, :-1]], axis=1
    )
    lag_mask = jnp.cumsum(lag_mask, axis=1) > 0
    gamma = tgt_lens / src_lens
    lagging = delays - jnp.arange(t)[None, :] / gamma
    lagging = jnp.where(lag_mask, 0.0, lagging)
    tau = jnp.sum(~lag_mask, axis=1, keepdims=True).astype(delays.dtype)
    return jnp.sum(lagging, axis=1, keepdims=True) / tau


def differentiable_average_lagging(delays, src_lens, target_padding_mask=None,
                                   start_from_zero=True):
    """DAL (MMA paper; reference :135-180): delays'_i = max(delays_i,
    delays'_{i-1} + 1/gamma), then mean of delays'_i - (i-1)/gamma."""
    delays, src_lens, tgt_lens = _prepare(
        delays, src_lens, target_padding_mask, start_from_zero
    )
    b, t = delays.shape
    gamma = (tgt_lens / src_lens)[:, 0]  # (B,)

    def step(prev, d_i):
        new = jnp.maximum(d_i, prev + 1.0 / gamma)
        return new, new

    d0 = delays[:, 0]
    if t > 1:
        _, rest = jax.lax.scan(step, d0, delays[:, 1:].T)
        new_delays = jnp.concatenate([d0[:, None], rest.T], axis=1)
    else:
        new_delays = d0[:, None]
    dal = new_delays - jnp.arange(t)[None, :] / gamma[:, None]
    if target_padding_mask is not None:
        dal = jnp.where(target_padding_mask, 0.0, dal)
    return jnp.sum(dal, axis=1, keepdims=True) / tgt_lens


def variance_delay(delays, src_lens, target_padding_mask=None,
                   start_from_zero=True):
    """Variance over heads*layers per target step (reference :183-233).

    delays: (B, HL, T)."""
    if start_from_zero:
        delays = delays + 1
    b, hl, t = delays.shape
    if hl == 1:
        return jnp.zeros((1,), delays.dtype)
    if target_padding_mask is None:
        tgt_lens = jnp.full((b, 1), t, delays.dtype)
    else:
        tgt_lens = jnp.sum(~target_padding_mask, axis=1, keepdims=True).astype(
            delays.dtype
        )
        delays = jnp.where(target_padding_mask[:, None, :], 0.0, delays)
    tgt_lens = jnp.maximum(tgt_lens, 1.0)
    var = jnp.var(delays, axis=1, ddof=1)
    if target_padding_mask is not None:
        var = jnp.where(target_padding_mask, 0.0, var)
    return jnp.sum(var, axis=1, keepdims=True) / tgt_lens


_METRICS = {
    "differentiable_average_lagging": differentiable_average_lagging,
    "average_lagging": average_lagging,
    "average_proportion": average_proportion,
}


def expected_delays_from_attention(
    attention: List[jax.Array],
    source_padding_mask=None,
    target_padding_mask=None,
    stay_on_last_token: bool = True,
):
    """attention: list of per-layer (B, H, T, S) alignments -> expected
    delays (B, H*L, T) + src_lens (B*H*L, 1) (reference :304-368).

    Right-padded sources assumed (this framework never left-pads audio)."""
    att = jnp.concatenate(attention, axis=1)  # (B, HL, T, S)
    b, hl, t, s = att.shape
    att = att.reshape(b * hl, t, s)
    if not stay_on_last_token:
        resid = 1.0 - jnp.sum(att[:, :, :-1], axis=2, keepdims=True)
        att = jnp.concatenate([att[:, :, :-1], resid], axis=2)
    steps = jnp.arange(1, s + 1, dtype=att.dtype)[None, None, :]
    if source_padding_mask is not None:
        src_lens = jnp.sum(
            ~source_padding_mask, axis=1, keepdims=True
        ).astype(att.dtype)
        src_lens = jnp.repeat(src_lens, hl, axis=0)
    else:
        src_lens = jnp.full((b * hl, 1), s, att.dtype)
    expected = jnp.sum(steps * att, axis=2).reshape(b, hl, t)
    if target_padding_mask is not None:
        expected = jnp.where(target_padding_mask[:, None, :], 0.0, expected)
    return expected, src_lens


def latency_training_loss(
    attention: List[jax.Array],
    source_padding_mask=None,
    target_padding_mask=None,
    avg_weight: float = 0.0,
    var_weight: float = 0.0,
    avg_type: str = "differentiable_average_lagging",
    var_type: str = "variance_delay",
    stay_on_last_token: bool = True,
    average_method: str = "weighted_average",
):
    """LatencyTraining.loss (reference :290-436): latency penalty added to
    the CE loss by the latency-augmented criterion."""
    expected, src_lens = expected_delays_from_attention(
        attention, source_padding_mask, target_padding_mask,
        stay_on_last_token,
    )
    b, hl, t = expected.shape
    loss = 0.0
    if avg_weight > 0.0:
        if average_method == "average":
            avg_delays = jnp.mean(expected, axis=1)
        elif average_method == "weighted_average":
            w = jax.nn.softmax(expected, axis=1)
            avg_delays = jnp.sum(expected * w, axis=1)
        elif average_method == "max":
            avg_delays = jnp.max(expected, axis=1)
        else:
            raise ValueError(f"{average_method} is not supported")
        per_sent_src = src_lens.reshape(b, hl)[:, :1]
        avg = _METRICS[avg_type](
            avg_delays, per_sent_src, target_padding_mask,
            start_from_zero=False,
        )
        loss = loss + avg_weight * jnp.sum(avg)
    if var_weight > 0.0:
        per_sent_src = src_lens.reshape(b, hl)[:, :1]
        var = variance_delay(
            expected, per_sent_src, target_padding_mask,
            start_from_zero=False,
        )
        loss = loss + var_weight * jnp.sum(var)
    return loss
