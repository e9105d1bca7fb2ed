"""SpecAugment and TimeStretch as batched, rng-keyed device ops.

The reference applies both host-side, per-spectrogram, with Python `random`
inside task.train_step (examples/speech_recognition/modules/specaugment.py,
time_stretch.py). Here they are pure jax functions vmapped over the batch and
traced into the train step — zero host round-trips, fused with the conv
frontend by XLA.

Distribution parity with the reference:
  * SpecAugment (specaugment.py:72-112): per spectrogram applied with prob
    ``rate``; m_F freq masks of width int(U[0, F_para)) starting at
    randint(0, n_freq - width); m_T time masks of width
    int(U[1, min(T_para, tau))) starting at randint(0, tau - width); masks
    zero-fill and may overlap. tau is the padded batch length, as in the
    reference (it masks the collated tensor).
  * TimeStretch (time_stretch.py:41-57): per window of w frames, resample to
    round(U[low, high] * min(w, remaining)) frames by rounded linspace
    index gather; if the sequence is shorter than 10 frames, low is clamped
    to 1.0. Fixed-shape deviation: output frames beyond the padded buffer
    length are dropped (the reference reallocates a longer batch; at
    high<=1.25 and bucketed padding this truncation only occurs when a
    stretched utterance would exceed the padded length).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SpecAugmentConfig(NamedTuple):
    frequency_masking_pars: int = 13
    time_masking_pars: int = 13
    frequency_masking_num: int = 2
    time_masking_num: int = 2
    rate: float = 1.0


def specaugment(key, x, cfg: SpecAugmentConfig):
    """x: (B, T, F) padded fbank batch -> masked batch (same shape)."""
    b, tau, v = x.shape

    def one(key, spec):
        keys = jax.random.split(
            key, 1 + 2 * (cfg.frequency_masking_num + cfg.time_masking_num)
        )
        apply = jax.random.uniform(keys[0]) < cfg.rate
        ki = 1
        out = spec
        freq_idx = jnp.arange(v)
        time_idx = jnp.arange(tau)
        for _ in range(cfg.frequency_masking_num):
            f = jnp.floor(
                jax.random.uniform(keys[ki], maxval=float(cfg.frequency_masking_pars))
            ).astype(jnp.int32)
            f0 = jax.random.randint(keys[ki + 1], (), 0, v - f + 1)
            ki += 2
            mask = (freq_idx >= f0) & (freq_idx < f0 + f)
            out = jnp.where(mask[None, :], 0.0, out)
        for _ in range(cfg.time_masking_num):
            t = jnp.floor(
                jax.random.uniform(
                    keys[ki], minval=1.0, maxval=float(min(cfg.time_masking_pars, tau))
                )
            ).astype(jnp.int32)
            t0 = jax.random.randint(keys[ki + 1], (), 0, tau - t + 1)
            ki += 2
            mask = (time_idx >= t0) & (time_idx < t0 + t)
            out = jnp.where(mask[:, None], 0.0, out)
        return jnp.where(apply, out, spec)

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, x)


class TimeStretchConfig(NamedTuple):
    rate: float = 1.0
    w: int = 1
    low: float = 0.8
    high: float = 1.25


def time_stretch(key, x, lengths, cfg: TimeStretchConfig) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T, F), lengths: (B,) -> (stretched (B, T, F), new_lengths)."""
    b, t, f = x.shape
    w = cfg.w
    n_windows = (t + w - 1) // w
    # per output slot, candidate input indices: each window contributes at
    # most ceil(high * w) output frames
    max_per_win = math.ceil(cfg.high * w) + 1

    def one(key, spec, length):
        k_apply, k_sizes = jax.random.split(key)
        apply = jax.random.uniform(k_apply) < cfg.rate
        low = jnp.where(length < 10, jnp.maximum(cfg.low, 1.0), cfg.low)

        win_idx = jnp.arange(n_windows)
        win_start = win_idx * w
        # frames available in window i (0 beyond length)
        remaining = jnp.clip(length - win_start, 0, None)
        avail = jnp.minimum(w, remaining)
        u = jax.random.uniform(k_sizes, (n_windows,), minval=low, maxval=cfg.high)
        # reference: s = uniform(low, high) * min(w, time_len - w*i); int(s)
        sizes = jnp.where(avail > 0, (u * avail).astype(jnp.int32), 0)
        sizes = jnp.minimum(sizes, max_per_win)
        win_end = jnp.minimum(length, w * (win_idx + 1))  # exclusive

        # linspace(w*i, e-1, s) rounded, for each window, padded to max_per_win
        j = jnp.arange(max_per_win)

        def window_ids(start, end, s):
            denom = jnp.maximum(s - 1, 1)
            span = (end - 1) - start
            idx = jnp.round(start + span * j / denom).astype(jnp.int32)
            idx = jnp.where(s == 1, start, idx)
            return idx

        ids = jax.vmap(window_ids)(win_start, win_end, sizes)  # (n_w, max_per_win)
        valid = j[None, :] < sizes[:, None]

        # compact (window, slot) -> output position via exclusive cumsum
        flat_valid = valid.reshape(-1)
        flat_ids = ids.reshape(-1)
        out_pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
        new_length = jnp.maximum(jnp.sum(flat_valid.astype(jnp.int32)), 1)
        new_length = jnp.minimum(new_length, t)

        scatter_to = jnp.where(flat_valid & (out_pos < t), out_pos, t)
        gathered = spec[jnp.clip(flat_ids, 0, t - 1)]
        out = jnp.zeros_like(spec).at[scatter_to].set(
            jnp.where(flat_valid[:, None], gathered, 0.0), mode="drop"
        )
        return (
            jnp.where(apply, out, spec),
            jnp.where(apply, new_length, length),
        )

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, x, lengths.astype(jnp.int32))
