"""Quant-noise: randomly drop weight blocks during training so the model is
robust to later block quantization ("Training with Quantization Noise for
Extreme Model Compression", Fan et al. 2020).

Counterpart of fairseq/modules/quant_noise.py:10-107 — the reference
registers a forward-pre-hook on Linear/Embedding/Conv2d; here it is a pure
function applied to the weight inside the training forward."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quant_noise(key, w, p: float, block_size: int, deterministic: bool = False):
    """Drop random size-`block_size` blocks of the last axis with prob p and
    rescale by 1/(1-p) (dropout semantics over blocks)."""
    if p <= 0 or deterministic:
        return w
    in_features = w.shape[-1]
    assert in_features % block_size == 0, (
        "in_features must be a multiple of block_size"
    )
    n_blocks = in_features // block_size
    mask_shape = w.shape[:-1] + (n_blocks,)
    drop = jax.random.bernoulli(key, p, mask_shape)
    drop = jnp.repeat(drop, block_size, axis=-1)
    return jnp.where(drop, 0.0, w) / (1.0 - p)


def quant_noise_linear(key, w, p: float, block_size: int):
    """--quant-noise-pq for this build's (in, out) linear weight layout
    (ops/core.py linear: y = x @ w): one mask bit per (in-block, out-unit),
    matching the reference's Linear blocks over in_features
    (fairseq/modules/quant_noise.py:63-79, weight stored (out, in) there).
    Weights whose in_features is not a multiple of block_size are returned
    unchanged (the reference asserts instead; here the caller sweeps every
    projection in a layer and skips the indivisible ones)."""
    if p <= 0:
        return w
    in_features = w.shape[0]
    if in_features % block_size != 0:
        return w
    drop = jax.random.bernoulli(
        key, p, (in_features // block_size,) + w.shape[1:]
    )
    drop = jnp.repeat(drop, block_size, axis=0)
    return (jnp.where(drop, 0.0, w) / (1.0 - p)).astype(w.dtype)
