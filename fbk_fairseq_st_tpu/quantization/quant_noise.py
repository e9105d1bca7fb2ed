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
