"""Scalar (int8) quantization emulation.

Counterpart of fairseq/modules/quantization/scalar/ops.py:8-48: fake-quantize
weights during training so the network adapts to int8 inference. Observers
are implemented directly in NumPy/JAX (the reference delegates to
torch.quantization observers): ``tensor`` = min/max affine, ``channel`` =
per-output-channel symmetric, ``histogram`` = percentile-clipped min/max
(an approximation of the reference's histogram observer). The straight-
through estimator keeps gradients flowing through the rounding."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize(w, scale, zero_point, bits: int = 8):
    """Affine fake-quantization (reference ops.py:14-15)."""
    qmax = 2 ** bits - 1
    return (
        jnp.clip(jnp.round(w / scale + zero_point), 0, qmax) - zero_point
    ) * scale


def _qparams_minmax(w_min, w_max, bits: int):
    qmax = 2 ** bits - 1
    w_min = jnp.minimum(w_min, 0.0)
    w_max = jnp.maximum(w_max, 0.0)
    scale = jnp.maximum((w_max - w_min) / qmax, 1e-8)
    zero_point = jnp.clip(jnp.round(-w_min / scale), 0, qmax)
    return scale, zero_point


def emulate_int(w, bits: int = 8, method: str = "tensor",
                scale=None, zero_point=None):
    """Returns (w_quantized, scale, zero_point)."""
    w32 = w.astype(jnp.float32)
    if scale is None:
        if method == "tensor":
            scale, zero_point = _qparams_minmax(
                jnp.min(w32), jnp.max(w32), bits
            )
        elif method == "histogram":
            # percentile clip approximates the reference's histogram search
            lo = jnp.percentile(w32, 0.1)
            hi = jnp.percentile(w32, 99.9)
            scale, zero_point = _qparams_minmax(lo, hi, bits)
        elif method == "channel":
            # per-last-axis-channel symmetric (reference ops.py:28-37)
            amax = jnp.max(jnp.abs(w32), axis=tuple(range(w32.ndim - 1)))
            qmax = 2 ** bits - 1
            scale = jnp.maximum(2 * amax / qmax, 1e-8)
            zero_point = jnp.full_like(scale, (qmax + 1) // 2)
        else:
            raise ValueError(f"unknown scalar quantization method: {method}")
    return quantize(w32, scale, zero_point, bits).astype(w.dtype), scale, zero_point


def fake_quantize(w, bits: int = 8, method: str = "tensor"):
    """Straight-through fake quantization: forward uses the quantized
    value, backward is identity (reference scalar modules' STE)."""
    q, _, _ = emulate_int(w, bits, method)
    return w + jax.lax.stop_gradient(q - w)


def scalar_quant_noise(key, w, p: float, bits: int = 8,
                       method: str = "tensor"):
    """--quant-noise-scalar: each weight element is replaced by its int8
    fake-quantized value with probability p (STE backward), the reference's
    scalar quant-noise training (quantization/scalar/modules/qlinear.py:
    quantize weight, bernoulli(1-p) mask keeps the fp value)."""
    if p <= 0:
        return w
    q, _, _ = emulate_int(w, bits, method)
    noise = jnp.where(jax.random.bernoulli(key, 1.0 - p, w.shape), 0.0, q - w)
    return w + jax.lax.stop_gradient(noise).astype(w.dtype)


def scalar_quant_noise_params(params, key, p: float, bits: int = 8,
                              method: str = "tensor", min_size: int = 256):
    """Apply scalar quant noise to every weight leaf with >= min_size
    elements (same whitelist as fake_quantize_params)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, max(len(leaves), 1))

    def leaf(w, k):
        if hasattr(w, "size") and w.size >= min_size and jnp.issubdtype(
            w.dtype, jnp.floating
        ):
            return scalar_quant_noise(k, w, p, bits, method)
        return w

    return jax.tree_util.tree_unflatten(
        treedef, [leaf(w, k) for w, k in zip(leaves, keys)]
    )


def fake_quantize_params(params, bits: int = 8, method: str = "tensor",
                         min_size: int = 256):
    """Apply STE fake quantization to every weight leaf with >= min_size
    elements (biases and norms stay fp32, as in the reference's module
    whitelist)."""

    def leaf(w):
        if hasattr(w, "size") and w.size >= min_size and jnp.issubdtype(
            w.dtype, jnp.floating
        ):
            return fake_quantize(w, bits, method)
        return w

    return jax.tree_util.tree_map(leaf, params)
