"""Lightweight and dynamic convolutions (Wu et al. 2019, Pay Less Attention).

Counterparts of the reference's native kernels + fallbacks
(fairseq/modules/lightconv_layer/, dynamicconv_layer/,
lightweight_convolution.py, dynamic_convolution.py):

  * lightweight conv: per-head kernels (H, K), optionally softmax-normalized
    over K, shared by the C/H channels of each head, depthwise over time;
  * dynamic conv: per-position kernels predicted from the input by a linear
    layer (C -> H*K), softmax over K.

The XLA path materializes (B, T, K, C/H-grouped) windows with static K and
contracts with einsum — exactly the unfold+bmm form the reference's
pure-torch fallback proves equivalent. A Pallas TPU kernel for the fused
window-contract lives in ops/pallas/conv_kernels.py; this module routes to
it when enabled and wires its backward to the XLA path's VJP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .core import RngStream, dropout, init_linear, linear, normal_init


def init_lightweight_conv(key, conv_dim: int, kernel_size: int, num_heads: int,
                          bias: bool = False):
    p = {
        "weight": normal_init(key, (num_heads, kernel_size), std=0.02),
    }
    if bias:
        p["bias"] = jnp.zeros((conv_dim,), jnp.float32)
    return p


def init_dynamic_conv(key, conv_dim: int, kernel_size: int, num_heads: int,
                      bias: bool = False):
    p = {
        "weight_linear": init_linear(key, conv_dim, num_heads * kernel_size),
    }
    if bias:
        p["bias"] = jnp.zeros((conv_dim,), jnp.float32)
    return p


def _unfold(x, kernel_size: int, padding_l: int):
    """x: (B, T, C) -> windows (B, T, K, C): windows[b,t,k] = x[b, t+k-pl]."""
    b, t, c = x.shape
    pad_r = kernel_size - 1 - padding_l
    xp = jnp.pad(x, ((0, 0), (padding_l, max(pad_r, 0)), (0, 0)))
    if pad_r < 0:
        xp = xp[:, :pad_r]
    return jnp.stack([xp[:, k: k + t] for k in range(kernel_size)], axis=2)


def lightweight_conv(
    params,
    x,
    kernel_size: int,
    num_heads: int,
    padding_l: int,
    weight_softmax: bool = True,
    weight_dropout: float = 0.0,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
):
    """x: (B, T, C) -> (B, T, C)."""
    b, t, c = x.shape
    h = num_heads
    w = params["weight"].astype(jnp.float32)
    if weight_softmax:
        w = jax.nn.softmax(w, axis=-1)
    w = w.astype(x.dtype)
    if rng is not None:
        w = dropout(w, weight_dropout, rng, deterministic)
    win = _unfold(x, kernel_size, padding_l).reshape(b, t, kernel_size, h, c // h)
    out = jnp.einsum("hk,btkhd->bthd", w, win).reshape(b, t, c)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def dynamic_conv(
    params,
    x,
    kernel_size: int,
    num_heads: int,
    padding_l: int,
    weight_softmax: bool = True,
    weight_dropout: float = 0.0,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    query=None,
    use_pallas: bool = False,
):
    """x: (B, T, C) -> (B, T, C); kernels predicted per position."""
    b, t, c = x.shape
    h = num_heads
    if query is None:
        query = x
    w = linear(params["weight_linear"], query).reshape(b, t, h, kernel_size)
    if weight_softmax:
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
    if rng is not None:
        w = dropout(w, weight_dropout, rng, deterministic)

    if use_pallas:
        from .pallas.conv_kernels import dynamic_conv_pallas

        out = dynamic_conv_pallas(x, w, padding_l)
    else:
        win = _unfold(x, kernel_size, padding_l).reshape(
            b, t, kernel_size, h, c // h
        )
        out = jnp.einsum("bthk,btkhd->bthd", w, win).reshape(b, t, c)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def lightweight_conv_step(params, x_window, kernel_size: int, num_heads: int,
                          weight_softmax: bool = True):
    """Incremental step: x_window (B, K, C) (last K inputs, current last)
    -> (B, C). Matches causal padding_l = K - 1."""
    b, k, c = x_window.shape
    h = num_heads
    w = params["weight"].astype(jnp.float32)
    if weight_softmax:
        w = jax.nn.softmax(w, axis=-1)
    w = w.astype(x_window.dtype)
    win = x_window.reshape(b, k, h, c // h)
    out = jnp.einsum("hk,bkhd->bhd", w, win).reshape(b, c)
    if "bias" in params:
        out = out + params["bias"].astype(x_window.dtype)
    return out


def dynamic_conv_step(params, x_window, kernel_size: int, num_heads: int,
                      weight_softmax: bool = True, query=None):
    """Incremental step for dynamic conv: kernel predicted from the current
    position (the window's last element)."""
    b, k, c = x_window.shape
    h = num_heads
    if query is None:
        query = x_window[:, -1]
    w = linear(params["weight_linear"], query).reshape(b, h, kernel_size)
    if weight_softmax:
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x_window.dtype)
    win = x_window.reshape(b, k, h, c // h)
    out = jnp.einsum("bhk,bkhd->bhd", w, win).reshape(b, c)
    if "bias" in params:
        out = out + params["bias"].astype(x_window.dtype)
    return out
