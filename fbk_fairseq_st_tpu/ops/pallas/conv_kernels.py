"""Pallas TPU kernels for dynamic/lightweight convolution.

TPU-native counterpart of the reference CUDA kernels
(fairseq/modules/dynamicconv_layer/dynamicconv_cuda_kernel.cu,
lightconv_layer/lightconv_cuda_kernel.cu). The contraction per output
position is a K-tap band product — tiny contraction dims that the MXU can't
exploit, so the kernel keeps the padded (T+K-1, C) row in VMEM and issues K
fused VPU multiply-adds per (T_block, C) tile, slicing the overlapping halo
windows with pl.ds. Backward is wired to the XLA unfold+einsum
formulation's VJP via jax.custom_vjp (the two paths are numerically
equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dynamic_conv_kernel(x_ref, w_ref, out_ref, *, kernel_size: int,
                         t_block: int, num_heads: int):
    """Grid: (B, T // t_block).

    x_ref: (1, T + K - 1, C) — the full padded batch row (left halo K-1)
    w_ref: (1, t_block, H * K) — per-position kernels for this tile
    out_ref: (1, t_block, C)
    """
    j = pl.program_id(1)
    c = out_ref.shape[-1]
    repeat = c // num_heads
    base = j * t_block

    acc = jnp.zeros((t_block, c), jnp.float32)
    for k in range(kernel_size):
        # tap k multiplies x[t + k - (K-1)] == xp[base + t + k]
        xs = x_ref[0, pl.ds(base + k, t_block), :].astype(jnp.float32)
        wk = w_ref[0, :, k::kernel_size].astype(jnp.float32)  # (t_block, H)
        wk_full = jnp.repeat(wk, repeat, axis=1)  # (t_block, C)
        acc = acc + xs * wk_full
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _xla_reference(x, w, padding_l: int):
    b, t, c = x.shape
    _, _, h, k = w.shape
    pad_r = k - 1 - padding_l
    xp = jnp.pad(x, ((0, 0), (padding_l, max(pad_r, 0)), (0, 0)))
    if pad_r < 0:
        xp = xp[:, :pad_r]
    win = jnp.stack([xp[:, i: i + t] for i in range(k)], axis=2)
    win = win.reshape(b, t, k, h, c // h)
    return jnp.einsum("bthk,btkhd->bthd", w, win).reshape(b, t, c)


def _dynamic_conv_fwd_impl(x, w, padding_l: int):
    b, t, c = x.shape
    _, _, h, k = w.shape
    halo = k - 1
    t_block = 128 if t % 128 == 0 else (t if t <= 512 else None)
    if t_block is None or c % 128 != 0 or c % h != 0:
        return _xla_reference(x, w, padding_l)

    # xp[t + k] == x[t + k - padding_l] for every tap
    xp = jnp.pad(x, ((0, 0), (padding_l, halo - padding_l), (0, 0)))
    w_flat = w.reshape(b, t, h * k)

    grid = (b, t // t_block)
    return pl.pallas_call(
        functools.partial(
            _dynamic_conv_kernel,
            kernel_size=k,
            t_block=t_block,
            num_heads=h,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, t + halo, c), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_block, h * k), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_block, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, w_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dynamic_conv_pallas(x, w, padding_l: int):
    """x: (B, T, C); w: (B, T, H, K) normalized kernels. Returns (B, T, C)."""
    return _dynamic_conv_fwd_impl(x, w, padding_l)


def _fwd(x, w, padding_l: int):
    return _dynamic_conv_fwd_impl(x, w, padding_l), (x, w)


def _bwd(padding_l: int, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_: _xla_reference(x_, w_, padding_l), x, w)
    return vjp(g)


dynamic_conv_pallas.defvjp(_fwd, _bwd)
