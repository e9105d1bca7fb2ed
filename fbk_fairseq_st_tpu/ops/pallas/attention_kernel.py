"""Pallas TPU flash-attention kernel.

Fused softmax(QK^T / sqrt(d)) V without materializing the (T, S) score
matrix in HBM: the grid tiles (batch*heads, q_blocks); each program streams
the K/V blocks through VMEM, keeping the online-softmax running max / sum /
accumulator in registers (Dao et al. 2022, mapped onto the MXU: the two
matmuls per block are the only FLOPs, everything else is VPU elementwise).

Used for encoder self-attention and training-time decoder cross-attention,
where the reference materializes attn_weights (fairseq MultiheadAttention);
the incremental decode path keeps the tiny per-step einsum. Backward is
wired to the XLA formulation's VJP via jax.custom_vjp (numerically
equivalent), like the conv kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, s_block: int,
                  scale: float):
    """Grid: (BH, T // t_block). q_ref: (1, t_block, D); k_ref/v_ref:
    (1, S, D); mask_ref: (1, 1, S) additive mask; out_ref:
    (1, t_block, D)."""
    q = q_ref[0].astype(jnp.float32) * scale  # (t_block, D)
    s_total = k_ref.shape[1]
    t_block, d = q.shape

    m = jnp.full((t_block,), NEG_INF, jnp.float32)
    l = jnp.zeros((t_block,), jnp.float32)
    acc = jnp.zeros((t_block, d), jnp.float32)

    for s0 in range(0, s_total, s_block):
        k = k_ref[0, pl.ds(s0, s_block), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(s0, s_block), :].astype(jnp.float32)
        bias = mask_ref[0, 0, pl.ds(s0, s_block)].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias[None, :]  # (t_block, s_block)
        m_new = jnp.maximum(m, jnp.max(scores, axis=1))
        p = jnp.exp(scores - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    out_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(out_ref.dtype)


def _xla_reference(q, k, v, mask_bias, scale: float):
    scores = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32), k.astype(
        jnp.float32)) * scale + mask_bias[:, None, :]
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bts,bsd->btd", w, v.astype(jnp.float32)).astype(
        q.dtype
    )


def _fwd_impl(q, k, v, mask_bias, scale: float, t_block: int, s_block: int):
    bh, t, d = q.shape
    s = k.shape[1]
    grid = (bh, t // t_block)
    return pl.pallas_call(
        functools.partial(_flash_kernel, s_block=s_block, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_block, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, s, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, s, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda b, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_block, d), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ) if jax.default_backend() == "tpu" else None,
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, mask_bias[:, None, :])


def _pick_block(n: int, preferred: int = 128) -> int:
    b = min(preferred, n)
    while n % b:
        b -= 1
    return b


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, mask_bias, scale: float):
    """q: (BH, T, D), k/v: (BH, S, D), mask_bias: (BH, S) additive
    (0 or NEG_INF). Returns (BH, T, D)."""
    t_block = _pick_block(q.shape[1])
    s_block = _pick_block(k.shape[1])
    return _fwd_impl(q, k, v, mask_bias, scale, t_block, s_block)


def _vjp_fwd(q, k, v, mask_bias, scale):
    out = flash_attention(q, k, v, mask_bias, scale)
    return out, (q, k, v, mask_bias)


def _vjp_bwd(scale, residuals, g):
    q, k, v, mask_bias = residuals
    _, vjp = jax.vjp(
        lambda q, k, v, m: _xla_reference(q, k, v, m, scale),
        q, k, v, mask_bias,
    )
    return vjp(g)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
