"""Ring attention: sequence-sharded (context-parallel) attention.

Extends the long-context story past one chip's HBM: with the sequence
axis sharded over the mesh's 'model' axis, no device ever materializes
the full (T, S) score matrix OR the full-length K/V — each holds a
1/N sequence shard and the K/V blocks travel the ring via `ppermute`
(one ICI hop per step, overlapping the block's compute), while the
softmax is accumulated online exactly as in the single-chip flash
kernel (`ops/pallas/attention_kernel.py`): running row-max `m`, running
denominator `l`, rescaled accumulator `acc`.

This is a capability the reference (CUDA/torch, replicated-activation
Megatron only) has no counterpart for — on the fork, encoder attention
at S beyond HBM simply cannot run. Design follows Liu et al. 2023
(arXiv:2310.01889) re-expressed as a `jax.lax.scan` over `ppermute`
steps inside `jax.shard_map`; JAX differentiates through `ppermute`, so
the same code trains (the per-step score block is `jax.checkpoint`-ed:
the backward replays each (T_loc, S_loc) block instead of saving all N
of them, the standard ring-attention memory discipline).

Composition with Megatron-SP (`parallel/mesh.py constrain_seq_parallel`):
SP shards the LayerNorm/dropout/residual segments over time but GSPMD
still all-gathers T for the attention itself; with ring attention the
attention consumes the time-sharded layout directly, so the full-length
activation never exists on any device.

Semantics match `ops.attention.mha`'s dense path (softmax over keys,
dropout applied to the normalized weights, NEG_INF additive key bias
for padding) — asserted against it by tests/test_ring_attention.py on
an 8-device CPU mesh, forward and gradients, causal and padded.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


@partial(jax.checkpoint, static_argnums=(6, 7))
def _block(q, k_blk, v_blk, bias_blk, q_off, k_off, causal: bool,
           dropout: Optional[tuple], drop_key=None):
    """One ring step's (T_loc, S_loc) attention block, rematerialized in
    the backward pass. Returns (pv (BH,T,D) f32, psum (BH,T) f32,
    m_blk (BH,T) f32) — the unnormalized contributions of this K/V block
    under ITS OWN row max `m_blk` (the caller rescales into the running
    accumulator)."""
    scores = jnp.einsum(
        "bqd,bkd->bqk", q, k_blk, preferred_element_type=jnp.float32
    )
    scores = scores + bias_blk[:, None, :].astype(jnp.float32)
    if causal:
        t_loc, s_loc = q.shape[1], k_blk.shape[1]
        qpos = q_off + lax.broadcasted_iota(jnp.int32, (t_loc, s_loc), 0)
        kpos = k_off + lax.broadcasted_iota(jnp.int32, (t_loc, s_loc), 1)
        scores = jnp.where((qpos >= kpos)[None], scores, NEG_INF)
    m_blk = jnp.max(scores, axis=-1)
    # keep fully-masked rows' max at a finite floor so exp() below is 0,
    # not NaN via (-inf) - (-inf)
    m_blk = jnp.maximum(m_blk, NEG_INF)
    p = jnp.exp(scores - m_blk[..., None])
    psum = jnp.sum(p, axis=-1)
    if dropout is not None:
        rate, = dropout
        # u8-bit mask keyed by (key, source shard): deterministic, so the
        # checkpoint replay in the backward regenerates it bit-identically
        bits = jax.random.bits(drop_key, p.shape, dtype=jnp.uint8)
        thresh = min(int(rate * 256.0 + 0.999), 255)
        p = jnp.where(bits >= jnp.uint8(thresh), p / (1.0 - rate),
                      jnp.zeros_like(p))
    pv = jnp.einsum("bqk,bkd->bqd", p, v_blk.astype(p.dtype),
                    preferred_element_type=jnp.float32)
    return pv, psum, m_blk


def ring_attention_local(q, k, v, bias, scale: float, axis_name: str,
                         causal: bool = False,
                         dropout_rate: float = 0.0,
                         dropout_key=None,
                         batch_axes: tuple = ()):
    """The per-shard body, to be called INSIDE `jax.shard_map`.

    q: (BH, T_loc, D) local query shard; k/v: (BH, S_loc, D) local K/V
    shard; bias: (BH, S_loc) additive key bias (0 or NEG_INF at pads).
    Devices along `axis_name` hold successive sequence shards (shard i =
    global positions [i*S_loc, (i+1)*S_loc)). Returns (BH, T_loc, D) in
    q.dtype.
    """
    n = lax.psum(1, axis_name)
    rank = lax.axis_index(axis_name)
    t_loc, s_loc = q.shape[1], k.shape[1]
    qf = (q * scale).astype(q.dtype)

    # The running accumulators start as constants, but every scan step
    # folds in data from the K/V block, which is varying along the ring
    # axis (it travels the ring) AND along any batch axes the inputs are
    # sharded over — mark the initializers varying on the same set, or the
    # scan carry's in/out types disagree (shard_map's vma check rejects
    # the trace with "carry input and carry output must have equal types").
    vary = tuple(batch_axes) + (axis_name,)
    acc, m, l = jax.lax.pcast(
        (
            jnp.zeros(q.shape[:2] + (v.shape[-1],), jnp.float32),
            jnp.full(q.shape[:2], NEG_INF, jnp.float32),
            jnp.zeros(q.shape[:2], jnp.float32),
        ),
        vary,
        to="varying",
    )
    perm = [(i, (i + 1) % n) for i in range(n)]

    drop = (dropout_rate,) if dropout_rate > 0.0 else None

    def step(carry, _):
        acc, m, l, k_blk, v_blk, bias_blk, src = carry
        dkey = None
        if drop is not None:
            dkey = jax.random.fold_in(dropout_key, src)
        pv, psum, m_blk = _block(
            qf, k_blk, v_blk, bias_blk,
            rank * t_loc, src * s_loc, causal, drop, dkey,
        )
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_blk - m_new)
        acc = acc * alpha[..., None] + pv * beta[..., None]
        l = l * alpha + psum * beta
        # rotate the K/V block (and its provenance) one hop along the ring
        k_blk, v_blk, bias_blk, src = lax.ppermute(
            (k_blk, v_blk, bias_blk, src), axis_name, perm
        )
        return (acc, m_new, l, k_blk, v_blk, bias_blk, src), None

    init = (acc, m, l, k, v, bias, rank)
    (acc, m, l, *_), _ = lax.scan(step, init, None, length=n)
    safe_l = jnp.where(l > 0.0, l, 1.0)
    return (acc / safe_l[..., None]).astype(q.dtype)


def ring_attention(q, k, v, bias, scale: float, mesh: Mesh,
                   axis: str = "model", batch_axis=None,
                   causal: bool = False, dropout_rate: float = 0.0,
                   dropout_key=None):
    """Global-array convenience wrapper: shard the sequence dim of
    (BH, T, D) q/k/v (and (BH, S) bias) over ``axis`` and run the ring.
    T and S must divide by the axis size; ``batch_axis`` optionally
    shards BH (the usual data axis). Used by ops.attention.mha when a
    ring scope is active, and directly by tests."""
    qspec = P(batch_axis, axis, None)
    bspec = P(batch_axis, axis)
    kwargs = {}
    in_specs = (qspec, qspec, qspec, bspec)
    args = (q, k, v, bias)
    if batch_axis is None:
        b_axes: tuple = ()
    elif isinstance(batch_axis, (tuple, list)):
        b_axes = tuple(batch_axis)
    else:
        b_axes = (batch_axis,)
    if dropout_rate > 0.0:
        in_specs = in_specs + (P(),)
        args = args + (dropout_key,)

        def fn(q, k, v, bias, key):
            return ring_attention_local(
                q, k, v, bias, scale, axis, causal=causal,
                dropout_rate=dropout_rate, dropout_key=key,
                batch_axes=b_axes,
            )
    else:
        def fn(q, k, v, bias):
            return ring_attention_local(
                q, k, v, bias, scale, axis, causal=causal,
                batch_axes=b_axes,
            )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=qspec, **kwargs
    )(*args)


# ---------------------------------------------------------------------------
# mha integration scope (same trace-time global pattern as
# ops.attention.set_flash_attention / parallel.mesh.set_sequence_parallel)
# ---------------------------------------------------------------------------

_RING_SCOPE: Optional[tuple] = None  # (mesh, seq_axis, batch_axis)


def set_ring_attention(mesh: Optional[Mesh], axis: str = "model",
                       batch_axis=None) -> None:
    """Enable (mesh) / disable (None) ring attention inside ops.attention
    .mha for self-attention at trace time. Only meaningful when the mesh's
    ``axis`` has size > 1."""
    global _RING_SCOPE
    if mesh is not None and mesh.shape.get(axis, 1) <= 1:
        mesh = None
    _RING_SCOPE = None if mesh is None else (mesh, axis, batch_axis)


def ring_scope() -> Optional[tuple]:
    return _RING_SCOPE


def ring_eligible(q, k, t_axis_size: int) -> bool:
    """Shape gate used by mha: the sequence dims must split evenly and be
    long enough that a shard is non-degenerate."""
    t, s = int(q.shape[2]), int(k.shape[2])
    return (
        t == s  # self-attention only: q and kv shards must align
        and t % t_axis_size == 0
        and t // t_axis_size >= 2
    )
