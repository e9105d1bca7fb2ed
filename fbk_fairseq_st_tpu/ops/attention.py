"""Multi-head attention with a fixed-shape incremental KV cache.

Functional counterpart of the reference MultiheadAttention
(fairseq/modules/multihead_attention.py:19-471) and LocalAttention with
distance penalties (examples/speech_recognition/modules/local_attention.py,
conv_transformer_layer.py PENALTIES).

TPU-native cache design: instead of the reference's grow-by-concat
``prev_key/prev_value`` dict (incremental_decoding_utils.py), the cache is a
preallocated ``(B, H, T_max, Dh)`` buffer written with
``lax.dynamic_update_slice_in_dim`` at the current step — static shapes keep
the decode loop a single compiled ``lax.while_loop``. Beam reorder
(reference ``reorder_incremental_state``) is a gather on the batch axis,
done by the generator.

All tensors are batch-first (B, T, D): XLA/TPU prefers the batch dimension
leading for sharding; the reference's (T, B, C) layout is a cuDNN-era
convention with no benefit on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .core import NEG_INF, RngStream, dropout, init_linear, linear


class MHAConfig(NamedTuple):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = True
    # 'log' | 'gauss' | None — encoder LocalAttention distance penalties
    penalty: Optional[str] = None
    init_variance: float = 1.0


# Route eligible full-sequence attention through the fused Pallas flash
# kernel (no (T,S) score matrix in HBM; fused Pallas backward; causal block
# skipping; in-kernel attention dropout). Module-level so every model picks
# it up without threading a flag through each config.
#
# Default AUTO: enabled on real TPU backends, disabled elsewhere (the CPU
# interpreter exists for tests but is orders of magnitude slower than XLA).
# --use-pallas-attention / --no-pallas-attention (options.py) force it.
_FLASH_ATTENTION: Optional[bool] = None

# Shape gate for the AUTO mode, from v5e measurements (PERF.md §3): XLA's
# own fused attention wins below ~2048 keys (flash's per-grid-step
# overhead dominates smaller tiles — FBK's conv-compressed encoder is
# T<=512/4 and decoders are ~50 tokens), while from S=2048 the flash
# fwd+bwd wins at every measured batch*heads (and is the only option once
# the materialized (T,S) batch approaches HBM capacity). The round-3 gate
# sat at 512 from a bh=512-only sweep; the round-4 full (bh, S) sweep
# moved the crossover — see PERF.md §3 for both tables. Forcing via
# set_flash_attention(True) / --use-pallas-attention bypasses the gate.
FLASH_MIN_KEY_LEN = 2048


def set_flash_attention(enabled: Optional[bool]) -> None:
    """True/False force; None restores backend-dependent auto."""
    global _FLASH_ATTENTION
    _FLASH_ATTENTION = enabled if enabled is None else bool(enabled)


def _flash_eligible_shape(key_len: int) -> bool:
    if _FLASH_ATTENTION is not None:
        return _FLASH_ATTENTION
    return (
        jax.default_backend() == "tpu" and key_len >= FLASH_MIN_KEY_LEN
    )


def init_mha(key, cfg: MHAConfig):
    """Separate q/k/v/out projections.

    The reference packs qkv into one in_proj weight initialized with
    xavier_uniform over the packed (3E, E) matrix — equivalent fan to
    per-projection xavier with gain 1/sqrt(2), which newer fairseq uses
    explicitly. We keep plain xavier per projection: initialization scheme
    is not part of the parity surface (checkpoint converters map weights
    either way).
    """
    ks = jax.random.split(key, 5)
    p = {
        "q": init_linear(ks[0], cfg.embed_dim, cfg.embed_dim, cfg.bias),
        "k": init_linear(ks[1], cfg.embed_dim, cfg.embed_dim, cfg.bias),
        "v": init_linear(ks[2], cfg.embed_dim, cfg.embed_dim, cfg.bias),
        "out": init_linear(ks[3], cfg.embed_dim, cfg.embed_dim, cfg.bias),
    }
    if cfg.penalty == "gauss":
        p["penalty_variance"] = jnp.full((cfg.num_heads,), cfg.init_variance, jnp.float32)
    return p


def init_cache(batch: int, max_len: int, cfg: MHAConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Preallocated self-attention KV cache for incremental decoding."""
    head_dim = cfg.embed_dim // cfg.num_heads
    shape = (batch, cfg.num_heads, max_len, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _split_heads(x, num_heads: int):
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _distance_penalty(params, cfg: MHAConfig, tgt_len: int, src_len: int):
    """Additive penalty subtracted from attention logits (Di Gangi 2019;
    reference conv_transformer_layer.py:22-44, local_attention.py)."""
    t_pos = jnp.arange(tgt_len, dtype=jnp.float32)[:, None]
    s_pos = jnp.arange(src_len, dtype=jnp.float32)[None, :]
    dist = jnp.abs(t_pos - s_pos)
    if cfg.penalty == "log":
        pen = jnp.maximum(0.0, jnp.log(jnp.maximum(dist, 1e-9)))
        return pen[None, None, :, :]  # (1, 1, T, S) broadcast over B, H
    elif cfg.penalty == "gauss":
        var = params["penalty_variance"]
        pen = (dist * dist)[None, None, :, :] / (2.0 * var * var)[None, :, None, None]
        return pen
    return None


def mha(
    params,
    cfg: MHAConfig,
    query,
    key=None,
    value=None,
    key_padding_mask=None,
    attn_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    cache: Optional[Dict[str, Any]] = None,
    cache_index=None,
    static_kv: bool = False,
    need_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[Dict[str, Any]]]:
    """Scaled dot-product MHA.

    Args:
      query: (B, Tq, D). key/value default to query (self-attention).
      key_padding_mask: (B, S) bool, True at pads (reference convention).
      attn_mask: (Tq, S) additive fp32 mask (e.g. causal future mask).
      cache/cache_index: incremental decoding. For self-attention the new
        K/V rows are written at ``cache_index`` and attention runs over the
        full buffer with positions > cache_index masked. For cross-attention
        (static_kv=True) the cache holds precomputed encoder K/V and no
        projection of key/value happens per step.

    Returns (output (B, Tq, D), attn_weights (B, H, Tq, S) or None, new_cache).
    """
    if key is None:
        key = query
    if value is None:
        value = key

    head_dim = cfg.embed_dim // cfg.num_heads
    scaling = head_dim ** -0.5

    q = _split_heads(linear(params["q"], query) * scaling, cfg.num_heads)

    new_cache = None
    if cache is not None and static_kv:
        # cross-attention: cached encoder K/V, computed once by the generator
        k, v = cache["k"].astype(q.dtype), cache["v"].astype(q.dtype)
        new_cache = cache
    else:
        k = _split_heads(linear(params["k"], key), cfg.num_heads)
        v = _split_heads(linear(params["v"], value), cfg.num_heads)
        if cache is not None:
            # write this step's K/V into the preallocated buffer
            k = jax.lax.dynamic_update_slice_in_dim(
                cache["k"].astype(q.dtype), k, cache_index, axis=2
            )
            v = jax.lax.dynamic_update_slice_in_dim(
                cache["v"].astype(q.dtype), v, cache_index, axis=2
            )
            new_cache = {"k": k, "v": v}

    # "causal" sentinel: callers declare intent instead of materializing a
    # (T, T) future mask, so the flash path can skip above-diagonal blocks
    causal = isinstance(attn_mask, str) and attn_mask == "causal"
    dropout_active = (
        not deterministic and cfg.dropout > 0.0 and rng is not None
    )
    from .ring_attention import ring_attention, ring_eligible, ring_scope

    ring = ring_scope()
    if (
        ring is not None
        and cache is None
        and (attn_mask is None or causal)
        and cfg.penalty is None
        and not need_weights
        and ring_eligible(q, k, ring[0].shape[ring[1]])
    ):
        # context-parallel self-attention: the sequence stays sharded over
        # the mesh's seq axis and K/V blocks ride the ring (ppermute) —
        # the full-length (T, S) scores / K/V never materialize per device
        mesh, seq_axis, b_axis = ring
        b, h, tq, hd = q.shape
        s = k.shape[2]
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(
                jnp.float32
            )
        else:
            bias = jnp.zeros((b, s), jnp.float32)
        bias = jnp.repeat(bias, h, axis=0)
        out = ring_attention(
            q.reshape(b * h, tq, hd),
            k.reshape(b * h, s, hd),
            v.reshape(b * h, s, hd),
            bias,
            1.0,  # q is pre-scaled above
            mesh, axis=seq_axis, batch_axis=b_axis, causal=causal,
            dropout_rate=cfg.dropout if dropout_active else 0.0,
            dropout_key=rng.next() if dropout_active else None,
        ).reshape(b, h, tq, hd)
        out = linear(params["out"], _merge_heads(out))
        return out, None, new_cache
    if (
        _flash_eligible_shape(int(k.shape[2]))
        and cache is None
        and (attn_mask is None or causal)
        and cfg.penalty is None
        and not need_weights
        # in-kernel dropout needs the hardware PRNG (the CPU interpreter
        # stubs it) — off-TPU dropout calls take the XLA path
        and (not dropout_active or jax.default_backend() == "tpu")
    ):
        from .pallas.attention_kernel import NEG_INF as FLASH_NEG_INF
        from .pallas.attention_kernel import flash_attention

        b, h, tq, hd = q.shape
        s = k.shape[2]
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask, FLASH_NEG_INF, 0.0).astype(
                jnp.float32
            )
        else:
            bias = jnp.zeros((b, s), jnp.float32)
        bias = jnp.repeat(bias, h, axis=0)  # (B*H, S)
        seed = None
        rate = 0.0
        if dropout_active:
            rate = cfg.dropout
            # derive the in-kernel seed from the raw key bits — a
            # jax.random draw here would put a counter-PRNG op on the hot
            # path of every attention layer just to seed the fast TPU PRNG
            data = jax.random.key_data(rng.next()).reshape(-1)
            seed = (data[:1] ^ data[-1:]).astype(jnp.int32)
        out = flash_attention(
            q.reshape(b * h, tq, hd),
            k.reshape(b * h, s, hd),
            v.reshape(b * h, s, hd),
            bias,
            1.0,  # q is pre-scaled above
            causal=causal,
            dropout_rate=rate,
            dropout_seed=seed,
        ).reshape(b, h, tq, hd)
        out = linear(params["out"], _merge_heads(out))
        return out, None, new_cache

    if causal:
        attn_mask = causal_mask(q.shape[2])

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )

    if cfg.penalty is not None:
        pen = _distance_penalty(params, cfg, q.shape[2], k.shape[2])
        if pen is not None:
            logits = logits - pen

    if attn_mask is not None:
        logits = logits + attn_mask[None, None, :, :].astype(jnp.float32)

    if cache is not None and not static_kv:
        # mask cache positions not yet written (>= cache_index + q_len)
        valid = jnp.arange(k.shape[2]) < (cache_index + q.shape[2])
        logits = jnp.where(valid[None, None, None, :], logits, NEG_INF)

    if key_padding_mask is not None:
        logits = jnp.where(
            key_padding_mask[:, None, None, :], NEG_INF, logits
        )

    if q.dtype == jnp.bfloat16 and jax.default_backend() == "tpu":
        # bf16 softmax BACKWARD (forward stays fp32): the f32 softmax-bwd
        # output fusions were ~1.1 ms of the big step (PERF.md §4, the
        # "compiler-pinned" cost); halving their HBM bytes measured
        # 41.1 -> 38.6 ms on the big config. The incoming gradient already
        # passed through the bf16 P@V matmul, so bwd precision past bf16
        # buys nothing. fp32/CPU runs keep the exact fp32 VJP.
        weights_f32 = _softmax_bf16_bwd(logits)
    else:
        weights_f32 = jax.nn.softmax(logits, axis=-1)
    weights = weights_f32.astype(q.dtype)
    if rng is not None:
        weights = dropout(weights, cfg.dropout, rng, deterministic)

    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = linear(params["out"], _merge_heads(out))

    # head-averaged weights for alignment extraction (reference
    # multihead_attention.py need_weights path)
    attn = weights_f32.mean(axis=1) if need_weights else None
    return out, attn, new_cache


@jax.custom_vjp
def _softmax_bf16_bwd(logits):
    """fp32 softmax with a bf16 residual + backward (see the mha call
    site). The VJP math is the standard p * (g - sum(p*g)) in bf16, cast
    back to the primal's fp32 for the logits einsum."""
    return jax.nn.softmax(logits, axis=-1)


def _softmax_bf16_bwd_fwd(logits):
    p = jax.nn.softmax(logits, axis=-1)
    return p, p.astype(jnp.bfloat16)


def _softmax_bf16_bwd_bwd(p16, g):
    g16 = g.astype(jnp.bfloat16)
    dot = jnp.sum(p16 * g16, axis=-1, keepdims=True)
    return ((p16 * (g16 - dot)).astype(jnp.float32),)


_softmax_bf16_bwd.defvjp(_softmax_bf16_bwd_fwd, _softmax_bf16_bwd_bwd)


def precompute_cross_cache(params, cfg: MHAConfig, encoder_out) -> Dict[str, Any]:
    """Project encoder output to K/V once before the decode loop
    (the reference's static_kv prev_key/prev_value fast path)."""
    k = _split_heads(linear(params["k"], encoder_out), cfg.num_heads)
    v = _split_heads(linear(params["v"], encoder_out), cfg.num_heads)
    return {"k": k, "v": v}


def causal_mask(size: int, dtype=jnp.float32):
    """Additive future mask (reference buffered_future_mask)."""
    return jnp.triu(jnp.full((size, size), NEG_INF, dtype), k=1)
