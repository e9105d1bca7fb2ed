"""Convolutional audio frontend: strided 2-D convs + 2-D conv attention.

Functional counterpart of the reference encoder frontend
(examples/speech_recognition/models/conv_transformer.py:204-222 and
modules/conv_attention_2d.py). Layout is NHWC — (B, T, F, C) — the
TPU-native convolution layout, vs the reference's NCHW.

Semantics preserved:
  * each conv has stride 2 on both time and freq; odd kernels get symmetric
    k//2 padding (so T' = ceil(T/2) for k=3);
  * activation BEFORE BatchNorm (conv_transformer.py:212 —
    ``bn(activation(x))``), then dropout with rate max(dropout, 0.1);
  * source lengths update as ceil(len/2) per conv (conv_transformer.py:213);
  * ConvAttention2D: q/k/v from one 3x3 conv (embed_dim -> 3*heads
    channels), BN+relu each, time-attention (contract F) with padding mask
    and freq-attention (contract T), concatenated over heads and fused by a
    3x3 output conv + BN + relu; q scaled by embed_dim**-0.5 (the reference
    keeps head_dim == embed_dim, conv_attention_2d.py:22-24).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .attention import _flash_eligible_shape, _softmax_bf16_bwd
from .core import (
    NEG_INF,
    RngStream,
    batch_norm,
    dropout,
    get_activation,
    init_batch_norm,
    init_batch_norm_state,
    normal_init,
)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _attn_softmax(logits, out_dtype):
    """fp32 softmax; when the surrounding compute is bf16 on TPU, the
    backward runs in bf16 via the shared custom_vjp (same gate and
    rationale as mha() — PERF.md §4: the incoming cotangent has already
    passed through a bf16 matmul, so an fp32 VJP buys nothing but HBM
    bytes; at long context these (T, T) softmax-bwd fusions are ~5 ms of
    the step)."""
    if out_dtype == jnp.bfloat16 and jax.default_backend() == "tpu":
        return _softmax_bf16_bwd(logits)
    return jax.nn.softmax(logits, axis=-1)


class ConvFrontendConfig(NamedTuple):
    # ((out_channels, k_time, k_freq), ...) — reference encoder_convolutions
    convolutions: Tuple[Tuple[int, int, int], ...] = ((64, 3, 3), (64, 3, 3))
    audio_features: int = 40
    dropout: float = 0.3
    activation: str = "relu"
    attn_2d: bool = True
    attn_2d_heads: int = 4
    stride: int = 2

    @property
    def out_channels(self) -> int:
        return self.convolutions[-1][0]

    @property
    def flat_dim(self) -> int:
        """C * ceil(F / stride^n) — input dim of the fc3 projection."""
        f = self.audio_features
        for _ in self.convolutions:
            f = math.ceil(f / self.stride)
        return f * self.out_channels

    def out_length(self, t: int) -> int:
        for _ in self.convolutions:
            t = math.ceil(t / self.stride)
        return t


def _init_conv2d(key, k_t: int, k_f: int, c_in: int, c_out: int, dropout_p: float):
    """Reference Conv2D init: N(0, sqrt(4*(1-dropout)/(k_t*c_in)))
    (conv_transformer.py:348-355)."""
    std = math.sqrt((4.0 * (1.0 - dropout_p)) / (k_t * c_in))
    return {
        "w": normal_init(key, (k_t, k_f, c_in, c_out), std=std),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def init_conv_frontend(key, cfg: ConvFrontendConfig):
    ks = jax.random.split(key, len(cfg.convolutions) + 2)
    params: Dict[str, Any] = {"convs": [], "bns": []}
    state: Dict[str, Any] = {"bns": []}
    c_in = 1
    for i, (c_out, k_t, k_f) in enumerate(cfg.convolutions):
        params["convs"].append(_init_conv2d(ks[i], k_t, k_f, c_in, c_out, cfg.dropout))
        params["bns"].append(init_batch_norm(c_out))
        state["bns"].append(init_batch_norm_state(c_out))
        c_in = c_out
    if cfg.attn_2d:
        a1, a2 = jax.random.split(ks[-1])
        params["attn_2d"] = [
            init_conv_attention_2d(a1, c_in, cfg.attn_2d_heads),
            init_conv_attention_2d(a2, c_in, cfg.attn_2d_heads),
        ]
        state["attn_2d"] = [
            init_conv_attention_2d_state(cfg.attn_2d_heads, c_in),
            init_conv_attention_2d_state(cfg.attn_2d_heads, c_in),
        ]
    return params, state


# Batch-time rechunking of the conv pipeline for long-context inputs.
# At the longcontext-train shapes (B=8, T=8192) the frontend tensors put
# the tiny batch dim where the (8, 128) vector tiling wants a big one —
# profiled 18.5 ms fwd+bwd vs 13.8 ms for the SAME ops at (128, 520)
# (PERF.md r5). Folding haloed time chunks into the batch axis runs every
# conv/BN/dropout at the lane-friendly shape; the transform is exact:
#   * halo = stride^n input frames per side gives every center output row
#     its full receptive field (radius 2^n - 1 for n stride-2 k=3 convs);
#   * BN statistics come from the center slice only (each logical position
#     exactly once — batch_norm(stats_from=...));
#   * the first/last chunk's halo rows are re-zeroed before each later
#     conv to reproduce the unchunked conv's output-level zero padding at
#     the global sequence edges;
#   * interior-chunk level-l halo rows recompute real neighbor values, so
#     no cross-chunk masking is needed there.
# Only dropout differs (halo rows draw independent masks — random either
# way); eval/deterministic outputs are bit-comparable to the unchunked
# path (tests/test_conv_frontend_chunked.py).
_CHUNK_LEN = 512
_CHUNK_MIN_T = 2048


def _chunk_eligible(cfg: ConvFrontendConfig, t: int) -> bool:
    return (
        t >= _CHUNK_MIN_T
        and t % _CHUNK_LEN == 0
        and cfg.stride == 2
        and all(k_t == 3 for _, k_t, _ in cfg.convolutions)
        and 2 ** len(cfg.convolutions) <= _CHUNK_LEN
    )


def _conv_pipeline_chunked(params, state, cfg, x, rng, deterministic,
                           training, act):
    """x: (B, T, F, 1), T % _CHUNK_LEN == 0. Returns (y (B, T', F', C),
    bn_states) with y identical (up to dropout draws) to the unchunked
    loop in conv_frontend."""
    b, t, f, _ = x.shape
    n = len(cfg.convolutions)
    L = _CHUNK_LEN
    H = 2 ** n  # input-level halo per side (receptive radius 2^n - 1)
    n_chunks = t // L

    xp = jnp.pad(x, ((0, 0), (H, H), (0, 0), (0, 0)))
    chunks = jnp.stack(
        [xp[:, c * L: c * L + L + 2 * H] for c in range(n_chunks)], axis=1
    )  # (B, n_chunks, L + 2H, F, 1)
    y = chunks.reshape(b * n_chunks, L + 2 * H, f, 1)

    bn_states = []
    for i, (c_out, k_t, k_f) in enumerate(cfg.convolutions):
        h_l = H >> i       # halo rows at this level
        if i > 0:
            # zero the first/last chunk's out-of-range halo rows: the
            # unchunked conv sees output-level zero padding at the global
            # sequence edges, not values computed from padded inputs
            rows = jnp.arange(y.shape[1])
            first = (jnp.arange(b * n_chunks) % n_chunks) == 0
            last = (jnp.arange(b * n_chunks) % n_chunks) == n_chunks - 1
            kill = (
                (first[:, None] & (rows[None, :] < h_l))
                | (last[:, None] & (rows[None, :] >= y.shape[1] - h_l))
            )
            y = jnp.where(kill[:, :, None, None], 0.0, y).astype(y.dtype)
        pad_f = (
            (k_f // 2, k_f // 2) if k_f % 2 == 1
            else ((k_f - 1) // 2, k_f // 2)
        )
        p = params["convs"][i]
        y = jax.lax.conv_general_dilated(
            y,
            p["w"].astype(y.dtype),
            window_strides=(cfg.stride, cfg.stride),
            padding=((k_t // 2, k_t // 2), pad_f),
            dimension_numbers=_DIMNUMS,
        ) + p["b"].astype(y.dtype)
        y = act(y)
        h_next = H >> (i + 1)
        core = L >> (i + 1)
        y, bn_state = batch_norm(
            params["bns"][i], state["bns"][i], y, axis=(0, 1, 2),
            training=training,
            stats_from=y[:, h_next: h_next + core],
        )
        bn_states.append(bn_state)
        y = dropout(y, max(cfg.dropout, 0.1), rng, deterministic)

    h_n = H >> n
    core = L >> n
    y = y[:, h_n: h_n + core]  # (B*n_chunks, L/2^n, F', C)
    return (
        y.reshape(b, n_chunks * core, y.shape[2], y.shape[3]),
        bn_states,
    )


def conv_frontend(
    params,
    state,
    cfg: ConvFrontendConfig,
    x,
    lengths,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    training: bool = False,
):
    """x: (B, T, F) fbank -> (B, T', flat_dim), new lengths, new state.

    T' is the statically known ceil(T / stride^n): fixed input shapes give
    fixed output shapes, keeping the whole encoder one compiled graph.
    """
    act = get_activation(cfg.activation)
    rng = rng or RngStream(None)
    new_state: Dict[str, Any] = {"bns": []}

    x = x[..., None]  # (B, T, F, 1)
    if _chunk_eligible(cfg, x.shape[1]):
        x, bn_states = _conv_pipeline_chunked(
            params, state, cfg, x, rng, deterministic, training, act
        )
        new_state["bns"] = bn_states
        for _ in cfg.convolutions:
            lengths = jnp.ceil(
                lengths.astype(jnp.float32) / cfg.stride
            ).astype(jnp.int32)
    else:
      for i, (c_out, k_t, k_f) in enumerate(cfg.convolutions):
        if k_t % 2 == 1:
            pad_t = (k_t // 2, k_t // 2)
        else:
            pad_t = ((k_t - 1) // 2, k_t // 2)
        if k_f % 2 == 1:
            pad_f = (k_f // 2, k_f // 2)
        else:
            pad_f = ((k_f - 1) // 2, k_f // 2)
        p = params["convs"][i]
        x = jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(cfg.stride, cfg.stride),
            padding=(pad_t, pad_f),
            dimension_numbers=_DIMNUMS,
        ) + p["b"].astype(x.dtype)
        x, bn_state = batch_norm(
            params["bns"][i], state["bns"][i], act(x), axis=(0, 1, 2), training=training
        )
        new_state["bns"].append(bn_state)
        lengths = jnp.ceil(lengths.astype(jnp.float32) / cfg.stride).astype(jnp.int32)
        x = dropout(x, max(cfg.dropout, 0.1), rng, deterministic)

    if cfg.attn_2d:
        new_state["attn_2d"] = []
        t_now = x.shape[1]
        pad_mask = jnp.arange(t_now)[None, :] >= lengths[:, None]
        for blk_params, blk_state in zip(params["attn_2d"], state["attn_2d"]):
            residual = x
            x, s = conv_attention_2d(
                blk_params,
                blk_state,
                cfg.attn_2d_heads,
                x,
                key_padding_mask=pad_mask,
                dropout_p=cfg.dropout,
                rng=rng,
                deterministic=deterministic,
                training=training,
            )
            x = x + residual
            new_state["attn_2d"].append(s)

    b, t, f, c = x.shape
    # (B, T, F, C) -> (B, T, C, F) -> (B, T, C*F): channels-major flattening,
    # matching the reference's view of its (B, C, T, F) tensor.
    x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return x, lengths, new_state


# ---------------------------------------------------------------------------
# ConvAttention2D
# ---------------------------------------------------------------------------

def init_conv_attention_2d(key, embed_dim: int, num_heads: int, bias: bool = True):
    k1, k2 = jax.random.split(key)
    from .core import xavier_uniform

    p = {
        # one packed conv producing q|k|v head channels
        "in_proj_w": xavier_uniform(k1, (3, 3, embed_dim, 3 * num_heads)),
        "out_proj_w": xavier_uniform(k2, (3, 3, 2 * num_heads, embed_dim)),
        "bn_q": init_batch_norm(num_heads),
        "bn_k": init_batch_norm(num_heads),
        "bn_v": init_batch_norm(num_heads),
        "bn_out": init_batch_norm(embed_dim),
    }
    if bias:
        p["in_proj_b"] = jnp.zeros((3 * num_heads,), jnp.float32)
        p["out_proj_b"] = jnp.zeros((embed_dim,), jnp.float32)
    return p


def init_conv_attention_2d_state(num_heads: int, embed_dim: int):
    return {
        "bn_q": init_batch_norm_state(num_heads),
        "bn_k": init_batch_norm_state(num_heads),
        "bn_v": init_batch_norm_state(num_heads),
        "bn_out": init_batch_norm_state(embed_dim),
    }


def conv_attention_2d(
    params,
    state,
    num_heads: int,
    x,
    key_padding_mask=None,
    dropout_p: float = 0.0,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
    training: bool = False,
):
    """x: (B, T, F, C). Self-attention over time and over frequency.

    Returns (out (B, T, F, C), new_state).
    """
    rng = rng or RngStream(None)
    b, t, f, c = x.shape
    scaling = float(c) ** -0.5

    qkv = jax.lax.conv_general_dilated(
        x,
        params["in_proj_w"].astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMNUMS,
    )
    if "in_proj_b" in params:
        qkv = qkv + params["in_proj_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, T, F, H)
    q = q * scaling

    new_state = dict(state)
    outs = {}
    for name, z in (("bn_q", q), ("bn_k", k), ("bn_v", v)):
        z, s = batch_norm(params[name], state[name], z, axis=(0, 1, 2), training=training)
        outs[name] = jax.nn.relu(z)
        new_state[name] = s
    # (B, T, F, H) -> (B, H, T, F)
    q = outs["bn_q"].transpose(0, 3, 1, 2)
    k = outs["bn_k"].transpose(0, 3, 1, 2)
    v = outs["bn_v"].transpose(0, 3, 1, 2)

    # time attention: contract over frequency -> (B, H, T, T). At long
    # context this dense (T, T) batch is the step's largest tensor (e.g.
    # the 8x8192-frame bench config materializes f32(8, 4, 2048, 2048) =
    # 537 MB per block, profiled at ~25 ms/step of bandwidth-bound
    # traffic), so eligible shapes ride the same fused Pallas flash
    # kernel as mha() — F' acts as the head dim, zero-padded to the
    # kernel's 64-lane minimum (zero q/k columns add nothing to QK^T;
    # zero v columns are sliced off the output).
    dropout_active = (
        not deterministic and dropout_p > 0.0 and rng._key is not None
    )
    if (
        _flash_eligible_shape(t)
        and (not dropout_active or jax.default_backend() == "tpu")
    ):
        from .pallas.attention_kernel import NEG_INF as FLASH_NEG_INF
        from .pallas.attention_kernel import flash_attention

        f_pad = max(64, -(-f // 64) * 64)
        qf = q.reshape(b * num_heads, t, f)
        kf = k.reshape(b * num_heads, t, f)
        vf = v.reshape(b * num_heads, t, f)
        if f_pad != f:
            pad = ((0, 0), (0, 0), (0, f_pad - f))
            qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask, FLASH_NEG_INF, 0.0).astype(
                jnp.float32
            )
        else:
            bias = jnp.zeros((b, t), jnp.float32)
        bias = jnp.repeat(bias, num_heads, axis=0)
        seed = None
        rate = 0.0
        if dropout_active:
            rate = dropout_p
            data = jax.random.key_data(rng.next()).reshape(-1)
            seed = (data[:1] ^ data[-1:]).astype(jnp.int32)
        attn_t = flash_attention(
            qf, kf, vf, bias, 1.0, causal=False,
            dropout_rate=rate, dropout_seed=seed,
        )[:, :, :f].reshape(b, num_heads, t, f)
    else:
        wt = jnp.einsum(
            "bhtf,bhsf->bhts", q, k, preferred_element_type=jnp.float32
        )
        if key_padding_mask is not None:
            wt = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, wt)
        wt = _attn_softmax(wt, x.dtype).astype(x.dtype)
        wt = dropout(wt, dropout_p, rng, deterministic)
        attn_t = jnp.einsum("bhts,bhsf->bhtf", wt, v)

    # frequency attention: contract over time -> (B, H, F, F)
    wf = jnp.einsum("bhtf,bhtg->bhfg", q, k, preferred_element_type=jnp.float32)
    wf = _attn_softmax(wf, x.dtype).astype(x.dtype)
    wf = dropout(wf, dropout_p, rng, deterministic)
    attn_f = jnp.einsum("bhfg,bhtg->bhtf", wf, v)

    # concat over heads -> (B, T, F, 2H), fuse with 3x3 conv
    attn = jnp.concatenate([attn_t, attn_f], axis=1).transpose(0, 2, 3, 1)
    out = jax.lax.conv_general_dilated(
        attn,
        params["out_proj_w"].astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMNUMS,
    )
    if "out_proj_b" in params:
        out = out + params["out_proj_b"].astype(x.dtype)
    out, s = batch_norm(
        params["bn_out"], state["bn_out"], out, axis=(0, 1, 2), training=training
    )
    new_state["bn_out"] = s
    return jax.nn.relu(out), new_state
