"""Functional building blocks: params-as-pytrees, explicit RNG, bf16 policy.

Design: every module is an ``init_*(key, ...) -> params`` plus an
``apply``-style pure function. Params are nested dicts of jnp arrays stored
in fp32; compute runs in the caller-chosen dtype (bfloat16 on TPU for MXU
throughput), with LayerNorm statistics and softmax always in fp32.

Linear weights use the JAX (in, out) layout — ``y = x @ W + b`` — so matmuls
map directly onto the MXU without transposes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# A large-but-finite negative for masked logits. Using -inf in bf16 softmax
# can produce NaNs when an entire row is masked; this matches XLA best
# practice and keeps fully-masked rows at uniform-after-softmax.
NEG_INF = -1e9


class RngStream:
    """Hands out fresh PRNG keys from one root key.

    Trace-time Python state: the fold-in counter advances deterministically
    per call site order, so usage inside jit is reproducible.
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._count = 0

    def next(self) -> jax.Array:
        assert self._key is not None, "RNG required but none provided"
        k = jax.random.fold_in(self._key, self._count)
        self._count += 1
        return k

    @property
    def active(self) -> bool:
        return self._key is not None


def xavier_uniform(key, shape, dtype=jnp.float32, gain: float = 1.0):
    fan_in, fan_out = shape[-2], shape[-1]
    if len(shape) > 2:  # conv kernels: receptive field multiplies fans
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in *= receptive
        fan_out *= receptive
    limit = gain * (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key, shape, std, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def init_linear(key, in_dim: int, out_dim: int, bias: bool = True):
    """Xavier-uniform weight + zero bias (reference conv_transformer.py
    Linear helper :371-376)."""
    p = {"w": xavier_uniform(key, (in_dim, out_dim))}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def pq_reconstruct(codes, centroids, dtype):
    """Rebuild a product-quantized (out, in) weight from its codebook.

    ``codes``: (n_blocks, out) centroid indices stored as float32 (exact
    ints; float keeps the param tree uniformly differentiable — the
    float->int cast below has a structurally-zero gradient, so training
    only moves the centroids, exactly the reference's iPQ semantics where
    assignments are frozen and centroids learn,
    fairseq/modules/quantization/pq/modules/qlinear.py).
    ``centroids``: (n_centroids, block_size)."""
    w = centroids.astype(dtype)[codes.astype(jnp.int32)]
    n_blocks, out, block = w.shape
    return jnp.transpose(w, (1, 0, 2)).reshape(out, n_blocks * block)


def weight_of(p, dtype):
    """Materialize a linear weight, dequantizing weight-only int8 storage.

    Weight-only quantized layers (quantization/weight_only.py) carry
    ``w_q`` (int8) + ``w_scale`` (fp32 per-output-channel) instead of
    ``w``. The dequant sits at the use site so XLA fuses int8->bf16
    convert + scale into the matmul operand read instead of
    materializing a full-precision copy; the optimization_barrier keeps
    the compiler from hoisting/CSE-ing the dequant in generator loops,
    which measured 30% slower at small batch without it (PERF.md §6).

    In-training product-quantized layers (quantization/quantizer.py,
    --quantization-config-path) carry ``w_codes`` + ``w_centroids``; the
    reconstruction at the use site keeps gradients flowing to the
    centroids only."""
    if "w_q" in p:
        wq, scale = jax.lax.optimization_barrier((p["w_q"], p["w_scale"]))
        return wq.astype(dtype) * scale.astype(dtype)
    if "w_codes" in p:
        # linear storage layout is (in, out); PQ blocks the input dim
        return pq_reconstruct(p["w_codes"], p["w_centroids"], dtype).T
    return p["w"].astype(dtype)


def linear(p, x):
    y = x @ weight_of(p, x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# LayerNorm (stats in fp32 regardless of compute dtype)
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def init_embedding(key, num_embeddings: int, dim: int, padding_idx: Optional[int] = None):
    """N(0, d^-0.5) with zeroed padding row (reference Embedding helper)."""
    w = normal_init(key, (num_embeddings, dim), std=dim ** -0.5)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def embedding_table(p, dtype=None):
    """The (num_embeddings, dim) table, reconstructing PQ storage (codes
    block the embedding dim, reference qemb.py) when present."""
    if "w_codes" in p:
        return pq_reconstruct(
            p["w_codes"], p["w_centroids"],
            dtype or p["w_centroids"].dtype,
        )
    w = p["w"]
    if dtype is not None:
        w = w.astype(dtype)
    return w


def embedding(p, ids, dtype=None):
    return jnp.take(embedding_table(p, dtype), ids, axis=0)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(x, rate: float, rng: RngStream, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    if jax.default_backend() == "tpu":
        # u8 random bits instead of bernoulli's u32 draw: 4x fewer RNG
        # bytes through HBM (rng-bit-generator + its layout copy were ~8%
        # of the big-config step, PERF.md) while staying inside XLA fusion
        # (a standalone fused dropout KERNEL measured slower — the fusion
        # barrier costs more than the bandwidth it saves). The keep rate
        # quantizes to ceil(rate*256)/256 — within 0.4% of nominal.
        bits = jax.random.bits(rng.next(), x.shape, dtype=jnp.uint8)
        thresh = min(int(rate * 256.0 + 0.999), 255) if rate > 0 else 0
        mask = bits >= jnp.uint8(thresh)
    else:
        mask = jax.random.bernoulli(rng.next(), keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "gelu_accurate": lambda x: jax.nn.gelu(x, approximate=True),
    "tanh": jnp.tanh,
    "linear": lambda x: x,
    "glu": lambda x: jax.nn.glu(x, axis=-1),
}


def get_activation(name: str):
    if name not in ACTIVATIONS:
        raise KeyError(f"unknown activation {name!r}")
    return ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# BatchNorm (stateful running stats, threaded functionally)
# ---------------------------------------------------------------------------

def init_batch_norm(dim: int):
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def init_batch_norm_state(dim: int):
    return {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def batch_norm(
    p,
    state,
    x,
    axis: Tuple[int, ...],
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    stats_from=None,
):
    """BatchNorm over *axis* (channel axis excluded). Returns (y, new_state).

    Matches torch.nn.BatchNorm2d semantics: biased variance for
    normalization, unbiased for the running estimate, running stats updated
    with ``(1-momentum)*old + momentum*batch``.

    ``stats_from``: optional tensor to compute the batch statistics from
    instead of ``x`` (same rank/axis convention). Used by the chunked conv
    frontend, where ``x`` carries duplicated halo rows that must be
    normalized but must not bias the statistics — stats come from the
    center slice, which holds every logical position exactly once.
    """
    xf = x.astype(jnp.float32)
    if training:
        sf = xf if stats_from is None else stats_from.astype(jnp.float32)
        # one-pass statistics: mean and E[x^2] are independent reductions
        # XLA fuses into a single read of the activation, where the
        # two-pass (x - mean)^2 formulation forces a second full pass
        # (sequential dependency on mean). fp32 accumulators; post-relu
        # conv activations are O(1) so the cancellation in
        # E[x^2] - mean^2 costs ~1e-6 relative — measured against the
        # two-pass form in tests (torch-equivalence suite unaffected).
        mean = jnp.mean(sf, axis=axis)
        meansq = jnp.mean(jnp.square(sf), axis=axis)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        n = 1
        for a in axis:
            n *= sf.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    shape = [1] * x.ndim
    caxis = [a for a in range(x.ndim) if a not in axis]
    assert len(caxis) == 1
    shape[caxis[0]] = -1
    y = (xf - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    y = y * p["scale"].reshape(shape) + p["bias"].reshape(shape)
    return y.astype(x.dtype), new_state


def lengths_to_padding_mask(lengths, max_len: int):
    """True at padded positions — the reference's encoder_padding_mask
    convention (conv_transformer.py:293-300)."""
    positions = jnp.arange(max_len)[None, :]
    return positions >= lengths[:, None]
