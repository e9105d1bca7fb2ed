"""Monotonic multihead attention (MMA) for simultaneous translation.

Counterpart of examples/simultaneous_translation/modules/
monotonic_multihead_attention.py:26-590 (Ma et al. 2020, "Monotonic
Multihead Attention"), --simul-type variants:

  * ``hard_aligned`` (MMA-H): expected attention beta == expected alignment
    alpha (:455-463);
  * ``infinite_lookback`` (MMA-IL): soft attention over the prefix up to the
    expected alignment, computed with the cumulative "milk" trick
    (:466-541);
  * ``waitk``: deterministic diagonal p_choose with lagging k (:544-590).

TPU design: batch-first (B, T, D) like the rest of this framework; the
per-target-step expected-alignment recurrence (reference :98-147) is a
``lax.scan`` over the target axis (a true sequential dependence — the
reference also loops); everything else is batched matmul / cumsum, which
XLA fuses. Training-time discreteness noise uses the functional RNG.
The stepwise inference policy (expected_alignment_infer :150-262) is a
host-driven read/write loop in the SimulEval-style agent, out of the jitted
path by nature (it interacts with an external text stream).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .core import NEG_INF, RngStream, dropout, init_linear, linear

# mirrors the reference's --simul-type registry
# (examples/simultaneous_translation/modules/__init__.py:10-14)
MONOTONIC_ATTENTION = ("hard_aligned", "infinite_lookback", "waitk")


class MonotonicAttentionConfig(NamedTuple):
    embed_dim: int
    num_heads: int
    simul_type: str = "hard_aligned"  # 'hard_aligned'|'infinite_lookback'|'waitk'
    dropout: float = 0.0
    mass_preservation: bool = True
    noise_mean: float = 0.0
    noise_var: float = 1.0
    energy_bias: bool = False
    energy_bias_init: float = -2.0
    eps: float = 1e-6
    waitk_lagging: int = 0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def add_monotonic_args(parser):
    """reference monotonic_multihead_attention.py:44-63 + waitk :556-563."""
    parser.add_argument("--simul-type", type=str, default=None,
                        choices=sorted(MONOTONIC_ATTENTION),
                        help="monotonic attention variant")
    parser.add_argument("--no-mass-preservation", action="store_false",
                        dest="mass_preservation",
                        help="Do not stay on the last token when decoding")
    parser.add_argument("--mass-preservation", action="store_true",
                        dest="mass_preservation",
                        help="Stay on the last token when decoding")
    parser.set_defaults(mass_preservation=True)
    parser.add_argument("--noise-var", type=float, default=1.0)
    parser.add_argument("--noise-mean", type=float, default=0.0)
    parser.add_argument("--energy-bias", action="store_true", default=False)
    parser.add_argument("--energy-bias-init", type=float, default=-2.0)
    parser.add_argument("--attention-eps", type=float, default=1e-6)
    parser.add_argument("--waitk-lagging", type=int, default=0,
                        help="Wait-k lagging (required for --simul-type waitk)")


def init_monotonic_attention(key, cfg: MonotonicAttentionConfig) -> Dict[str, Any]:
    kq, kk, kv, ko, ksq, ksk = jax.random.split(key, 6)
    p: Dict[str, Any] = {
        "q": init_linear(kq, cfg.embed_dim, cfg.embed_dim),
        "k": init_linear(kk, cfg.embed_dim, cfg.embed_dim),
        "v": init_linear(kv, cfg.embed_dim, cfg.embed_dim),
        "out": init_linear(ko, cfg.embed_dim, cfg.embed_dim),
    }
    if cfg.energy_bias:
        p["energy_bias"] = jnp.full((1,), cfg.energy_bias_init, jnp.float32)
    if cfg.simul_type == "infinite_lookback":
        # separate soft-attention projections (:472-486); waitk shares the
        # monotonic ones (:547-549)
        p["q_soft"] = init_linear(ksq, cfg.embed_dim, cfg.embed_dim)
        p["k_soft"] = init_linear(ksk, cfg.embed_dim, cfg.embed_dim)
    return p


def _split_heads(x, num_heads):
    b, t, d = x.shape
    h = d // num_heads
    return x.reshape(b, t, num_heads, h).transpose(0, 2, 1, 3).reshape(
        b * num_heads, t, h
    )


def _energy(params, cfg, query, key, key_padding_mask, soft: bool):
    """(BH, Tq, S) fp32 attention energies (reference attn_energy :71-96)."""
    qn = "q_soft" if soft and "q_soft" in params else "q"
    kn = "k_soft" if soft and "k_soft" in params else "k"
    q = _split_heads(linear(params[qn], query), cfg.num_heads)
    q = q * (cfg.head_dim ** -0.5)
    k = _split_heads(linear(params[kn], key), cfg.num_heads)
    e = jnp.einsum("bqh,bkh->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
    if "energy_bias" in params:
        e = e + params["energy_bias"].astype(jnp.float32)
    if key_padding_mask is not None:
        # finite NEG_INF, not -inf: all-pad dummy rows (fixed-shape batch
        # fill) would otherwise produce -inf - -inf = NaN in the max-shift;
        # exp/sigmoid underflow to exactly 0 either way
        kpm = jnp.repeat(key_padding_mask, cfg.num_heads, axis=0)
        e = jnp.where(kpm[:, None, :], NEG_INF, e)
    return e


def p_choose(params, cfg: MonotonicAttentionConfig, query, key,
             key_padding_mask=None, rng: Optional[RngStream] = None,
             deterministic: bool = True):
    """Stepwise read/write probability (BH, T, S).

    hard_aligned / infinite_lookback: sigmoid(energy + noise) (:419-453);
    waitk: the deterministic diagonal band (:565-590)."""
    b, t, _ = query.shape
    s = key.shape[1]
    if cfg.simul_type == "waitk":
        assert cfg.waitk_lagging > 0, "waitk requires --waitk-lagging > 0"
        rows = jnp.arange(t)[:, None]
        cols = jnp.arange(s)[None, :]
        band = (cols == rows + cfg.waitk_lagging - 1).astype(jnp.float32)
        pc = jnp.broadcast_to(band[None], (b, t, s))
        return jnp.repeat(pc, cfg.num_heads, axis=0)
    e = _energy(params, cfg, query, key, key_padding_mask, soft=False)
    if not deterministic and rng is not None and rng._key is not None:
        noise = cfg.noise_mean + cfg.noise_var * jax.random.normal(
            rng.next(), e.shape, jnp.float32
        )
        e = e + noise
    # sigmoid(NEG_INF) underflows to 0 at padded keys, matching the reference
    return jax.nn.sigmoid(e)


def expected_alignment_train(pc, eps: float, mass_preservation: bool):
    """Expected alignment alpha via the parallel cumsum trick with a scan
    over the target axis (reference expected_alignment_train :98-147).

    pc: (BH, T, S) -> alpha (BH, T, S)."""
    bh, t, s = pc.shape
    # exclusive safe cumprod of (1 - p) along the source axis
    log1mp = jnp.log(jnp.clip(1.0 - pc, 0.0) + 1e-10)
    cumprod_1mp = jnp.exp(
        jnp.concatenate(
            [jnp.zeros((bh, t, 1), pc.dtype), jnp.cumsum(log1mp, axis=2)[:, :, :-1]],
            axis=2,
        )
    )
    cumprod_clamp = jnp.clip(cumprod_1mp, eps, 1.0)

    init = jnp.zeros((bh, s), pc.dtype).at[:, 0].set(1.0)

    def step(prev_alpha, xs):
        pc_i, cp_i, cpc_i = xs  # each (BH, S)
        alpha_i = jnp.clip(
            pc_i * cp_i * jnp.cumsum(prev_alpha / cpc_i, axis=1), 0.0, 1.0
        )
        return alpha_i, alpha_i

    _, alphas = jax.lax.scan(
        step,
        init,
        (
            pc.transpose(1, 0, 2),
            cumprod_1mp.transpose(1, 0, 2),
            cumprod_clamp.transpose(1, 0, 2),
        ),
    )
    alpha = alphas.transpose(1, 0, 2)  # (BH, T, S)
    if mass_preservation:
        resid = 1.0 - jnp.clip(jnp.sum(alpha[:, :, :-1], axis=2), 0.0, 1.0)
        alpha = jnp.concatenate([alpha[:, :, :-1], resid[:, :, None]], axis=2)
    return alpha


def expected_attention_infinite_lookback(
    params, cfg: MonotonicAttentionConfig, alpha, query, key,
    key_padding_mask, rng: Optional[RngStream], deterministic: bool,
):
    """MMA-IL beta (reference :489-541): soft attention renormalized over
    the prefix weighted by the alignment mass."""
    e = _energy(params, cfg, query, key, key_padding_mask, soft=True)
    e = e - jnp.max(e, axis=2, keepdims=True)
    exp_e = jnp.exp(e)
    cum = jnp.cumsum(exp_e, axis=2)
    if key_padding_mask is not None:
        kpm = jnp.repeat(key_padding_mask, cfg.num_heads, axis=0)
        cum = jnp.where(kpm[:, None, :], cfg.eps, cum)
    inner = alpha / cum
    beta = exp_e * jnp.flip(jnp.cumsum(jnp.flip(inner, 2), axis=2), 2)
    beta = dropout(beta, cfg.dropout, rng or RngStream(None), deterministic)
    return beta


def monotonic_attention(
    params,
    cfg: MonotonicAttentionConfig,
    query,
    key,
    value,
    key_padding_mask=None,
    rng: Optional[RngStream] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full-sequence (training) MMA forward.

    query: (B, T, D); key/value: (B, S, D). Returns (attn (B, T, D),
    {'alpha','beta','p_choose'} each (B, H, T, S))."""
    rng = rng or RngStream(None)
    b, t, d = query.shape
    s = key.shape[1]
    pc = p_choose(params, cfg, query, key, key_padding_mask, rng, deterministic)
    alpha = expected_alignment_train(pc, cfg.eps, cfg.mass_preservation)
    if cfg.simul_type == "hard_aligned":
        beta = alpha
    else:
        beta = expected_attention_infinite_lookback(
            params, cfg, alpha, query, key, key_padding_mask, rng,
            deterministic,
        )
    v = _split_heads(linear(params["v"], value), cfg.num_heads)
    attn = jnp.einsum("bts,bsh->bth", beta.astype(v.dtype), v)
    attn = (
        attn.reshape(b, cfg.num_heads, t, cfg.head_dim)
        .transpose(0, 2, 1, 3)
        .reshape(b, t, d)
    )
    attn = linear(params["out"], attn)
    shape = (b, cfg.num_heads, t, s)
    return attn, {
        "alpha": alpha.reshape(shape),
        "beta": beta.reshape(shape),
        "p_choose": pc.reshape(shape),
    }
