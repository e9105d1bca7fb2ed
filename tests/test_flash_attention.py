"""Pallas flash attention: numeric equivalence with the dense softmax path
(interpret mode on CPU) and integration through mha()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbk_fairseq_st_tpu.ops.attention import (
    MHAConfig,
    init_mha,
    mha,
    set_flash_attention,
)
from fbk_fairseq_st_tpu.ops.pallas.attention_kernel import (
    _xla_reference,
    flash_attention,
)


def make_qkv(bh=4, t=16, s=24, d=8, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    mask = np.zeros((bh, s), np.float32)
    mask[:, -5:] = -1e9  # padded tail
    return q, k, v, jnp.asarray(mask)


def test_flash_matches_dense():
    q, k, v, bias = make_qkv()
    got = flash_attention(q, k, v, bias, 0.5)
    want = _xla_reference(q, k, v, bias, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_grads_match_dense():
    q, k, v, bias = make_qkv(bh=2, t=8, s=8, d=4)

    def f_flash(q, k, v):
        return flash_attention(q, k, v, bias, 0.7).sum()

    def f_dense(q, k, v):
        return _xla_reference(q, k, v, bias, 0.7).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_mha_flash_path_equivalence():
    cfg = MHAConfig(embed_dim=16, num_heads=2)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 12, 16).astype(np.float32))
    kpm = jnp.asarray(
        np.arange(12)[None, :] >= np.array([12, 9, 7])[:, None]
    )
    base, _, _ = mha(params, cfg, x, key_padding_mask=kpm)
    set_flash_attention(True)
    try:
        fused, _, _ = mha(params, cfg, x, key_padding_mask=kpm)
    finally:
        set_flash_attention(False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), rtol=2e-5, atol=2e-5
    )


def test_mha_flash_respects_exclusions():
    """Causal masks / caches / need_weights fall back to the dense path."""
    from fbk_fairseq_st_tpu.ops.attention import causal_mask

    cfg = MHAConfig(embed_dim=16, num_heads=2)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, 16).astype(np.float32))
    set_flash_attention(True)
    try:
        causal, attn, _ = mha(
            params, cfg, x, attn_mask=causal_mask(6), need_weights=True
        )
    finally:
        set_flash_attention(False)
    assert attn is not None  # dense path ran (flash returns no weights)
