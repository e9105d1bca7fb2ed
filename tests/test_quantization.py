"""Quantization: scalar int8 emulation, iPQ, quant-noise (reference
fairseq/modules/quantization role)."""

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu.quantization import (
    PQ,
    emulate_int,
    fake_quantize_params,
    quant_noise,
    quantize_params_pq,
)
from fbk_fairseq_st_tpu.quantization.scalar import fake_quantize


def test_emulate_int8_tensor_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, scale, zp = emulate_int(w, bits=8, method="tensor")
    assert q.shape == w.shape
    # quantization error bounded by one step
    assert float(jnp.max(jnp.abs(q - w))) <= float(scale) + 1e-6
    # at most 256 distinct values
    assert len(np.unique(np.asarray(q))) <= 256


def test_emulate_int8_channel():
    rng = np.random.RandomState(1)
    w = jnp.asarray((rng.randn(32, 16) * ([1, 100] * 8)).astype(np.float32))
    q, scale, _ = emulate_int(w, bits=8, method="channel")
    # per-channel scales differ by the channel magnitudes
    s = np.asarray(scale)
    assert s.shape == (16,)
    assert s[1] > 10 * s[0]
    err = np.abs(np.asarray(q - w))
    assert (err <= s[None, :] + 1e-5).all()


def test_fake_quantize_ste_gradient():
    w = jnp.asarray(np.linspace(-1, 1, 64, dtype=np.float32).reshape(8, 8))

    def loss(w):
        return jnp.sum(fake_quantize(w) ** 2)

    g = jax.grad(loss)(w)
    # straight-through: gradient flows (≈ 2*q, nonzero almost everywhere)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_fake_quantize_params_skips_small():
    params = {
        "w": jnp.asarray(np.random.RandomState(0).randn(64, 64), jnp.float32),
        "b": jnp.zeros(64),
    }
    q = fake_quantize_params(params, min_size=256)
    assert len(np.unique(np.asarray(q["w"]))) <= 256
    np.testing.assert_array_equal(np.asarray(q["b"]), np.asarray(params["b"]))


def test_pq_reconstruction():
    rng = np.random.RandomState(0)
    # low-rank-ish matrix quantizes well
    w = (rng.randn(64, 4) @ rng.randn(4, 32)).astype(np.float32)
    pq = PQ(w, block_size=8, n_centroids=32, n_iter=10, seed=0)
    pq.encode()
    rec = pq.decode()
    assert rec.shape == w.shape
    rel = np.linalg.norm(rec - w) / np.linalg.norm(w)
    assert rel < 0.5
    # objective decreases
    assert pq.objective[-1] <= pq.objective[0] + 1e-5
    # codebook is the claimed size
    assert pq.centroids.shape == (32, 8)


def test_quantize_params_pq_tree():
    rng = np.random.RandomState(0)
    params = {
        "layer": {
            "w": jnp.asarray(rng.randn(64, 128).astype(np.float32)),
            "b": jnp.zeros(128),
        }
    }
    newp, books = quantize_params_pq(
        params, block_size=8, n_centroids=16, n_iter=5, min_size=1024
    )
    assert newp["layer"]["w"].shape == (64, 128)
    assert list(books) == ["layer/w"]
    assert books["layer/w"]["centroids"].shape == (16, 8)
    # compression: 16*8 floats + assignments << 64*128 floats
    np.testing.assert_array_equal(
        np.asarray(newp["layer"]["b"]), np.asarray(params["layer"]["b"])
    )


def test_quant_noise():
    key = jax.random.PRNGKey(0)
    w = jnp.ones((16, 64))
    out = quant_noise(key, w, p=0.5, block_size=8)
    a = np.asarray(out)
    # values are 0 (dropped) or 2.0 (rescaled)
    assert set(np.unique(a).tolist()) <= {0.0, 2.0}
    # zeros come in whole blocks of 8
    zero_blocks = (a.reshape(16, 8, 8) == 0).all(axis=2)
    partial = ((a.reshape(16, 8, 8) == 0).any(axis=2) & ~zero_blocks)
    assert not partial.any()
    # eval mode: identity
    np.testing.assert_array_equal(
        np.asarray(quant_noise(key, w, 0.5, 8, deterministic=True)),
        np.asarray(w),
    )
