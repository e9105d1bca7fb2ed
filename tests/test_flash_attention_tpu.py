"""On-chip flash-attention validations (compiled Mosaic path).

The CPU suite exercises the kernels through the interpreter; these checks
require the real hardware — the compiled lowering, the MXU precision
behavior, and above all the TPU PRNG that the interpreter stubs to zeros
(in-kernel attention dropout). They are exactly the round-3 bring-up
checks, persisted so a TPU-backed run catches regressions.

Run with the default (axon/TPU) backend:
    JAX_PLATFORMS='' python -m pytest tests/test_flash_attention_tpu.py -q
(the suite's conftest pins CPU; this module overrides it back when a TPU
is actually present).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU backend (conftest pins the suite to CPU)",
)


def _setup(bh=8, t=256, d=64, pad_tail=19):
    from fbk_fairseq_st_tpu.ops.pallas.attention_kernel import (
        _xla_reference,
        flash_attention,
    )

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    bias = np.zeros((bh, t), np.float32)
    bias[:, -pad_tail:] = -1e9
    return flash_attention, _xla_reference, q, k, v, jnp.asarray(bias)


@pytest.mark.parametrize("causal", [False, True])
def test_compiled_fwd_bwd_match_xla(causal):
    flash, ref, q, k, v, bias = _setup()

    def hi_ref(*a, **kw):
        with jax.default_matmul_precision("highest"):
            return ref(*a, **kw)

    got = np.asarray(flash(q, k, v, bias, 0.125, causal=causal))
    want = np.asarray(hi_ref(q, k, v, bias, 0.125, causal=causal))
    assert np.abs(got - want).max() < 5e-6

    g1 = jax.grad(
        lambda q, k, v: (flash(q, k, v, bias, 0.125,
                               causal=causal) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: (hi_ref(q, k, v, bias, 0.125,
                                causal=causal) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(b)).max() + 1e-9
        )
        assert rel < 2e-4


def test_in_kernel_dropout_deterministic_and_consistent():
    """Per-seed determinism, cross-seed variation, and — the load-bearing
    property — identical masks in forward and backward, verified via
    linearity in V (out is linear in v for a FIXED mask, so the VJP dotted
    with a direction must equal the exact finite difference)."""
    flash, _, q, k, v, bias = _setup()
    seed = jnp.asarray(1234, jnp.int32)

    def f(vv, s=seed):
        return flash(q, k, vv, bias, 0.125, causal=True,
                     dropout_rate=0.3, dropout_seed=s)

    o1, o2 = np.asarray(f(v)), np.asarray(f(v))
    assert np.array_equal(o1, o2)
    o3 = np.asarray(f(v, s=jnp.asarray(99, jnp.int32)))
    assert not np.array_equal(o1, o3)

    dv = jnp.asarray(
        np.random.RandomState(7).randn(*v.shape).astype(np.float32)
    )
    lin = np.asarray(f(v + dv)) - np.asarray(f(v))
    gv = jax.grad(lambda vv: f(vv).sum())(v)
    got = float((gv * dv).sum())
    want = float(lin.sum())
    assert abs(got - want) / (abs(want) + 1e-9) < 1e-5


def test_dropout_rate_and_mean():
    flash, _, q, k, v, bias = _setup()
    nodrop = np.asarray(flash(q, k, v, bias, 0.125, causal=True))
    outs = [
        np.asarray(
            flash(q, k, v, bias, 0.125, causal=True, dropout_rate=0.3,
                  dropout_seed=jnp.asarray(s, jnp.int32))
        )
        for s in range(24)
    ]
    mean = np.mean(outs, axis=0)
    # slow statistical convergence — this is a sanity band, not a proof
    assert np.abs(mean - nodrop).max() / np.abs(nodrop).max() < 0.35


def test_compiled_unaligned_shapes():
    """Tile-unaligned T/S through the real Mosaic lowering: the wrapper's
    128-padding must keep values and grads equal to the dense path on the
    compiled kernels, not just in the interpreter."""
    flash, ref, *_ = _setup()
    rng = np.random.RandomState(3)
    bh, t, s, d = 4, 130, 130, 64
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    bias = np.zeros((bh, s), np.float32)
    bias[:, -7:] = -1e9
    bias = jnp.asarray(bias)

    def hi_ref(*a, **kw):
        with jax.default_matmul_precision("highest"):
            return ref(*a, **kw)

    for causal in (False, True):
        got = np.asarray(flash(q, k, v, bias, 0.125, causal=causal))
        want = np.asarray(hi_ref(q, k, v, bias, 0.125, causal=causal))
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 5e-6

        g1 = jax.grad(
            lambda q, k, v: (flash(q, k, v, bias, 0.125,
                                   causal=causal) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        g2 = jax.grad(
            lambda q, k, v: (hi_ref(q, k, v, bias, 0.125,
                                    causal=causal) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g1, g2):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
                np.abs(np.asarray(b)).max() + 1e-9
            )
            assert rel < 2e-4
