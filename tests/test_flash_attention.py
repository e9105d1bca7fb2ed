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


def test_flash_causal_matches_dense():
    """Causal flag (block-skipped in the kernel) == dense causal mask."""
    q, k, v, bias = make_qkv(bh=2, t=16, s=16, d=8)
    got = flash_attention(q, k, v, bias, 0.5, causal=True)
    want = _xla_reference(q, k, v, bias, 0.5, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_causal_multiblock():
    """t=s=256 -> 2x2 kv/q blocks at block 128: exercises the grid carry
    (scratch m/l/acc across kv steps) AND the above-diagonal block skip."""
    rng = np.random.RandomState(3)
    bh, t, d = 2, 256, 8
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    bias = np.zeros((bh, t), np.float32)
    bias[:, -17:] = -1e9
    bias = jnp.asarray(bias)
    got = flash_attention(q, k, v, bias, 0.3, causal=True)
    want = _xla_reference(q, k, v, bias, 0.3, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_causal_grads_match_dense():
    """The fused Pallas backward (dQ + dK/dV kernels) == XLA autodiff of
    the dense formulation, including the causal mask."""
    q, k, v, bias = make_qkv(bh=2, t=8, s=8, d=4)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, bias, 0.7, causal=True) ** 2).sum()

    def f_dense(q, k, v):
        return (_xla_reference(q, k, v, bias, 0.7, causal=True) ** 2).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_flash_grads_multiblock():
    """Backward equivalence across multiple q/kv blocks (grid accumulation
    in both backward kernels)."""
    rng = np.random.RandomState(5)
    bh, t, d = 1, 256, 8
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    bias = jnp.zeros((bh, t), jnp.float32)

    for causal in (False, True):
        def f_flash(q, k, v):
            return (flash_attention(q, k, v, bias, 0.35,
                                    causal=causal) ** 2).sum()

        def f_dense(q, k, v):
            return (_xla_reference(q, k, v, bias, 0.35,
                                   causal=causal) ** 2).sum()

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5)


def test_mha_causal_sentinel_matches_materialized_mask():
    """attn_mask='causal' (flash-eligible) == explicit causal_mask array
    through mha, flash on and off."""
    from fbk_fairseq_st_tpu.ops.attention import causal_mask

    cfg = MHAConfig(embed_dim=16, num_heads=2)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 12, 16).astype(np.float32))
    kpm = jnp.asarray(np.arange(12)[None, :] >= np.array([12, 9])[:, None])

    dense, _, _ = mha(params, cfg, x, key_padding_mask=kpm,
                      attn_mask=causal_mask(12))
    sentinel_dense, _, _ = mha(params, cfg, x, key_padding_mask=kpm,
                               attn_mask="causal")
    np.testing.assert_allclose(np.asarray(sentinel_dense), np.asarray(dense),
                               rtol=1e-6, atol=1e-6)

    set_flash_attention(True)
    try:
        fused, w, _ = mha(params, cfg, x, key_padding_mask=kpm,
                          attn_mask="causal")
    finally:
        set_flash_attention(None)
    assert w is None  # flash path ran (returns no weights)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_mha_dropout_falls_back_off_tpu():
    """Attention dropout needs the TPU hardware PRNG; on CPU the call must
    take the XLA path (and still train without error)."""
    from fbk_fairseq_st_tpu.ops.core import RngStream

    cfg = MHAConfig(embed_dim=16, num_heads=2, dropout=0.5)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(6).randn(2, 8, 16).astype(np.float32))
    set_flash_attention(True)
    try:
        out, _, _ = mha(params, cfg, x, attn_mask="causal",
                        rng=RngStream(jax.random.PRNGKey(7)),
                        deterministic=False)
    finally:
        set_flash_attention(None)
    assert np.isfinite(np.asarray(out)).all()


def test_decoder_training_uses_flash_when_enabled():
    """End-to-end: TransformerDecoder teacher forcing under the flash path
    equals the dense path (causal sentinel threaded through the layers)."""
    from fbk_fairseq_st_tpu.models.transformer_decoder import (
        TransformerDecoder,
        TransformerDecoderConfig,
    )

    cfg = TransformerDecoderConfig(
        vocab_size=32, embed_dim=16, ffn_dim=32, layers=2, heads=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        no_encoder_attn=True,
    )
    dec = TransformerDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.RandomState(8).randint(4, 32, size=(2, 12))
    )
    dense_logits, _ = dec(params, tokens)
    set_flash_attention(True)
    try:
        flash_logits, _ = dec(params, tokens)
    finally:
        set_flash_attention(None)
    np.testing.assert_allclose(
        np.asarray(flash_logits), np.asarray(dense_logits),
        rtol=2e-4, atol=2e-4,
    )


def test_label_smoothed_logits_fast_path_matches_lprobs_path():
    """The reduction-only CE formulation == the log_softmax formulation
    (values and gradients)."""
    from fbk_fairseq_st_tpu.criterions.label_smoothed_cross_entropy import (
        label_smoothed_nll_from_logits,
        label_smoothed_nll_loss,
    )

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 6, 50).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 50, size=(4, 6)))
    target = target.at[0, :3].set(1)  # some pads

    for eps in (0.0, 0.1):
        fast = label_smoothed_nll_from_logits(
            logits, target, eps, ignore_index=1
        )
        slow = label_smoothed_nll_loss(
            jax.nn.log_softmax(logits.reshape(-1, 50), axis=-1),
            target.reshape(-1), eps, ignore_index=1,
        )
        np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(slow[0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fast[1]), np.asarray(slow[1]),
                                   rtol=1e-5)

    g_fast = jax.grad(
        lambda l: label_smoothed_nll_from_logits(l, target, 0.1, 1)[0]
    )(logits)
    g_slow = jax.grad(
        lambda l: label_smoothed_nll_loss(
            jax.nn.log_softmax(l.reshape(-1, 50), -1),
            target.reshape(-1), 0.1, 1,
        )[0]
    )(logits)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                               rtol=1e-5, atol=1e-6)


def test_flash_pad_unaligned_shapes():
    """Tile-unaligned T/S (e.g. a 130-frame encoder) run through the same
    kernels via 128-padding in the wrapper: padded keys are killed by the
    NEG_INF bias, padded query rows sliced off — values AND grads match
    the dense path, causal included."""
    q, k, v, bias = make_qkv(bh=2, t=130, s=130, d=8, seed=7)
    for causal in (False, True):
        got = flash_attention(q, k, v, bias, 0.4, causal=causal)
        want = _xla_reference(q, k, v, bias, 0.4, causal=causal)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

        g1 = jax.grad(
            lambda q, k, v: (
                flash_attention(q, k, v, bias, 0.4, causal=causal) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        g2 = jax.grad(
            lambda q, k, v: (
                _xla_reference(q, k, v, bias, 0.4, causal=causal) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_flash_pad_cross_attention_unaligned():
    """t != s, both unaligned (cross-attention shapes)."""
    q, k, v, bias = make_qkv(bh=2, t=70, s=190, d=8, seed=8)
    got = flash_attention(q, k, v, bias, 0.6)
    want = _xla_reference(q, k, v, bias, 0.6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv_attention_2d_flash_path_matches_dense():
    """The ConvAttention2D frontend's time-attention rides the flash kernel
    at long context (conv_frontend.py conv_attention_2d): forced flash ==
    dense softmax path, forward and parameter gradients, with a padded
    head dim (F zero-padded to the kernel's 64-lane minimum)."""
    from fbk_fairseq_st_tpu.ops.conv_frontend import (
        conv_attention_2d,
        init_conv_attention_2d,
        init_conv_attention_2d_state,
    )

    H, C = 4, 16
    params = init_conv_attention_2d(jax.random.PRNGKey(0), C, H)
    state = init_conv_attention_2d_state(H, C)
    B, T, F = 2, 64, 10
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F, C), jnp.float32)
    kpm = jnp.arange(T)[None, :] >= jnp.array([T, T - 17])[:, None]

    def run(training):
        def loss(p):
            out, _ = conv_attention_2d(
                p, state, H, x, key_padding_mask=kpm,
                deterministic=True, training=training,
            )
            return (out ** 2).sum(), out

        (_, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        return out, g

    for training in (False, True):
        set_flash_attention(False)
        try:
            out_d, g_d = run(training)
            set_flash_attention(True)
            out_f, g_f = run(training)
        finally:
            set_flash_attention(None)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_d), rtol=2e-4, atol=2e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_d)
        ):
            # leaf-scale tolerance: batch norm makes the output invariant
            # to the conv input bias, so those leaves' true gradients are
            # ~0 and both paths return fp32 noise — elementwise rtol would
            # compare noise against noise (2e-3: the one-pass BN variance
            # moved the noise floor of the zero-gradient leaves slightly;
            # real-gradient leaves sit orders of magnitude above this)
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(b).max()))
            assert float(np.abs(a - b).max()) <= 2e-3 * scale


@pytest.mark.parametrize("causal", [False, True])
def test_fused_bwd_matches_split(causal):
    """The fused one-launch backward (_bwd_fused_impl: dQ accumulated in
    VMEM, dK/dV as per-q-block partials reduced outside) must produce the
    same gradients as the split dQ/dKV kernel pair on a multi-block grid
    (both tile axes > 1 so partial summation and causal zero-blocks are
    exercised)."""
    from fbk_fairseq_st_tpu.ops.pallas.attention_kernel import (
        _bwd_fused_impl,
        _bwd_impl,
        _fwd_impl,
    )

    rng = np.random.RandomState(11)
    bh, t, s, d = 2, 256, 256, 8
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    bias = np.zeros((bh, s), np.float32)
    bias[:, -9:] = -1e9
    bias = jnp.asarray(bias)
    seed = jnp.zeros((1,), jnp.int32)
    kw = dict(causal=causal, scale=0.35, rate=0.0, t_block=128,
              s_block=128, interpret=True)

    out, lse = _fwd_impl(q, k, v, bias, seed, **kw)
    g = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    split = _bwd_impl(q, k, v, bias, seed, out, lse, g, **kw)
    fused = _bwd_fused_impl(q, k, v, bias, seed, out, lse, g, **kw)
    for a, b in zip(fused, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
