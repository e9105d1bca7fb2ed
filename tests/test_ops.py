"""Unit tests for the functional ops layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbk_fairseq_st_tpu.ops import (
    MHAConfig,
    RngStream,
    causal_mask,
    ctc_compress,
    ctc_greedy_decode,
    init_cache,
    init_layer_norm,
    init_mha,
    layer_norm,
    lengths_to_padding_mask,
    mha,
    precompute_cross_cache,
    sinusoidal_table,
)


def test_layer_norm_matches_numpy():
    x = np.random.RandomState(0).randn(2, 5, 8).astype(np.float32)
    p = init_layer_norm(8)
    y = layer_norm(p, jnp.asarray(x))
    expect = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)


def test_sinusoidal_matches_reference_formula():
    """tensor2tensor layout: [sin | cos] concatenated, padding row zeroed."""
    table = np.asarray(sinusoidal_table(10, 8, padding_idx=1))
    half = 4
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    pos = np.arange(10)[:, None] * emb[None, :]
    expect = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    expect[1] = 0.0
    np.testing.assert_allclose(table, expect, atol=1e-6)


def test_lengths_to_padding_mask():
    mask = lengths_to_padding_mask(jnp.array([3, 1]), 4)
    np.testing.assert_array_equal(
        np.asarray(mask), [[False, False, False, True], [False, True, True, True]]
    )


def test_mha_self_attention_shapes_and_masking():
    cfg = MHAConfig(embed_dim=16, num_heads=4)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    kpm = lengths_to_padding_mask(jnp.array([6, 3]), 6)
    out, _, _ = mha(params, cfg, x, key_padding_mask=kpm)
    assert out.shape == (2, 6, 16)
    # changing a padded position's content must not change the output of
    # valid positions in row 1
    x2 = x.at[1, 4].set(99.0)
    out2, _, _ = mha(params, cfg, x2, key_padding_mask=kpm)
    np.testing.assert_allclose(
        np.asarray(out[1, :3]), np.asarray(out2[1, :3]), atol=1e-5
    )


def test_mha_causal_mask_blocks_future():
    cfg = MHAConfig(embed_dim=8, num_heads=2)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    m = causal_mask(5)
    out, _, _ = mha(params, cfg, x, attn_mask=m)
    # perturbing the last position must not affect earlier outputs
    x2 = x.at[0, 4].set(7.0)
    out2, _, _ = mha(params, cfg, x2, attn_mask=m)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(out2[0, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(out[0, 4]), np.asarray(out2[0, 4]))


def test_incremental_cache_matches_full_attention():
    """Step-by-step cached self-attention == full causal attention."""
    cfg = MHAConfig(embed_dim=16, num_heads=4)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    T = 5
    x = jax.random.normal(jax.random.PRNGKey(2), (2, T, 16))
    full, _, _ = mha(params, cfg, x, attn_mask=causal_mask(T))

    cache = init_cache(2, T, cfg)
    outs = []
    for t in range(T):
        o, _, cache = mha(
            params, cfg, x[:, t: t + 1], cache=cache, cache_index=jnp.int32(t)
        )
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)


def test_cross_attention_precomputed_cache():
    cfg = MHAConfig(embed_dim=16, num_heads=4)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    direct, _, _ = mha(params, cfg, q, key=enc)
    cache = precompute_cross_cache(params, cfg, enc)
    cached, _, _ = mha(params, cfg, q, cache=cache, static_kv=True)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached), atol=1e-5)


# ---------------------------------------------------------------------------
# CTC compression vs a direct NumPy transcription of the reference algorithm
# ---------------------------------------------------------------------------

def _reference_ctc_compress(x, logits, lengths, strategy):
    """Literal NumPy port of CTCCompressStrategy + average_same_ctc_features
    semantics (reference conv_transformer.py:278-291, :385-426) used as the
    golden model."""
    from itertools import groupby

    b, t, d = x.shape
    prob = np.asarray(jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1))
    batch_predicted = []
    for i in range(b):
        pred = prob[i][: lengths[i]].argmax(-1).tolist()
        batch_predicted.append([(p, len(list(g))) for p, g in groupby(pred)])
    new_lengths = [len(p) for p in batch_predicted]
    new_maxlen = max(new_lengths)
    w = np.zeros((b, t, new_maxlen), np.float32)
    for bi, pred in enumerate(batch_predicted):
        cnt = 0
        for ti, (sym, n) in enumerate(pred):
            if strategy == "avg":
                w[bi, cnt: cnt + n, ti] = 1.0 / n
            elif strategy == "weighted":
                ws = prob[bi, cnt: cnt + n, sym]
                w[bi, cnt: cnt + n, ti] = ws / ws.sum()
            elif strategy == "softmax":
                ws = np.exp(prob[bi, cnt: cnt + n, sym])
                ws = ws / ws.sum()
                w[bi, cnt: cnt + n, ti] = ws
            cnt += n
    comp = np.einsum("btd,bts->bsd", x, w)
    return comp, np.array(new_lengths)


@pytest.mark.parametrize("strategy", ["avg", "weighted", "softmax"])
def test_ctc_compress_matches_reference(strategy):
    rng = np.random.RandomState(3)
    b, t, d, v = 3, 12, 8, 6
    x = rng.randn(b, t, d).astype(np.float32)
    logits = (rng.randn(b, t, v) * 2).astype(np.float32)
    lengths = np.array([12, 7, 1])

    got, got_len = ctc_compress(
        jnp.asarray(x), jnp.asarray(logits), jnp.asarray(lengths), strategy
    )
    want, want_len = _reference_ctc_compress(x, logits, lengths, strategy)
    np.testing.assert_array_equal(np.asarray(got_len), want_len)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(got)[i, : want_len[i]], want[i, : want_len[i]], atol=1e-4
        )
        # positions beyond the new length must be zero
        np.testing.assert_allclose(np.asarray(got)[i, want_len[i]:], 0.0, atol=1e-6)


def test_ctc_greedy_decode_collapses_and_deblanks():
    # logits argmax sequence: [1 1 0 2 2 2 0 0 1], blank=0
    seq = [1, 1, 0, 2, 2, 2, 0, 0, 1]
    v = 4
    logits = np.full((1, len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 10.0
    toks, counts = ctc_greedy_decode(jnp.asarray(logits), jnp.array([len(seq)]))
    assert int(counts[0]) == 3
    np.testing.assert_array_equal(np.asarray(toks)[0, :3], [1, 2, 1])
