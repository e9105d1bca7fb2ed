"""Dynamic CRF: exactness vs brute force at full beam, Viterbi optimality
(reference dynamic_crf_layer role)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu.ops.dynamic_crf import (
    crf_log_likelihood,
    crf_score,
    crf_viterbi,
    init_dynamic_crf,
)


def brute_force_logZ(params, em, mask):
    """Sum over all label sequences (full vocab) for one row."""
    T, V = em.shape
    length = int(mask.sum())
    E1, E2 = np.asarray(params["E1"]), np.asarray(params["E2"])
    em = np.asarray(em)
    scores = []
    for seq in itertools.product(range(V), repeat=length):
        s = sum(em[t, seq[t]] for t in range(length))
        s += sum(
            float(E1[seq[t]] @ E2[seq[t + 1]]) for t in range(length - 1)
        )
        scores.append(s)
    m = max(scores)
    return m + np.log(sum(np.exp(s - m) for s in scores))


def test_crf_normalizer_exact_at_full_beam():
    V, T, R = 5, 4, 3
    params = init_dynamic_crf(jax.random.PRNGKey(0), V, R)
    em = jax.random.normal(jax.random.PRNGKey(1), (1, T, V))
    mask = jnp.ones((1, T), bool)
    tgt = jnp.array([[1, 2, 3, 0]])
    ll = crf_log_likelihood(params, em, tgt, mask, beam=V)
    want = float(
        crf_score(params, em.astype(jnp.float32), tgt, mask)[0]
    ) - brute_force_logZ(params, np.asarray(em[0]), np.asarray(mask[0]))
    np.testing.assert_allclose(float(ll[0]), want, rtol=1e-4)


def test_crf_viterbi_optimal_at_full_beam():
    V, T, R = 4, 4, 2
    params = init_dynamic_crf(jax.random.PRNGKey(2), V, R)
    em = jax.random.normal(jax.random.PRNGKey(3), (1, T, V))
    mask = jnp.ones((1, T), bool)
    scores, tokens = crf_viterbi(params, em, mask, beam=V)
    # brute force best path
    E1, E2 = np.asarray(params["E1"]), np.asarray(params["E2"])
    emn = np.asarray(em[0])
    best, best_seq = -1e9, None
    for seq in itertools.product(range(V), repeat=T):
        s = sum(emn[t, seq[t]] for t in range(T))
        s += sum(float(E1[seq[t]] @ E2[seq[t + 1]]) for t in range(T - 1))
        if s > best:
            best, best_seq = s, seq
    assert tuple(np.asarray(tokens[0]).tolist()) == best_seq
    np.testing.assert_allclose(float(scores[0].sum()), best, rtol=1e-4)


def test_crf_masked_positions_ignored():
    V, T = 4, 5
    params = init_dynamic_crf(jax.random.PRNGKey(4), V, 2)
    em = jax.random.normal(jax.random.PRNGKey(5), (1, T, V))
    mask = jnp.array([[True, True, True, False, False]])
    tgt = jnp.array([[1, 2, 3, 0, 0]])
    ll_full = crf_log_likelihood(params, em, tgt, mask, beam=V)
    # changing emissions at masked positions must not change the LL
    em2 = em.at[:, 3:].add(100.0)
    ll2 = crf_log_likelihood(params, em2, tgt, mask, beam=V)
    np.testing.assert_allclose(np.asarray(ll_full), np.asarray(ll2), rtol=1e-4)
