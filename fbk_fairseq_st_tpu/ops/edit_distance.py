"""Batched Levenshtein distance on device.

Serves two reference roles:
  * UER computation for CTC logging (examples/speech_recognition/utils/
    wer_utils.py EditDistance + criterions/CTC_loss.py compute_ctc_uer) —
    the reference runs a per-utterance host loop; here it's one vmapped DP,
    so the criterion stays a single compiled graph;
  * the libnat edit-distance ops for NAT targets (fairseq/clib/libnat/
    edit_dist.cpp compute_ed2) when the NAT family lands.

Row-parallel DP: the within-row dependency (insertion chain) is resolved
with the prefix-min trick — new_row[j] = j + cummin(m[k] - k) where
m = min(del, sub) candidates — keeping each scan step O(T2) vector work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cummin(x):
    return jax.lax.associative_scan(jnp.minimum, x)


def levenshtein(pred, pred_len, tgt, tgt_len):
    """Edit distance between each padded row pair.

    pred: (B, T1) int32; tgt: (B, T2) int32; lengths clip the valid regions.
    Returns (B,) int32 distances.
    """

    def one(p, pl, t, tl):
        t2 = t.shape[0]
        j = jnp.arange(t2 + 1, dtype=jnp.int32)
        init_row = j  # dist[0, j] = j

        def step(row, i):
            # row == dist[i-1, :]; build dist[i, :]
            cost = (p[i - 1] != t).astype(jnp.int32)  # (T2,)
            # candidates from deletion (row[j]+1) and substitution
            # (row[j-1]+cost[j-1]) for j >= 1
            del_cand = row + 1
            sub_cand = jnp.concatenate(
                [jnp.array([i], jnp.int32), row[:-1] + cost]
            )
            # seed j=0 with dist[i][0] = i
            m = jnp.minimum(del_cand, sub_cand)
            m = m.at[0].set(i)
            # resolve insertion chain: new[j] = min_k<=j (m[k] + j - k)
            new_row = _cummin(m - j) + j
            new_row = jnp.where(i <= pl, new_row, row)
            return new_row, None

        t1 = p.shape[0]
        final_row, _ = jax.lax.scan(
            step, init_row, jnp.arange(1, t1 + 1, dtype=jnp.int32)
        )
        return final_row[jnp.minimum(tl, t2)]

    return jax.vmap(one)(
        pred.astype(jnp.int32),
        pred_len.astype(jnp.int32),
        tgt.astype(jnp.int32),
        tgt_len.astype(jnp.int32),
    )


def lcs_matched_masks(a, a_len, b, b_len):
    """Which tokens of each row pair survive an optimal insert/delete-only
    alignment (the libnat ``suggested_ed2_path`` alignment — substitutions
    cost 2, so the kept tokens form a longest common subsequence).

    a: (B, La) int32 (padded), b: (B, Lb) int32; lengths clip valid regions.
    Returns (matched_a: (B, La) bool, matched_b: (B, Lb) bool).

    TPU formulation: the LCS row recurrence's in-row dependency is resolved
    with a cumulative max — row_i[j] = max(row_{i-1}[j],
    cummax_j(row_{i-1}[j-1] + eq(i, j))) — so each scan step is O(Lb) vector
    work; the backtrace is one fixed-length lax.scan over the stored table.
    """

    def one(av, al, bv, bl):
        la, lb = av.shape[0], bv.shape[0]
        jcols = jnp.arange(lb + 1, dtype=jnp.int32)
        init_row = jnp.zeros(lb + 1, jnp.int32)

        def step(row, i):
            eq = (
                (av[i - 1] == bv)
                & (i <= al)
                & (jnp.arange(lb) < bl)
            ).astype(jnp.int32)  # eq[j-1] for j = 1..lb
            cand = jnp.concatenate([jnp.zeros(1, jnp.int32), row[:-1] + eq])
            new_row = jnp.maximum(
                row, jax.lax.associative_scan(jnp.maximum, cand)
            )
            return new_row, new_row

        _, table = jax.lax.scan(
            step, init_row, jnp.arange(1, la + 1, dtype=jnp.int32)
        )
        table = jnp.concatenate([init_row[None], table])  # (la+1, lb+1)

        def bt(state, _):
            i, j, ma, mb = state
            fij = table[i, j]
            eq = av[jnp.maximum(i - 1, 0)] == bv[jnp.maximum(j - 1, 0)]
            can_match = (i > 0) & (j > 0) & eq & (
                fij == table[jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0)] + 1
            )
            can_up = (i > 0) & (fij == table[jnp.maximum(i - 1, 0), j])
            ni = jnp.where(can_match | can_up, i - 1, i)
            nj = jnp.where(can_match, j - 1, jnp.where(can_up, j, j - 1))
            nj = jnp.where((i == 0) & (j == 0), 0, jnp.maximum(nj, 0))
            ni = jnp.maximum(ni, 0)
            ma = jnp.where(can_match, ma.at[jnp.maximum(i - 1, 0)].set(True), ma)
            mb = jnp.where(can_match, mb.at[jnp.maximum(j - 1, 0)].set(True), mb)
            done = (i == 0) & (j == 0)
            ni = jnp.where(done, 0, ni)
            nj = jnp.where(done, 0, nj)
            return (ni, nj, ma, mb), None

        state = (
            jnp.minimum(al, la),
            jnp.minimum(bl, lb),
            jnp.zeros(la, bool),
            jnp.zeros(lb, bool),
        )
        (ma, mb) = jax.lax.scan(bt, state, None, length=la + lb)[0][2:]
        return ma, mb

    return jax.vmap(one)(
        a.astype(jnp.int32), a_len.astype(jnp.int32),
        b.astype(jnp.int32), b_len.astype(jnp.int32),
    )
