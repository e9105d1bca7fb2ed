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
