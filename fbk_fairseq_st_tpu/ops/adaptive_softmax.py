"""Adaptive softmax (Grave et al. 2017) and adaptive input embeddings.

Counterpart of fairseq/modules/adaptive_softmax.py and adaptive_input.py.
TPU formulation: the reference gathers the token subsets belonging to each
cluster (dynamic shapes); here every cluster's logits are computed at full
width — the savings that survive static shapes are the low-rank tail
factorizations (embed_dim / factor**k), which is where the FLOPs go for the
big tail vocabularies. The composed output is a full (.., V) LOG-PROBABILITY
tensor: log p(w) = log p(cluster) + log p(w | cluster). Feeding it through
log_softmax is the identity (logsumexp == 0), so it drops into every
consumer that expects logits."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .core import init_linear, linear, normal_init


def _parse_cutoff(cutoff, vocab_size: int) -> Tuple[int, ...]:
    if isinstance(cutoff, str):
        cutoff = [int(x) for x in cutoff.split(",")]
    cutoff = list(cutoff)
    if cutoff[-1] > vocab_size:
        cutoff = [c for c in cutoff if c < vocab_size]
    if not cutoff or cutoff[-1] != vocab_size:
        cutoff = cutoff + [vocab_size]
    assert all(a < b for a, b in zip(cutoff, cutoff[1:])), cutoff
    return tuple(cutoff)


def init_adaptive_softmax(key, vocab_size: int, input_dim: int, cutoff,
                          factor: float = 4.0):
    """Head: (input_dim -> cutoff[0] + n_tails); tail k: low-rank
    (input_dim -> dim/factor^(k+1) -> cluster size)."""
    cutoff = _parse_cutoff(cutoff, vocab_size)
    n_tails = len(cutoff) - 1
    ks = jax.random.split(key, 2 * n_tails + 1)
    p: Dict[str, Any] = {
        "head": init_linear(ks[0], input_dim, cutoff[0] + n_tails,
                            bias=False),
        "tails": [],
    }
    for i in range(n_tails):
        dim = max(int(input_dim // (factor ** (i + 1))), 1)
        p["tails"].append(
            {
                "proj": init_linear(ks[1 + 2 * i], input_dim, dim,
                                    bias=False),
                "out": init_linear(ks[2 + 2 * i], dim,
                                   cutoff[i + 1] - cutoff[i], bias=False),
            }
        )
    return p


def adaptive_log_probs(params, cutoff, x):
    """x: (..., D) -> (..., V) log probabilities."""
    cutoff = tuple(cutoff)
    n_tails = len(cutoff) - 1
    head = linear(params["head"], x).astype(jnp.float32)
    head_lp = jax.nn.log_softmax(head, axis=-1)
    pieces: List[jnp.ndarray] = [head_lp[..., : cutoff[0]]]
    for i in range(n_tails):
        tp = params["tails"][i]
        tail_logits = linear(tp["out"], linear(tp["proj"], x)).astype(
            jnp.float32
        )
        tail_lp = jax.nn.log_softmax(tail_logits, axis=-1)
        pieces.append(tail_lp + head_lp[..., cutoff[0] + i: cutoff[0] + i + 1])
    return jnp.concatenate(pieces, axis=-1)


def init_adaptive_input(key, vocab_size: int, padding_idx: int,
                        initial_dim: int, factor: float, output_dim: int,
                        cutoff):
    """Adaptive input embeddings (Baevski & Auli 2018): cluster k embeds at
    initial_dim/factor^k then projects to output_dim."""
    cutoff = _parse_cutoff(cutoff, vocab_size)
    ks = jax.random.split(key, 2 * len(cutoff))
    clusters = []
    prev = 0
    for i, c in enumerate(cutoff):
        dim = max(int(initial_dim // (factor ** i)), 1)
        size = c - prev
        emb = normal_init(ks[2 * i], (size, dim), std=dim ** -0.5)
        if prev <= padding_idx < c:
            emb = emb.at[padding_idx - prev].set(0.0)
        clusters.append(
            {
                "embed": {"w": emb},
                "proj": init_linear(ks[2 * i + 1], dim, output_dim,
                                    bias=False),
            }
        )
        prev = c
    return {"clusters": clusters}


def adaptive_embed(params, cutoff, ids, dtype=jnp.float32):
    """ids: (..., ) int -> (..., output_dim). Every cluster's embedding is
    computed with in-range-clamped ids and the right one selected by mask
    (static shapes; the reference gathers per-cluster subsets)."""
    cutoff = tuple(cutoff)
    out = None
    prev = 0
    for i, c in enumerate(cutoff):
        cp = params["clusters"][i]
        local = jnp.clip(ids - prev, 0, c - prev - 1)
        emb = jnp.take(cp["embed"]["w"].astype(dtype), local, axis=0)
        proj = linear(cp["proj"], emb)
        mask = ((ids >= prev) & (ids < c))[..., None]
        out = jnp.where(mask, proj, 0.0 if out is None else out)
        prev = c
    return out


# ---------------------------------------------------------------------------
# Tied adaptive input/softmax (Baevski & Auli 2018 full recipe)
# ---------------------------------------------------------------------------

def init_tied_adaptive_softmax(key, vocab_size: int, input_dim: int, cutoff,
                               factor: float, tie_proj: bool):
    """Free parameters of an adaptive softmax TIED to adaptive input
    embeddings (reference adaptive_softmax.py TiedHeadModule/_make_tail):
    the head's word logits are ``x @ emb0^T`` and each tail's output is
    ``hidden @ emb_k^T`` — those weights live in the adaptive_input params
    and are shared, so only the cluster-logit columns (and the tail
    projections when ``tie_proj`` is False) are initialized here."""
    cutoff = _parse_cutoff(cutoff, vocab_size)
    n_tails = len(cutoff) - 1
    ks = jax.random.split(key, n_tails + 1)
    p: Dict[str, Any] = {
        "class_proj": init_linear(ks[0], input_dim, n_tails, bias=False),
    }
    if not tie_proj:
        p["projs"] = []
        for i in range(n_tails):
            dim = max(int(input_dim // (factor ** (i + 1))), 1)
            p["projs"].append(
                init_linear(ks[1 + i], input_dim, dim, bias=False)
            )
    return p


def tied_adaptive_log_probs(params, input_params, cutoff, x,
                            tie_proj: bool):
    """x: (..., D) -> (..., V) log-probs with weights shared with the
    adaptive input embedding (``input_params`` =
    params['adaptive_input']). Reference semantics: head word logits
    ``x @ emb0^T`` (band-0 embedding dim must equal D — true for the
    published presets where initial_dim == embed_dim); tail k hidden is
    ``x @ proj_{k+1}^T`` when tie_proj (the transpose of the input
    projection) else a free projection, and tail logits
    ``hidden @ emb_{k+1}^T``."""
    cutoff = tuple(cutoff)
    n_tails = len(cutoff) - 1
    clusters = input_params["clusters"]

    emb0 = clusters[0]["embed"]["w"]
    if emb0.shape[1] != x.shape[-1]:
        raise NotImplementedError(
            "tied adaptive softmax requires band-0 embedding dim == "
            f"decoder dim ({emb0.shape[1]} != {x.shape[-1]})"
        )
    word_logits = x @ emb0.T.astype(x.dtype)
    class_logits = linear(params["class_proj"], x)
    head = jnp.concatenate([word_logits, class_logits], axis=-1).astype(
        jnp.float32
    )
    head_lp = jax.nn.log_softmax(head, axis=-1)
    pieces: List[jnp.ndarray] = [head_lp[..., : cutoff[0]]]
    for i in range(n_tails):
        band = clusters[i + 1]
        if tie_proj:
            # input proj w: (band_dim, D); tied tail hidden = x @ w^T
            hidden = x @ band["proj"]["w"].T.astype(x.dtype)
        else:
            hidden = linear(params["projs"][i], x)
        tail_logits = (
            hidden @ band["embed"]["w"].T.astype(x.dtype)
        ).astype(jnp.float32)
        tail_lp = jax.nn.log_softmax(tail_logits, axis=-1)
        pieces.append(
            tail_lp + head_lp[..., cutoff[0] + i: cutoff[0] + i + 1]
        )
    return jnp.concatenate(pieces, axis=-1)
