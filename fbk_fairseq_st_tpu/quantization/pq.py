"""Iterative Product Quantization (iPQ).

Counterpart of fairseq/modules/quantization/pq/{em.py,pq.py}: weights are
split into block_size subvectors and k-means-clustered into a small
codebook ("And the Bit Goes Down", Stock et al. 2020). The E-step
(assignment) and M-step (centroid means) are single vectorized JAX
expressions (the reference loops per centroid, em.py:79-81); empty-cluster
resolution (split the most populated, em.py:94-127) runs host-side — PQ is
an offline compression pass, not a training hot path."""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class EmptyClusterResolveError(Exception):
    pass


class PQ:
    """Quantize one weight matrix.

    W: (out_features, in_features) [this framework's linear layout is
    (in, out) — transpose before/after if needed] or conv kernels reshaped
    by the caller. Blocks are columns of size block_size."""

    def __init__(self, W, block_size: int, n_centroids: int = 256,
                 n_iter: int = 20, eps: float = 1e-6,
                 max_tentatives: int = 30, seed: int = 0):
        W = np.asarray(W, np.float32)
        assert W.ndim == 2, "reshape conv kernels to 2D before PQ"
        self.out_features, self.in_features = W.shape
        assert self.in_features % block_size == 0, (
            "in_features must be a multiple of block_size"
        )
        self.block_size = block_size
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.eps = eps
        self.max_tentatives = max_tentatives
        self.rng = np.random.RandomState(seed)
        # (block_size, n_blocks * out_features) like reference pq.py:61-74
        self.W_r = np.ascontiguousarray(
            W.reshape(self.out_features, -1, block_size)
            .transpose(2, 1, 0)
            .reshape(block_size, -1)
        )
        self.centroids = None
        self.assignments = None
        self.objective = []

    def _distances(self):
        # (n_centroids, n_cols)
        c = jnp.asarray(self.centroids)  # (K, B)
        w = jnp.asarray(self.W_r)  # (B, N)
        d = (
            jnp.sum(c ** 2, 1)[:, None]
            - 2.0 * (c @ w)
            + jnp.sum(w ** 2, 0)[None, :]
        )
        return np.asarray(d)

    def _assign(self):
        self.assignments = np.argmin(self._distances(), axis=0)

    def initialize_centroids(self):
        idx = self.rng.randint(0, self.W_r.shape[1], size=self.n_centroids)
        self.centroids = self.W_r[:, idx].T.copy()  # (K, B)

    def _resolve_empty_clusters(self):
        counts = np.bincount(self.assignments, minlength=self.n_centroids)
        empty = np.flatnonzero(counts == 0)
        n_empty = len(empty)
        tentatives = 0
        while len(empty) > 0:
            k = self.rng.choice(empty)
            m = int(np.argmax(counts))
            e = self.rng.randn(self.block_size).astype(np.float32) * self.eps
            self.centroids[k] = self.centroids[m] + e
            self.centroids[m] -= e
            self._assign()
            counts = np.bincount(self.assignments, minlength=self.n_centroids)
            empty = np.flatnonzero(counts == 0)
            tentatives += 1
            if tentatives >= self.max_tentatives:
                logger.info(
                    "Could not resolve all empty clusters, %d remaining",
                    len(empty),
                )
                raise EmptyClusterResolveError
        return n_empty

    def step(self, i: int):
        self._assign()
        n_empty = self._resolve_empty_clusters()
        # M-step: exact per-cluster means, one segment_sum
        onehot_counts = np.bincount(
            self.assignments, minlength=self.n_centroids
        ).astype(np.float32)
        sums = np.asarray(
            jax.ops.segment_sum(
                jnp.asarray(self.W_r.T),
                jnp.asarray(self.assignments),
                num_segments=self.n_centroids,
            )
        )
        self.centroids = sums / np.maximum(onehot_counts[:, None], 1.0)
        obj = float(
            np.linalg.norm(self.centroids[self.assignments].T - self.W_r)
        )
        self.objective.append(obj)
        logger.info(
            "Iteration: %d, objective: %.6f, resolved empty clusters: %d",
            i, obj, n_empty,
        )

    def encode(self):
        self.initialize_centroids()
        for i in range(self.n_iter):
            try:
                self.step(i)
            except EmptyClusterResolveError:
                break

    def decode(self) -> np.ndarray:
        """Reconstructed (out_features, in_features) matrix."""
        return (
            self.centroids[self.assignments]
            .reshape(-1, self.out_features, self.block_size)
            .transpose(1, 0, 2)
            .reshape(self.out_features, self.in_features)
        )


def quantize_params_pq(
    params,
    block_size: int = 8,
    n_centroids: int = 256,
    n_iter: int = 15,
    min_size: int = 4096,
    seed: int = 0,
) -> Tuple[object, Dict[str, dict]]:
    """Offline iPQ over a param tree: every large 2D weight leaf is replaced
    by its PQ reconstruction. Returns (new_params, codebooks) where
    codebooks maps leaf path -> {centroids, assignments, shape} for
    deployment-time storage (the compressed representation)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    codebooks: Dict[str, dict] = {}
    for path, leaf in flat:
        arr = np.asarray(leaf)
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        if (
            arr.ndim == 2
            and arr.size >= min_size
            and arr.shape[0] % block_size == 0
            and np.issubdtype(arr.dtype, np.floating)
        ):
            # this framework's linear weights are (in, out): transpose into
            # the reference's (out, in) blocking
            pq = PQ(
                arr.T, block_size, n_centroids=n_centroids, n_iter=n_iter,
                seed=seed,
            )
            pq.encode()
            out.append(jnp.asarray(pq.decode().T.astype(arr.dtype)))
            codebooks[key] = {
                "centroids": pq.centroids,
                "assignments": pq.assignments,
                "shape": arr.shape,
                "block_size": block_size,
            }
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out), codebooks
