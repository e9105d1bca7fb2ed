"""Positional embeddings, numerically matching the reference.

* Sinusoidal: the tensor2tensor variant — ``cat([sin, cos], dim=1)`` with the
  padding row zeroed (fairseq/modules/sinusoidal_positional_embedding.py:35-58).
  Positions for real tokens start at ``padding_idx + 1``
  (fairseq utils.make_positions).
* Learned: an Embedding indexed by the same positions
  (fairseq/modules/learned_positional_embedding.py).
* Audio: frames have no token ids, so positions are built from lengths —
  frame t of an utterance of length L gets position ``padding_idx + 1 + t``
  for t < L, else the padding position (examples/speech_recognition/modules/
  positional_embedding_audio.py:21-27, with padding_idx=0 at the call site
  conv_transformer.py:229).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .core import init_embedding


def sinusoidal_table(num_embeddings: int, dim: int, padding_idx: Optional[int] = None):
    half_dim = dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    inv_freq = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    pos = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    table = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return table


def make_positions(ids, padding_idx: int):
    """Non-pad tokens get padding_idx + 1, padding_idx + 2, ...; pads keep
    padding_idx (fairseq utils.make_positions)."""
    mask = (ids != padding_idx).astype(jnp.int32)
    return (jnp.cumsum(mask, axis=1) * mask) + padding_idx


def token_positions_from_lengths(lengths, max_len: int, padding_idx: int):
    """Audio variant: positions from a length vector."""
    t = jnp.arange(max_len)[None, :]
    valid = t < lengths[:, None]
    return jnp.where(valid, t + padding_idx + 1, padding_idx)


class PositionalEmbedding:
    """Sinusoidal or learned positional embedding.

    For learned embeddings ``init`` returns trainable params; sinusoidal
    tables are constants closed over by ``apply`` (never checkpointed, like
    the reference's register_buffer-less weights).
    """

    def __init__(self, max_positions: int, dim: int, padding_idx: int, learned: bool):
        self.max_positions = max_positions
        self.dim = dim
        self.padding_idx = padding_idx
        self.learned = learned
        if not learned:
            # reference init_size = num_embeddings + padding_idx + 1
            self._table = sinusoidal_table(
                max_positions + padding_idx + 1, dim, padding_idx
            )

    def init(self, key):
        if self.learned:
            return init_embedding(
                key, self.max_positions + self.padding_idx + 1, self.dim, self.padding_idx
            )
        return {}

    def apply(self, params, positions, dtype=jnp.float32):
        """positions: (B, T) int32 absolute positions (pads at padding_idx)."""
        if self.learned:
            table = params["w"]
        else:
            table = self._table
        return jnp.take(table.astype(dtype), positions, axis=0)

    def from_ids(self, params, ids, dtype=jnp.float32, step=None):
        """Positions derived from token ids; if *step* is given (incremental
        decoding) every token gets position padding_idx + 1 + step."""
        if step is not None:
            positions = jnp.full(ids.shape, self.padding_idx + 1, jnp.int32) + step
        else:
            positions = make_positions(ids, self.padding_idx)
        return self.apply(params, positions, dtype)

    def from_lengths(self, params, lengths, max_len: int, dtype=jnp.float32):
        positions = token_positions_from_lengths(lengths, max_len, self.padding_idx)
        return self.apply(params, positions, dtype)
