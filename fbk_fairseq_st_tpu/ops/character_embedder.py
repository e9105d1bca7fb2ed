"""Character-aware word embeddings (Kim et al. 2015 char-CNN + highway).

Counterpart of fairseq/modules/character_token_embedder.py:22-204
(--character-embeddings in transformer_lm): each word's UTF-8 bytes (+1,
pad=0) feed a character embedding, a bank of width-w convolutions
max-pooled over the word, highway layers, and a projection to the word
embedding dim; pad tokens embed to zero and eos/unk to two learned symbol
rows.

TPU design: the word -> char-id table is a static (V, max_char_len)
constant built host-side from the dictionary (the reference does the same
at module init), so the embedding of a (B, T) token batch is one gather +
batched convs over (B*T, L, C) — fixed shapes, no per-word Python."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import linear

CHAR_PAD_IDX = 0
NUM_CHAR_EMBEDDINGS = 257  # 256 byte values (+1 shift) + pad


class CharEmbedderConfig(NamedTuple):
    filters: Tuple[Tuple[int, int], ...]  # (width, out_channels) per conv
    char_embed_dim: int = 4
    word_embed_dim: int = 512
    highway_layers: int = 2
    max_char_len: int = 50

    @property
    def conv_out_dim(self) -> int:
        return sum(f[1] for f in self.filters)


def build_word_to_char(dictionary, max_char_len: int = 50) -> np.ndarray:
    """Static (V, max_char_len) char-id table (reference set_vocab :65-86):
    special symbols map to all-pad rows; other words to their UTF-8 bytes
    shifted by +1 (0 is the char pad)."""
    table = np.zeros((len(dictionary), max_char_len), np.int32)
    nspecial = getattr(dictionary, "nspecial", 0)
    for i in range(len(dictionary)):
        if i < nspecial:
            continue
        chars = dictionary[i].encode()[:max_char_len]
        table[i, : len(chars)] = np.frombuffer(chars, np.uint8).astype(
            np.int32
        ) + 1
    return table


def init_character_embedder(key, cfg: CharEmbedderConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, len(cfg.filters) + 4)
    char_emb = jax.nn.initializers.glorot_normal()(
        ks[0], (NUM_CHAR_EMBEDDINGS, cfg.char_embed_dim), jnp.float32
    )
    char_emb = char_emb.at[CHAR_PAD_IDX].set(0.0)
    p: Dict[str, Any] = {
        "char_embeddings": char_emb,
        "symbol_embeddings": jax.nn.initializers.glorot_normal()(
            ks[1], (2, cfg.word_embed_dim), jnp.float32
        ),
        "convs": [],
        "highway": [],
    }
    for i, (width, out_c) in enumerate(cfg.filters):
        wkey = jax.random.fold_in(ks[2], i)
        p["convs"].append(
            {
                "w": jax.nn.initializers.glorot_uniform()(
                    wkey, (width, cfg.char_embed_dim, out_c), jnp.float32
                ),
                "b": jnp.zeros((out_c,), jnp.float32),
            }
        )
    d = cfg.conv_out_dim
    for i in range(cfg.highway_layers):
        hkey = jax.random.fold_in(ks[3], i)
        w = jax.nn.initializers.glorot_uniform()(hkey, (d, 2 * d), jnp.float32)
        # reference Highway bias init: carry-gate bias 1 (:184-192)
        b = jnp.concatenate([jnp.zeros((d,)), jnp.ones((d,))]).astype(
            jnp.float32
        )
        p["highway"].append({"w": w, "b": b})
    from .core import init_linear

    p["projection"] = init_linear(ks[-1], d, cfg.word_embed_dim)
    return p


def character_embed(params, cfg: CharEmbedderConfig, word_to_char, tokens,
                    pad_idx: int, eos_idx: int, unk_idx: int):
    """tokens: (B, T) word ids -> (B, T, word_embed_dim)."""
    b, t = tokens.shape
    flat = tokens.reshape(-1)
    chars = jnp.asarray(word_to_char)[flat]  # (BT, L)
    embs = jnp.asarray(params["char_embeddings"])[chars]  # (BT, L, C)
    outs = []
    for conv in params["convs"]:
        x = jax.lax.conv_general_dilated(
            embs, conv["w"].astype(embs.dtype), (1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + conv["b"].astype(embs.dtype)
        outs.append(jax.nn.relu(jnp.max(x, axis=1)))
    x = jnp.concatenate(outs, axis=-1)  # (BT, sum out_c)
    for hw in params["highway"]:
        proj = linear(hw, x)
        proj_x, gate = jnp.split(proj, 2, axis=-1)
        proj_x = jax.nn.relu(proj_x)
        gate = jax.nn.sigmoid(gate)
        x = gate * x + (1.0 - gate) * proj_x
    x = linear(params["projection"], x)  # (BT, word_dim)

    sym = jnp.asarray(params["symbol_embeddings"]).astype(x.dtype)
    x = jnp.where((flat == pad_idx)[:, None], 0.0, x)
    x = jnp.where((flat == eos_idx)[:, None], sym[0][None, :], x)
    x = jnp.where((flat == unk_idx)[:, None], sym[1][None, :], x)
    return x.reshape(b, t, -1)
