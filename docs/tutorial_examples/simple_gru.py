"""Tutorial model: a minimal GRU encoder-decoder (docs/tutorial_simple_gru.md).

The smallest complete model this framework can train AND beam-decode:
a unidirectional GRU encoder whose final hidden state is concatenated to
every decoder input (no attention), a GRU decoder, and a vocabulary
projection. Run it with ``--user-dir docs/tutorial_examples --arch tutorial_simple_gru``.

This file is executed by tests/test_docs_examples.py, so the tutorial
stays honest.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fbk_fairseq_st_tpu.models.base import EncoderOut, Model
from fbk_fairseq_st_tpu.ops.core import (
    RngStream,
    dropout,
    embedding,
    init_embedding,
    init_linear,
    linear,
)
from fbk_fairseq_st_tpu.registry import (
    register_model,
    register_model_architecture,
)


# -- a GRU cell as a pure function over a parameter dict --------------------

def init_gru_cell(key, input_size: int, hidden_size: int):
    k1, k2 = jax.random.split(key)
    bound = hidden_size ** -0.5
    shape_i = (input_size, 3 * hidden_size)
    shape_h = (hidden_size, 3 * hidden_size)
    return {
        "wi": jax.random.uniform(k1, shape_i, jnp.float32, -bound, bound),
        "wh": jax.random.uniform(k2, shape_h, jnp.float32, -bound, bound),
        "b": jnp.zeros((3 * hidden_size,), jnp.float32),
    }


def gru_cell(p, x, h):
    gi = x @ p["wi"].astype(x.dtype) + p["b"].astype(x.dtype)
    gh = h @ p["wh"].astype(x.dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class SimpleGRUConfig(NamedTuple):
    src_vocab: int
    tgt_vocab: int
    embed_dim: int
    hidden_dim: int
    dropout: float
    padding_idx: int
    max_positions: int = 1024


@register_model("tutorial_simple_gru")
class SimpleGRUModel(Model):
    """Encoder-decoder with the full decoding contract (models/base.py):
    ``forward`` for training, ``encode`` + ``init_cache``/``decode_step``
    for the generator's while_loop beam search."""

    def __init__(self, cfg: SimpleGRUConfig):
        self.cfg = cfg
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions

    @staticmethod
    def add_args(parser):
        parser.add_argument("--embed-dim", type=int, metavar="N")
        parser.add_argument("--hidden-dim", type=int, metavar="N")
        parser.add_argument("--dropout", type=float, metavar="D")

    @classmethod
    def build_model(cls, args, task):
        simple_gru_architecture(args)  # back-fill preset defaults
        src_dict = task.source_dictionary or task.target_dictionary
        tgt_dict = task.target_dictionary
        return cls(SimpleGRUConfig(
            src_vocab=len(src_dict),
            tgt_vocab=len(tgt_dict),
            embed_dim=args.embed_dim,
            hidden_dim=args.hidden_dim,
            dropout=args.dropout,
            padding_idx=tgt_dict.pad(),
        ))

    # -- parameters ----------------------------------------------------------

    def init(self, key):
        cfg = self.cfg
        k = jax.random.fold_in
        params = {
            "src_embed": init_embedding(
                k(key, 0), cfg.src_vocab, cfg.embed_dim, cfg.padding_idx),
            "tgt_embed": init_embedding(
                k(key, 1), cfg.tgt_vocab, cfg.embed_dim, cfg.padding_idx),
            "enc_gru": init_gru_cell(k(key, 2), cfg.embed_dim,
                                     cfg.hidden_dim),
            # decoder input = [token embedding ; final encoder hidden]
            "dec_gru": init_gru_cell(k(key, 3),
                                     cfg.embed_dim + cfg.hidden_dim,
                                     cfg.hidden_dim),
            "out_proj": init_linear(k(key, 4), cfg.hidden_dim,
                                    cfg.tgt_vocab),
        }
        return {"params": params, "state": {}}

    # -- encoder ---------------------------------------------------------------

    def encode(self, variables, src_tokens, src_lengths, rng=None,
               training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        x = embedding(p["src_embed"], src_tokens)  # (B, T, E)
        x = dropout(x, cfg.dropout, rng, not training)
        b = src_tokens.shape[0]
        h0 = jnp.zeros((b, cfg.hidden_dim), x.dtype)
        mask = src_tokens == cfg.padding_idx  # (B, T), True at pads

        def step(h, inputs):
            xt, pad_t = inputs
            h_new = gru_cell(p["enc_gru"], xt, h)
            # freeze the state on padded steps so the FINAL h is the last
            # real token's state regardless of right padding
            h_new = jnp.where(pad_t[:, None], h, h_new)
            return h_new, h_new

        h_final, ys = jax.lax.scan(
            step, h0, (x.transpose(1, 0, 2), mask.T))
        return EncoderOut(
            encoder_out=ys.transpose(1, 0, 2),  # (B, T, H)
            encoder_padding_mask=mask,
            src_lengths=src_lengths,
            extras={"final": h_final},  # batch-first: beam reorder = gather
        ), {}

    # -- training forward --------------------------------------------------------

    def forward(self, variables, batch, rng=None, training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng,
            training)
        prev = batch["prev_output_tokens"]  # (B, T_tgt)
        y = embedding(p["tgt_embed"], prev)
        y = dropout(y, cfg.dropout, rng, not training)
        final = enc.extras["final"]  # (B, H)
        b = prev.shape[0]
        h0 = jnp.zeros((b, cfg.hidden_dim), y.dtype)

        def step(h, yt):
            h = gru_cell(p["dec_gru"],
                         jnp.concatenate([yt, final], axis=-1), h)
            return h, h

        _, hs = jax.lax.scan(step, h0, y.transpose(1, 0, 2))
        logits = linear(p["out_proj"], hs.transpose(1, 0, 2))
        return (logits,), {}

    # -- incremental decoding (beam search) -------------------------------------

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        return {"h": jnp.zeros((batch, self.cfg.hidden_dim), dtype)}

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        p = variables["params"]
        y = embedding(p["tgt_embed"], tokens[:, 0])  # (B*K, E)
        x = jnp.concatenate([y, encoder_out.extras["final"]], axis=-1)
        h = gru_cell(p["dec_gru"], x.astype(cache["h"].dtype), cache["h"])
        logits = linear(p["out_proj"], h)
        return logits, {"h": h}, None


@register_model_architecture("tutorial_simple_gru", "tutorial_simple_gru")
def simple_gru_architecture(args):
    args.embed_dim = getattr(args, "embed_dim", 256)
    args.hidden_dim = getattr(args, "hidden_dim", 512)
    args.dropout = getattr(args, "dropout", 0.1)
