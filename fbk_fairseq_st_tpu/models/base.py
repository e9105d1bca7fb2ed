"""Model ABCs and the EncoderOut contract.

Counterparts of the reference's FairseqEncoder / FairseqIncrementalDecoder /
FairseqEncoderDecoderModel (fairseq/models/fairseq_{encoder,incremental_
decoder,model}.py) in functional form: a *model* is an object holding frozen
configs; parameters and mutable state (BatchNorm running stats) live in
pytrees passed explicitly. All arrays are batch-first.

EncoderOut mirrors the reference NamedTuple (fairseq/models/
fairseq_encoder.py EncoderOut; CTC variant conv_transformer.py:28-32).
``reorder_encoder_out`` (beam replication) becomes a plain gather on the
batch axis, applied by generators via jax.tree_util.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class EncoderOut(NamedTuple):
    encoder_out: jax.Array  # (B, T, C)
    encoder_padding_mask: Optional[jax.Array]  # (B, T) bool, True at pads
    src_lengths: Optional[jax.Array] = None  # (B,)
    # CTC-compression extras (CTCAwareEncoderOut in the reference)
    ctc_out: Optional[jax.Array] = None  # (B, T_ctc, V_src)
    ctc_padding_mask: Optional[jax.Array] = None  # (B, T_ctc)
    ctc_lengths: Optional[jax.Array] = None  # (B,)
    # context-aware extras (INTERSPEECH 2020) — ride the EncoderOut so
    # generators replicate/reorder them with the rest of the encoder state
    context_out: Optional[jax.Array] = None  # (B, T_ctx, C)
    context_padding_mask: Optional[jax.Array] = None  # (B, T_ctx)
    # model-specific batch-first extras (e.g. LSTM final states); a dict of
    # (B, ...) arrays that tree_map reorders with everything else
    extras: Optional[Any] = None


def reorder_encoder_out(encoder_out: EncoderOut, new_order) -> EncoderOut:
    """Gather every batch-axis tensor by *new_order* (beam replication /
    reorder; reference reorder_encoder_out conv_transformer.py:315-345)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, new_order, axis=0), encoder_out
    )


class Model:
    """Base encoder-decoder model interface.

    Subclasses implement:
      init(key) -> variables {'params': ..., 'state': ...}
      forward(variables, batch, rng, training) -> (net_output, new_state)
      encode(variables, src_tokens, src_lengths, rng, training)
          -> (EncoderOut, new_state)
      decode(params, prev_output_tokens, encoder_out, rng, training) -> logits
      and for incremental decoding:
      init_cache(params, batch, max_len, encoder_out, dtype) -> cache
      decode_step(params, tokens, cache, step, encoder_out) -> (logits, cache)
    """

    # class-level: max source/target positions (reference max_positions())
    max_source_positions: int = 1024
    max_target_positions: int = 1024

    @classmethod
    def add_args(cls, parser) -> None:
        pass

    @classmethod
    def build_model(cls, args, task) -> "Model":
        raise NotImplementedError

    @property
    def supported_targets(self):
        """LM target types this model can train against (reference
        fairseq_model.py:469-471; bidirectional encoders override with
        {'self'})."""
        return {"future"}

    def init(self, key):
        raise NotImplementedError

    def get_normalized_probs(self, net_output, log_probs: bool = True):
        """net_output -> (log-)probs over the vocabulary (reference
        BaseFairseqModel.get_normalized_probs)."""
        logits = net_output[0] if isinstance(net_output, tuple) else net_output
        logits = logits.astype(jnp.float32)
        if log_probs:
            return jax.nn.log_softmax(logits, axis=-1)
        return jax.nn.softmax(logits, axis=-1)
