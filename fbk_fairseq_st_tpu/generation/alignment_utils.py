"""Attention-based alignment extraction (--print-alignment).

Counterpart of the reference SequenceGeneratorWithAlignment
(fairseq/sequence_generator.py:802-908): after beam search, re-run the model
teacher-forced on the chosen hypothesis with need_attn and take, per target
step, the argmax source position of the (head-averaged) last-layer
cross-attention — the same attention the reference records during decoding.
One extra batched forward instead of threading (B*K, T_tgt, T_src) buffers
through the decode loop.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def extract_hard_alignment(attn, src_len: int, tgt_len: int) -> List[str]:
    """attn: (T_tgt, T_src) -> 'srcidx-tgtidx' pairs (reference
    utils.extract_hard_alignment semantics)."""
    align = np.argmax(np.asarray(attn[:tgt_len, :src_len]), axis=1)
    return [f"{int(s)}-{int(t)}" for t, s in enumerate(align)]


def attach_alignments(model, variables, sample, hypos, pad: int, eos: int):
    """Compute and attach hypo['alignment'] for the best hypothesis of each
    sentence."""
    src_tokens = jnp.asarray(sample["net_input"]["src_tokens"])
    src_lengths = jnp.asarray(sample["net_input"]["src_lengths"])
    bsz = src_tokens.shape[0]
    max_hyp = max((len(h[0]["tokens"]) for h in hypos if h), default=1)

    prev = np.full((bsz, max_hyp), pad, np.int64)
    tgt_lens = np.zeros((bsz,), np.int64)
    for i, sent in enumerate(hypos):
        if not sent:
            continue
        toks = np.asarray(sent[0]["tokens"])
        prev_row = np.concatenate([[eos], toks[:-1]])
        prev[i, : len(prev_row)] = prev_row
        tgt_lens[i] = len(toks)

    enc, _ = model.encode(variables, src_tokens, src_lengths)
    _, extra = model.decoder(
        variables["params"]["decoder"],
        jnp.asarray(prev),
        encoder_out=enc.encoder_out,
        encoder_padding_mask=enc.encoder_padding_mask,
        need_attn=True,
    )
    attn = extra.get("attn")
    if attn is None:
        return hypos
    attn = jax.device_get(attn)  # (B, T_tgt, T_src)
    src_valid = jax.device_get(
        jnp.sum(~enc.encoder_padding_mask, axis=1)
    )
    for i, sent in enumerate(hypos):
        if not sent or int(src_valid[i]) == 0 or int(tgt_lens[i]) == 0:
            continue  # fixed-shape padding rows
        sent[0]["alignment"] = extract_hard_alignment(
            attn[i], int(src_valid[i]), int(tgt_lens[i])
        )
    return hypos
