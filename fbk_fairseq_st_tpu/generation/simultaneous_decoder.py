"""Greedy simultaneous decoding agent for monotonic-attention models.

Counterpart of the reference's simultaneous inference stack
(examples/simultaneous_translation: transformer_monotonic_attention.py
decision_from_states/predict_from_states :92-135 + utils/latency.py
LatencyInference :244-280). The reference drives these hooks from an
external SimulEval-style server (a documented external dependency, like
wav2letter); this module provides the same read/write policy as a
self-contained host loop so the models are usable end to end:

  * READ while the monotonic attention's p_choose at the current source
    pointer is < 0.5 (i.e. the model wants more context), until the source
    is exhausted;
  * WRITE the argmax token otherwise; stop at eos or max_len.

The pointer advances per the fastest layer/head (the reference's
get_fastest_pointer), with heads averaged inside a layer for stability.
Per-token delays (how much source had been read when each target token was
emitted) are returned along with the standard latency metrics (AP / AL /
DAL) computed exactly as utils/latency.py does at inference."""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..ops.latency import (
    average_lagging,
    average_proportion,
    differentiable_average_lagging,
)


def latency_metrics(delays: np.ndarray, src_len: int) -> Dict[str, float]:
    """delays: (T,) 1-based read counts per emitted token (reference
    LatencyInference :244-280; delays at/after the last source position
    count as src_len)."""
    d = np.minimum(np.asarray(delays, np.float32), src_len)[None, :]
    src = jnp.asarray([[float(src_len)]])
    d = jnp.asarray(d)
    return {
        "average_proportion": float(
            average_proportion(d, src, start_from_zero=False)[0, 0]
        ),
        "average_lagging": float(
            average_lagging(d, src, start_from_zero=False)[0, 0]
        ),
        "differentiable_average_lagging": float(
            differentiable_average_lagging(d, src, start_from_zero=False)[0, 0]
        ),
    }


def greedy_simul_decode(
    model,
    variables,
    src_tokens: np.ndarray,
    eos: int,
    max_len: int = 200,
    read_threshold: float = 0.5,
) -> Dict[str, object]:
    """Decode ONE sentence simultaneously.

    src_tokens: (S,) source ids (no padding). Returns {'tokens': list,
    'delays': list (source tokens read when each target token was written),
    'latency': {AP, AL, DAL}}."""
    src = np.asarray(src_tokens)
    s_total = len(src)
    mono_cfg = model.mono_cfg
    waitk = (
        mono_cfg.waitk_lagging if mono_cfg.simul_type == "waitk" else None
    )

    tokens: List[int] = [eos]
    delays: List[int] = []
    n_read = 1 if waitk is None else min(waitk, s_total)

    while len(tokens) - 1 < max_len:
        prefix = src[:n_read][None, :]
        prev = np.asarray(tokens, np.int64)[None, :]
        (logits, extra), _ = model.forward(
            variables,
            {
                "src_tokens": prefix,
                "src_lengths": np.array([n_read], np.int64),
                "prev_output_tokens": prev,
            },
        )
        if waitk is None:
            # fastest pointer across layers; heads averaged within a layer
            # (reference get_fastest_pointer / decision_from_states)
            pcs = [
                np.asarray(item["p_choose"][0]).mean(axis=0)[-1]  # (S_read,)
                for item in extra["attn_list"]
            ]
            p_write = max(
                pc[min(len(pc) - 1, len(tokens) - 1, n_read - 1)]
                for pc in pcs
            )
            if p_write < read_threshold and n_read < s_total:
                n_read += 1
                continue
        next_tok = int(np.asarray(logits)[0, -1].argmax())
        tokens.append(next_tok)
        delays.append(n_read)
        if next_tok == eos:
            break
        if waitk is not None and n_read < s_total:
            n_read = min(n_read + 1, s_total)

    out_tokens = tokens[1:]
    return {
        "tokens": out_tokens,
        "delays": delays,
        "latency": latency_metrics(np.asarray(delays, np.float32), s_total)
        if delays
        else {},
    }
