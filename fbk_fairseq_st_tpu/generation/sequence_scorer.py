"""Teacher-forced scoring of reference targets (--score-reference).

Counterpart of fairseq/sequence_scorer.py:1-127: returns, per sentence, one
hypo with the gold tokens, their positional log-probs and the
length-normalized score.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SequenceScorer:
    def __init__(self, tgt_dict, compute_alignment: bool = False, eos=None):
        self.pad = tgt_dict.pad()
        self.eos = eos if eos is not None else tgt_dict.eos()
        self.compute_alignment = compute_alignment

    def generate(self, models, sample, prefix_tokens=None, **kwargs):
        net_input = sample["net_input"]
        batch = {
            "src_tokens": jnp.asarray(net_input["src_tokens"]),
            "src_lengths": jnp.asarray(net_input["src_lengths"]),
            "prev_output_tokens": jnp.asarray(net_input["prev_output_tokens"]),
        }
        target = np.asarray(sample["target"])

        avg_probs = None
        for model, variables in models:
            (logits, _), _ = model.forward(variables, batch, training=False)
            lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            probs = np.asarray(lprobs)
            if avg_probs is None:
                avg_probs = probs
            else:
                avg_probs = np.logaddexp(avg_probs, probs)
        if len(models) > 1:
            avg_probs = avg_probs - np.log(len(models))

        hypos = []
        for i in range(target.shape[0]):
            tgt = target[i]
            keep = tgt != self.pad
            toks = tgt[keep]
            pos_scores = np.take_along_axis(
                avg_probs[i], tgt[:, None], axis=-1
            )[:, 0][keep]
            score = float(pos_scores.sum() / max(len(toks), 1))
            hypos.append(
                [
                    {
                        "tokens": toks,
                        "score": score,
                        "positional_scores": pos_scores.astype(np.float32),
                        "alignment": None,
                        "attention": None,
                    }
                ]
            )
        return hypos
