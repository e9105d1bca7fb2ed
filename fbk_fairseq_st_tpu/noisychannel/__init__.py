"""Noisy-channel n-best reranking (WMT19 recipe).

Counterpart of examples/noisychannel/*: rerank forward-model n-best lists
with a channel (backward) model and an optional language model,
``score = a*logP(y|x) + b*logP(x|y) + c*logP(y)``, optionally per-length
normalized and length-penalized (rerank_utils.get_score :262-285), plus
the random-search weight tuner (rerank_tune.py role).

The reference splits this over seven scripts communicating through
generate/eval_lm output files; here the same pipeline runs in one process
against the in-memory generator/scorer APIs (no intermediate re-binarized
shards), which is both simpler and faster on a TPU host.
"""

from .rerank import get_score, rerank_main  # noqa: F401
