"""Synthetic benchmark tasks (reference fairseq/benchmark/): train at full
speed without any data on disk."""

from . import dummy_bench, dummy_lm, dummy_speech  # noqa: F401
