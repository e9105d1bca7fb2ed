"""Shared test fixtures (analog of reference tests/utils.py +
tests/speech_recognition/asr_test_base.py DummyTask/dummy dictionaries)."""

import argparse

import numpy as np

from fbk_fairseq_st_tpu.data import Dictionary


def dummy_dictionary(vocab_size: int = 20) -> Dictionary:
    d = Dictionary()
    for i in range(vocab_size):
        d.add_symbol(f"tok{i}")
    d.finalize(padding_factor=1)
    return d


class DummyTask:
    def __init__(self, tgt_dict=None, src_dict=None):
        self.target_dictionary = tgt_dict or dummy_dictionary()
        self.source_dictionary = src_dict

    @property
    def dictionary(self):
        return self.target_dictionary

    # trainer hooks (base Task no-ops)
    def augment_batch(self, batch, rng):
        return batch

    def prepare_sample(self, sample, num_updates):
        return sample

    def valid_step_extra(self, sample, trainer):
        return {}

    def reduce_metrics(self, logging_outputs, criterion, metrics):
        if hasattr(criterion, "reduce_metrics"):
            criterion.reduce_metrics(logging_outputs, metrics)


def model_args(arch: str = "conv_transformer", **overrides) -> argparse.Namespace:
    """Minimal args namespace; arch presets fill the rest."""
    args = argparse.Namespace(arch=arch, criterion="label_smoothed_cross_entropy")
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def random_fbank_batch(rng: np.random.RandomState, b=2, t=32, f=40, tgt_len=7, vocab=24):
    lengths = rng.randint(t // 2, t + 1, size=b)
    lengths[0] = t
    tgt = rng.randint(4, vocab, size=(b, tgt_len))
    return {
        "src_tokens": rng.randn(b, t, f).astype(np.float32),
        "src_lengths": lengths.astype(np.int32),
        "prev_output_tokens": np.concatenate(
            [np.full((b, 1), 2), tgt[:, :-1]], axis=1
        ).astype(np.int32),
        "target": tgt.astype(np.int32),
    }
