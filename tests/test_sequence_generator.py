"""Beam-search fidelity tests against the reference's scripted-probability
expectations (tests/test_sequence_generator.py + tests/utils.py
sequence_generator_setup): exact hypotheses, positional scores and
normalized/lenpen/unnormalized orderings."""

import jax.numpy as jnp
import numpy as np
import pytest

from fbk_fairseq_st_tpu.generation import SequenceGenerator
from fbk_fairseq_st_tpu.models.base import EncoderOut

from .utils import dummy_dictionary


def make_scripted_model(d, beam_probs):
    """A model emitting fixed per-(step, bbsz-row) probabilities
    (reference tests/utils.py TestIncrementalDecoder:194-250)."""
    vocab = len(d)
    eos = d.eos()
    max_steps = 24
    table = np.zeros((max_steps, beam_probs[0].shape[0], vocab), np.float32)
    for step in range(max_steps):
        if step < len(beam_probs):
            table[step, :, eos:] = beam_probs[step]
        else:
            table[step, :, eos] = 1.0
    log_table = jnp.asarray(np.log(np.maximum(table, 1e-30)))

    class ScriptedModel:
        max_target_positions = 100

        def encode(self, variables, src_tokens, src_lengths):
            b, t = src_tokens.shape[0], src_tokens.shape[1]
            return (
                EncoderOut(
                    encoder_out=jnp.zeros((b, t, 1), jnp.float32),
                    encoder_padding_mask=jnp.zeros((b, t), bool),
                ),
                {},
            )

        def init_cache(self, variables, batch, max_len, enc, dtype=jnp.float32):
            return {"dummy": jnp.zeros((batch, 1), dtype)}

        def decode_step(self, variables, tokens, cache, step, enc):
            logits = jax.lax.dynamic_index_in_dim(
                log_table, jnp.minimum(step, max_steps - 1), keepdims=False
            )
            return logits, cache, None

    import jax

    return ScriptedModel(), {"params": {}, "state": {}}


@pytest.fixture
def setup():
    d = dummy_dictionary(vocab_size=2)
    assert len(d) == 6
    eos, w1, w2 = d.eos(), 4, 5
    unk_p = 0.0
    beam_probs = [
        # eos  unk  w1   w2
        np.array(
            [
                [0.0, unk_p, 0.9, 0.1],
                [0.0, unk_p, 0.9, 0.1],
                [0.0, unk_p, 0.7, 0.3],
                [0.0, unk_p, 0.7, 0.3],
            ],
            np.float32,
        ),
        np.array(
            [
                [1.0, unk_p, 0.0, 0.0],
                [0.0, unk_p, 0.9, 0.1],
                [0.25, unk_p, 0.35, 0.4],
                [0.00, unk_p, 0.10, 0.9],
            ],
            np.float32,
        ),
        np.array(
            [
                [0.0, unk_p, 0.1, 0.9],
                [0.6, unk_p, 0.2, 0.2],
                [0.60, unk_p, 0.4, 0.00],
                [0.01, unk_p, 0.0, 0.99],
            ],
            np.float32,
        ),
        np.array(
            [
                [1.0, unk_p, 0.0, 0.0],
                [1.0, unk_p, 0.0, 0.0],
                [0.1, unk_p, 0.5, 0.4],
                [1.0, unk_p, 0.0, 0.0],
            ],
            np.float32,
        ),
    ]
    model = make_scripted_model(d, beam_probs)
    sample = {
        "net_input": {
            "src_tokens": np.array([[4, 5, eos], [4, 5, eos]], np.int64),
            "src_lengths": np.array([2, 2], np.int64),
        }
    }
    return d, w1, w2, model, sample


def assert_hypo(hypo, tokens, pos_probs, normalized=True, lenpen=1.0):
    np.testing.assert_array_equal(hypo["tokens"], np.array(tokens))
    pos_scores = np.log(np.array(pos_probs, np.float32))
    assert len(pos_scores) == len(hypo["tokens"])
    np.testing.assert_allclose(hypo["positional_scores"], pos_scores, atol=1e-4)
    score = pos_scores.sum()
    if normalized:
        score /= len(pos_scores) ** lenpen
    assert abs(score - hypo["score"]) < 1e-4


def test_with_normalization(setup):
    d, w1, w2, model, sample = setup
    eos = d.eos()
    generator = SequenceGenerator(d, beam_size=2)
    hypos = generator.generate([model], sample)
    assert_hypo(hypos[0][0], [w1, eos], [0.9, 1.0])
    assert_hypo(hypos[0][1], [w2, w1, w2, eos], [0.1, 0.9, 0.9, 1.0])
    assert_hypo(hypos[1][0], [w1, w2, w1, eos], [0.7, 0.4, 0.4, 1.0])
    assert_hypo(hypos[1][1], [w1, w2, eos], [0.7, 0.4, 0.6])


def test_without_normalization(setup):
    d, w1, w2, model, sample = setup
    eos = d.eos()
    generator = SequenceGenerator(d, beam_size=2, normalize_scores=False)
    hypos = generator.generate([model], sample)
    assert_hypo(hypos[0][0], [w1, eos], [0.9, 1.0], normalized=False)
    assert_hypo(hypos[0][1], [w2, w1, w2, eos], [0.1, 0.9, 0.9, 1.0], normalized=False)
    assert_hypo(hypos[1][0], [w1, w2, eos], [0.7, 0.4, 0.6], normalized=False)
    assert_hypo(hypos[1][1], [w1, w2, w1, eos], [0.7, 0.4, 0.4, 1.0], normalized=False)


def test_with_lenpen_favoring_short_hypos(setup):
    d, w1, w2, model, sample = setup
    eos = d.eos()
    lenpen = 0.6
    generator = SequenceGenerator(d, beam_size=2, len_penalty=lenpen)
    hypos = generator.generate([model], sample)
    assert_hypo(hypos[0][0], [w1, eos], [0.9, 1.0], lenpen=lenpen)
    assert_hypo(hypos[0][1], [w2, w1, w2, eos], [0.1, 0.9, 0.9, 1.0], lenpen=lenpen)
    assert_hypo(hypos[1][0], [w1, w2, eos], [0.7, 0.4, 0.6], lenpen=lenpen)
    assert_hypo(hypos[1][1], [w1, w2, w1, eos], [0.7, 0.4, 0.4, 1.0], lenpen=lenpen)


def test_with_lenpen_favoring_long_hypos(setup):
    d, w1, w2, model, sample = setup
    eos = d.eos()
    lenpen = 5.0
    generator = SequenceGenerator(d, beam_size=2, len_penalty=lenpen)
    hypos = generator.generate([model], sample)
    assert_hypo(hypos[0][0], [w2, w1, w2, eos], [0.1, 0.9, 0.9, 1.0], lenpen=lenpen)
    assert_hypo(hypos[0][1], [w1, eos], [0.9, 1.0], lenpen=lenpen)
    assert_hypo(hypos[1][0], [w1, w2, w1, eos], [0.7, 0.4, 0.4, 1.0], lenpen=lenpen)
    assert_hypo(hypos[1][1], [w1, w2, eos], [0.7, 0.4, 0.6], lenpen=lenpen)


def test_maxlen(setup):
    d, w1, w2, model, sample = setup
    eos = d.eos()
    generator = SequenceGenerator(d, beam_size=2, max_len_b=2)
    hypos = generator.generate([model], sample)
    assert_hypo(hypos[0][0], [w1, eos], [0.9, 1.0])
    assert_hypo(hypos[0][1], [w2, w2, eos], [0.1, 0.1, 0.6])
    assert_hypo(hypos[1][0], [w1, w2, eos], [0.7, 0.4, 0.6])
