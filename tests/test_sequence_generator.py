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


# ---------------------------------------------------------------------------
# search-strategy fidelity (reference tests/test_sequence_generator.py
# diverse-beam/sampling sections; expectations hand-derived from the
# scripted tables below)
# ---------------------------------------------------------------------------

def _three_token_setup(step0, step1=None):
    """1 sentence, vocab {w1,w2,w3}: step0/step1 rows are [eos, unk, w1,
    w2, w3] probability lists per bbsz row; remaining steps emit eos=1."""
    d = dummy_dictionary(vocab_size=3)
    rows = [np.array(step0, np.float32)]
    if step1 is not None:
        rows.append(np.array(step1, np.float32))
    model = make_scripted_model(d, rows)
    sample = {
        "net_input": {
            "src_tokens": np.array([[4, 5, d.eos()]], np.int64),
            "src_lengths": np.array([2], np.int64),
        }
    }
    return d, model, sample


def test_diverse_beam_search_differs_from_vanilla_exactly():
    """Step 0, probs w1=.5 w2=.3 w3=.2: vanilla beam-2 keeps {w1, w2};
    diverse (2 groups, strength 2) penalizes group 1 for group 0's
    candidates {w1, w2}, so it keeps {w1, w3}."""
    from fbk_fairseq_st_tpu.generation.search import DiverseBeamSearch

    step0 = [[0.0, 0.0, 0.5, 0.3, 0.2]] * 2
    d, model, sample = _three_token_setup(step0)
    w1, w2, w3, eos = 4, 5, 6, d.eos()

    vanilla = SequenceGenerator(d, beam_size=2, max_len_b=10)
    hyp = vanilla.generate([model], sample)[0]
    assert_hypo(hyp[0], [w1, eos], [0.5, 1.0])
    assert_hypo(hyp[1], [w2, eos], [0.3, 1.0])

    diverse = SequenceGenerator(
        d, beam_size=2, max_len_b=10,
        search_strategy=DiverseBeamSearch(
            d, num_groups=2, diversity_strength=2.0
        ),
    )
    hyp = diverse.generate([model], sample)[0]
    assert_hypo(hyp[0], [w1, eos], [0.5, 1.0])
    # the diverse pick; group 0 also emits eos at step 1, so group 1's
    # recorded eos score carries the diversity penalty (exp(-2)) — the
    # reference's scores behave identically (penalized lprobs feed the
    # beam step)
    assert_hypo(hyp[1], [w3, eos], [0.2, float(np.exp(-2.0))])


def test_diverse_siblings_rank_penalty_flips_selection():
    """Step-1 candidates: beam0's rank-2 (w1w2, lp -1.7428) narrowly beats
    beam1's rank-1 (w2w3, lp -1.745) under vanilla beam; the sibling rank
    penalty (rate 0.5: rank-2 pays 1.0, rank-1 pays 0.5) flips it."""
    from fbk_fairseq_st_tpu.generation.search import DiverseSiblingsSearch

    step0 = [[0.0, 0.0, 0.5, 0.3, 0.2]] * 2
    step1 = [
        [0.0, 0.0, 0.55, 0.35, 0.10],   # beam 0 = the w1 path
        [0.0, 0.0, 0.20, 0.218, 0.582],  # beam 1 = the w2 path
    ]
    d, model, sample = _three_token_setup(step0, step1)
    w1, w2, w3, eos = 4, 5, 6, d.eos()

    vanilla = SequenceGenerator(d, beam_size=2, max_len_b=10)
    hyp = vanilla.generate([model], sample)[0]
    assert [int(t) for t in hyp[0]["tokens"]] == [w1, w1, eos]
    assert [int(t) for t in hyp[1]["tokens"]] == [w1, w2, eos]

    siblings = SequenceGenerator(
        d, beam_size=2, max_len_b=10,
        search_strategy=DiverseSiblingsSearch(d, diversity_rate=0.5),
    )
    hyp = siblings.generate([model], sample)[0]
    tok_sets = {tuple(int(t) for t in h["tokens"]) for h in hyp}
    assert (w1, w1, eos) in tok_sets
    assert (w2, w3, eos) in tok_sets, tok_sets  # the flipped pick


def test_sampling_topk1_is_greedy_and_scores_unrenormalized():
    """top-k=1 sampling collapses to argmax regardless of the PRNG draw,
    and positional scores are the ORIGINAL log-probs (not renormalized
    over the truncated support), like the reference."""
    from fbk_fairseq_st_tpu.generation.search import Sampling

    step0 = [[0.0, 0.0, 0.6, 0.3, 0.1]]
    step1 = [[0.0, 0.0, 0.05, 0.9, 0.05]]
    d, model, sample = _three_token_setup(step0, step1)
    w1, w2, eos = 4, 5, d.eos()

    gen = SequenceGenerator(
        d, beam_size=1, max_len_b=10,
        search_strategy=Sampling(d, sampling_topk=1),
    )
    hyp = gen.generate([model], sample)[0]
    assert_hypo(hyp[0], [w1, w2, eos], [0.6, 0.9, 1.0])


def test_sampling_is_seed_deterministic_and_valid():
    step0 = [[0.0, 0.0, 0.4, 0.35, 0.25]] * 2  # one row per bbsz beam
    step1 = [[0.2, 0.0, 0.3, 0.3, 0.2]] * 2
    d, model, sample = _three_token_setup(step0, step1)
    from fbk_fairseq_st_tpu.generation.search import Sampling

    def run():
        gen = SequenceGenerator(
            d, beam_size=2, max_len_b=10,
            search_strategy=Sampling(d),
        )
        return gen.generate([model], sample)[0]

    a, b = run(), run()
    for ha, hb in zip(a, b):
        np.testing.assert_array_equal(ha["tokens"], hb["tokens"])
        # every hypo ends in eos, contains only real tokens, and its
        # score is the sum of its positional log-probs
        toks = [int(t) for t in ha["tokens"]]
        assert toks[-1] == d.eos()
        assert all(t >= 4 or t == d.eos() for t in toks)
        np.testing.assert_allclose(
            np.asarray(ha["positional_scores"]).sum(),
            ha["score"] * len(toks),
            atol=1e-4,
        )


def test_prefix_tokens_force_the_continuation(setup):
    """prefix_tokens pin the first target positions; hypotheses must all
    start with the prefix and carry its true model scores."""
    d, w1, w2, model, sample = setup
    gen = SequenceGenerator(d, beam_size=2, max_len_b=10)
    prefix = np.array([[w2], [w2]], np.int64)
    out = gen.generate([model], sample, prefix_tokens=prefix)
    for sent, first_probs in zip(out, ([0.1], [0.3])):
        for h in sent:
            assert int(h["tokens"][0]) == w2
        # the forced token's positional score is its real model prob
        np.testing.assert_allclose(
            h["positional_scores"][0], np.log(first_probs[0]), atol=1e-4
        )


def test_sampling_topp_support_is_the_smallest_exceeding_set():
    """Nucleus truncation keeps exactly the tokens whose EXCLUSIVE
    cumulative mass is below p (the reference's lt-mask plus one more
    word, search.py:195-204): probs [.4,.3,.2,.1] with p=.65 may only
    ever sample the top-2; with p=.71 the top-3."""
    import jax

    from fbk_fairseq_st_tpu.generation.search import Sampling

    d = dummy_dictionary(vocab_size=4)  # tokens 4..7
    probs = np.zeros((1, 1, len(d)), np.float32)
    probs[0, 0, 4:8] = [0.4, 0.3, 0.2, 0.1]
    lprobs = jnp.asarray(np.log(np.maximum(probs, 1e-30)))
    scores = jnp.zeros((1, 1), jnp.float32)

    def support(strategy, n=400):
        seen = set()
        for i in range(n):
            out = strategy.step(1, lprobs, scores, jax.random.PRNGKey(i))
            seen.update(int(t) for t in np.asarray(out.indices).ravel())
        return seen

    assert support(Sampling(d, sampling_topp=0.65)) == {4, 5}
    assert support(Sampling(d, sampling_topp=0.71)) == {4, 5, 6}
    assert support(Sampling(d, sampling_topk=1)) == {4}
    assert support(Sampling(d, sampling_topk=3)) == {4, 5, 6}
    assert support(Sampling(d), n=600) == {4, 5, 6, 7}
