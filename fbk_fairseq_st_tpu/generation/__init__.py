"""Inference engines: beam search, scoring, and search-strategy dispatch.

``build_generator`` mirrors the reference FairseqTask.build_generator
dispatch (fairseq/tasks/fairseq_task.py:230-313): --sampling ->
Sampling, --diverse-beam-groups -> DiverseBeamSearch, --diversity-rate ->
DiverseSiblingsSearch, --match-source-len -> LengthConstrainedBeamSearch,
else BeamSearch; --score-reference -> SequenceScorer.
"""

from __future__ import annotations

from .search import (  # noqa: F401
    BeamSearch,
    DiverseBeamSearch,
    DiverseSiblingsSearch,
    LengthConstrainedBeamSearch,
    Sampling,
)
from .sequence_generator import EnsembleModel, SequenceGenerator  # noqa: F401
from .sequence_scorer import SequenceScorer  # noqa: F401


def build_generator(task, models, args):
    if getattr(args, "score_reference", False):
        return SequenceScorer(task.target_dictionary)

    sampling = getattr(args, "sampling", False)
    sampling_topk = getattr(args, "sampling_topk", -1)
    sampling_topp = getattr(args, "sampling_topp", -1.0)
    diverse_beam_groups = getattr(args, "diverse_beam_groups", -1)
    diverse_beam_strength = getattr(args, "diverse_beam_strength", 0.5)
    diversity_rate = getattr(args, "diversity_rate", -1)
    match_source_len = getattr(args, "match_source_len", False)

    if (
        sum(
            int(cond)
            for cond in [
                sampling,
                diverse_beam_groups > 0,
                match_source_len,
                diversity_rate > 0,
            ]
        )
        > 1
    ):
        raise ValueError("Provided Search parameters are mutually exclusive.")
    assert sampling_topk < 0 or sampling, "--sampling-topk requires --sampling"
    assert sampling_topp < 0 or sampling, "--sampling-topp requires --sampling"

    tgt_dict = task.target_dictionary
    if sampling:
        search_strategy = Sampling(tgt_dict, sampling_topk, sampling_topp)
    elif diverse_beam_groups > 0:
        search_strategy = DiverseBeamSearch(
            tgt_dict, diverse_beam_groups, diverse_beam_strength
        )
    elif match_source_len:
        search_strategy = LengthConstrainedBeamSearch(
            tgt_dict, min_len_a=1, min_len_b=0, max_len_a=1, max_len_b=0
        )
    elif diversity_rate > -1:
        search_strategy = DiverseSiblingsSearch(tgt_dict, diversity_rate)
    else:
        search_strategy = BeamSearch(tgt_dict)

    return SequenceGenerator(
        tgt_dict,
        beam_size=getattr(args, "beam", 5),
        max_len_a=getattr(args, "max_len_a", 0),
        max_len_b=getattr(args, "max_len_b", 200),
        min_len=getattr(args, "min_len", 1),
        normalize_scores=(not getattr(args, "unnormalized", False)),
        len_penalty=getattr(args, "lenpen", 1),
        unk_penalty=getattr(args, "unkpen", 0),
        temperature=getattr(args, "temperature", 1.0),
        match_source_len=match_source_len,
        no_repeat_ngram_size=getattr(args, "no_repeat_ngram_size", 0),
        search_strategy=search_strategy,
        seed=getattr(args, "seed", 1),
    )
