"""Noisy-channel reranking pipeline (reference examples/noisychannel/
rerank.py + rerank_score_bw.py + rerank_score_lm.py + rerank_tune.py +
rerank_utils.get_score)."""

from __future__ import annotations

import logging
import math
import random
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def get_score(a, b, c, target_len, bitext_score1, bitext_score2=None,
              lm_score=None, lenpen=None, src_len=None, tgt_len=None,
              bitext1_backwards=False, bitext2_backwards=False,
              normalize=False):
    """reference rerank_utils.py:262-285, verbatim math."""
    if bitext1_backwards:
        bitext1_norm = src_len
    else:
        bitext1_norm = tgt_len
    if bitext_score2 is not None:
        if bitext2_backwards:
            bitext2_norm = src_len
        else:
            bitext2_norm = tgt_len
    else:
        bitext2_norm = 1
        bitext_score2 = 0
    if normalize:
        score = (
            a * bitext_score1 / bitext1_norm
            + b * bitext_score2 / bitext2_norm
            + c * (lm_score or 0) / src_len
        )
    else:
        score = a * bitext_score1 + b * bitext_score2 + c * (lm_score or 0)
    if lenpen is not None:
        score /= target_len ** float(lenpen)
    return score


def _pad_batch(rows: List[np.ndarray], pad: int):
    width = max(len(r) for r in rows)
    out = np.full((len(rows), width), pad, np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def _score_pairs(model, variables, src_rows, tgt_rows, pad, eos):
    """Teacher-forced sum log P(tgt | src) for aligned token-row lists."""
    import jax
    import jax.numpy as jnp

    src = _pad_batch(src_rows, pad)
    tgt = _pad_batch(tgt_rows, pad)
    prev = np.full_like(tgt, pad)
    prev[:, 0] = eos
    for i, r in enumerate(tgt_rows):
        prev[i, 1: len(r)] = r[:-1]
    batch = {
        "src_tokens": jnp.asarray(src),
        "src_lengths": jnp.asarray(
            np.array([len(r) for r in src_rows], np.int64)
        ),
        "prev_output_tokens": jnp.asarray(prev),
    }
    (logits, _), _ = model.forward(variables, batch, training=False)
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pos = jnp.take_along_axis(lprobs, jnp.asarray(tgt)[..., None], axis=-1)[
        ..., 0
    ]
    mask = jnp.asarray(tgt) != pad
    return np.asarray(jnp.sum(pos * mask, axis=1))


def _score_lm(model, variables, rows, pad, eos):
    import jax
    import jax.numpy as jnp

    tgt = _pad_batch(rows, pad)
    prev = np.full_like(tgt, pad)
    prev[:, 0] = eos
    for i, r in enumerate(rows):
        prev[i, 1: len(r)] = r[:-1]
    batch = {
        "src_tokens": jnp.asarray(prev),
        "src_lengths": jnp.asarray(np.array([len(r) for r in rows], np.int64)),
        "target": jnp.asarray(tgt),
    }
    (logits, _), _ = model.forward(variables, batch, training=False)
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pos = jnp.take_along_axis(lprobs, jnp.asarray(tgt)[..., None], axis=-1)[
        ..., 0
    ]
    mask = jnp.asarray(tgt) != pad
    return np.asarray(jnp.sum(pos * mask, axis=1))


def _collect_nbest(args, task, models):
    """Forward generation: per sentence the n-best (tokens, forward score
    sum, source tokens, reference tokens)."""
    from ..generation import SequenceGenerator

    tgt_dict = task.target_dictionary
    gen = SequenceGenerator(
        tgt_dict,
        beam_size=args.num_rescore,
        max_len_a=args.max_len_a,
        max_len_b=args.max_len_b,
    )
    itr = task.get_batch_iterator(
        dataset=task.dataset(args.gen_subset),
        max_tokens=args.max_tokens,
        max_sentences=getattr(args, "max_sentences", None),
        max_positions=task.max_positions(),
        ignore_invalid_inputs=True,
    ).next_epoch_itr(shuffle=False)
    entries = {}
    for sample in itr:
        if not sample:
            continue
        hypos = gen.generate(models, sample)
        for i, sent_id in enumerate(np.asarray(sample["id"]).tolist()):
            src = np.asarray(sample["net_input"]["src_tokens"][i])
            src = src[src != task.source_dictionary.pad()]
            ref = np.asarray(sample["target"][i])
            ref = ref[ref != tgt_dict.pad()]
            if len(src) == 0 or len(ref) == 0:
                continue  # all-pad dummy row (fixed-shape batch fill)
            nbest = []
            for h in hypos[i][: args.num_rescore]:
                toks = np.asarray(h["tokens"])
                nbest.append(
                    (toks, float(np.asarray(h["positional_scores"]).sum()))
                )
            entries[sent_id] = (src, ref, nbest)
    return entries


def _rerank_pass(entries, bw_scores, lm_scores, tgt_dict, a, b, c, lenpen,
                 normalize):
    """Pick the best hypo per sentence; return (BLEU, picked strings)."""
    from ..scoring import bleu

    scorer = bleu.Scorer(tgt_dict.pad(), tgt_dict.eos(), tgt_dict.unk())
    picked = []
    for sent_id in sorted(entries):
        src, ref, nbest = entries[sent_id]
        best, best_score = None, -math.inf
        for j, (toks, fwd_score) in enumerate(nbest):
            hypo_str = tgt_dict.string(toks)
            target_len = max(len(hypo_str.split()), 1)
            score = get_score(
                a, b, c, target_len, fwd_score,
                bitext_score2=(
                    bw_scores[sent_id][j] if bw_scores is not None else None
                ),
                lm_score=(
                    lm_scores[sent_id][j] if lm_scores is not None else 0.0
                ),
                lenpen=lenpen,
                src_len=max(len(src), 1),
                tgt_len=max(len(toks), 1),
                bitext2_backwards=True,
                normalize=normalize,
            )
            if score > best_score:
                best_score, best = score, toks
        scorer.add(ref.astype(np.int32), np.asarray(best, np.int32))
        picked.append(tgt_dict.string(best))
    return scorer, picked


def rerank_main(args):
    """Generate n-best with the forward model, score with the channel
    (backward) model and optional LM, combine, and report BLEU. With
    --tune, random-search (a, b, c, lenpen) like rerank_tune.py."""
    from ..registry import TASKS
    from ..train import checkpoint as checkpoint_utils

    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    tgt_dict = task.target_dictionary

    fwd_models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"), task=task
    )
    entries = _collect_nbest(args, task, fwd_models)

    bw_scores = None
    if getattr(args, "score_model", None):
        bw_models, _ = checkpoint_utils.load_model_ensemble(
            args.score_model.split(":"), task=task
        )
        bw_model, bw_vars = bw_models[0]
        bw_scores = {}
        for sent_id in sorted(entries):
            src, _, nbest = entries[sent_id]
            rows_y = [toks for toks, _ in nbest]
            rows_x = [src for _ in nbest]
            # channel model scores P(x | y): hypo as source, source as target
            bw_scores[sent_id] = _score_pairs(
                bw_model, bw_vars, rows_y, rows_x,
                tgt_dict.pad(), tgt_dict.eos(),
            )

    lm_scores = None
    if getattr(args, "lm_path", None):
        lm_models, _ = checkpoint_utils.load_model_ensemble(
            args.lm_path.split(":"), task=task
        )
        lm_model, lm_vars = lm_models[0]
        lm_scores = {}
        for sent_id in sorted(entries):
            _, _, nbest = entries[sent_id]
            lm_scores[sent_id] = _score_lm(
                lm_model, lm_vars, [toks for toks, _ in nbest],
                tgt_dict.pad(), tgt_dict.eos(),
            )

    if getattr(args, "tune", False):
        rng = random.Random(getattr(args, "seed", 1))
        best = (-math.inf, None)
        for _ in range(args.tune_iterations):
            a = rng.uniform(*args.weight1_range)
            b = rng.uniform(*args.weight2_range)
            c = rng.uniform(*args.weight3_range) if lm_scores else 0.0
            lenpen = rng.uniform(*args.lenpen_range)
            scorer, _ = _rerank_pass(
                entries, bw_scores, lm_scores, tgt_dict, a, b, c, lenpen,
                args.normalize,
            )
            score = scorer.score()
            if score > best[0]:
                best = (score, (a, b, c, lenpen))
                logger.info(
                    "new best BLEU %.2f at a=%.3f b=%.3f c=%.3f lenpen=%.3f",
                    score, a, b, c, lenpen,
                )
        args.weight1, args.weight2, args.weight3, args.lenpen = best[1]
        logger.info("tuned weights: %s (BLEU %.2f)", best[1], best[0])

    scorer, picked = _rerank_pass(
        entries, bw_scores, lm_scores, tgt_dict,
        args.weight1, args.weight2, args.weight3, args.lenpen,
        args.normalize,
    )
    for i, hypo in enumerate(picked):
        print(f"R-{i}\t{hypo}")
    print(f"Reranked BLEU: {scorer.result_string()}")
    return scorer
