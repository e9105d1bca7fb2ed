"""Batched beam search as one jitted fixed-shape lax.while_loop.

Counterpart of the reference SequenceGenerator (fairseq/sequence_generator.py
:18-651), preserving its decision procedure step by step:

  * max_len = min(a*src_len + b, model_max - 1) (:180-188);
  * encoder runs once, then is beam-replicated by a batch gather (:192-198);
  * per step: pad masked to -inf, unk penalized (:263-266), min_len masks
    eos, step==max_len forces eos (:268-284), prefix-token constraints,
    no-repeat-ngram banning (:304-305);
  * search.step over (B, K, V) cumulative scores returns 2K candidates
    (:307-311);
  * eos candidates within the TOP K finalize with length-penalty
    normalization score/(step+1)^lenpen (:483-545); the remaining top K
    non-eos candidates continue (the reference's active_mask/blacklist
    mechanics :383-403, reproduced exactly);
  * a sentence finishes when K hypos are finalized or step hits max_len.

Where the reference shrinks the batch as sentences finish (:352-380), this
build keeps static shapes and masks finished rows — the compiled program is
one while_loop with a preallocated KV cache; beam reorder is a gather.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import reorder_encoder_out
from ..ops.core import NEG_INF
from .postprocess import collect_hypotheses
from .search import BeamSearch, SearchOutput


class EnsembleModel:
    """Log-prob averaging over models with per-model caches
    (reference sequence_generator.py:653-800)."""

    def __init__(self, models):
        # models: list of (model, variables)
        self.models = models

    def max_decoder_positions(self) -> int:
        return min(m.max_target_positions for m, _ in self.models)

    def forward_encoder(self, batch):
        outs = []
        for model, variables in self.models:
            enc, _ = model.encode(variables, batch["src_tokens"], batch["src_lengths"])
            outs.append(enc)
        return outs

    def init_caches(self, encoder_outs, batch: int, max_len: int, dtype):
        return [
            model.init_cache(variables, batch, max_len, enc, dtype)
            for (model, variables), enc in zip(self.models, encoder_outs)
        ]

    def forward_decoder(
        self, tokens, encoder_outs, caches, step, temperature=1.0, **decode_kwargs
    ):
        """tokens: (BK, 1). Returns (avg lprobs (BK, V), new caches)."""
        lprobs_all = []
        new_caches = []
        for (model, variables), enc, cache in zip(self.models, encoder_outs, caches):
            logits, new_cache, _ = model.decode_step(
                variables, tokens, cache, step, enc, **decode_kwargs
            )
            logits = logits.astype(jnp.float32)
            if temperature != 1.0:
                logits = logits / temperature
            lprobs_all.append(jax.nn.log_softmax(logits, axis=-1))
            new_caches.append(new_cache)
        if len(lprobs_all) == 1:
            return lprobs_all[0], new_caches
        avg = jax.nn.logsumexp(jnp.stack(lprobs_all), axis=0) - math.log(
            len(lprobs_all)
        )
        return avg, new_caches


class SequenceGenerator:
    def __init__(
        self,
        tgt_dict,
        beam_size: int = 1,
        max_len_a: float = 0,
        max_len_b: int = 200,
        min_len: int = 1,
        normalize_scores: bool = True,
        len_penalty: float = 1.0,
        unk_penalty: float = 0.0,
        temperature: float = 1.0,
        match_source_len: bool = False,
        no_repeat_ngram_size: int = 0,
        search_strategy=None,
        seed: int = 1,
        eos: Optional[int] = None,
    ):
        self.tgt_dict = tgt_dict
        self.pad = tgt_dict.pad()
        self.unk = tgt_dict.unk()
        # eos override: mBART-style generation terminates on the target
        # language token instead of </s> (reference
        # translation_from_pretrained_bart.py:92-104)
        self.eos = eos if eos is not None else tgt_dict.eos()
        self.vocab_size = len(tgt_dict)
        self.beam_size = min(beam_size, self.vocab_size - 1)
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.min_len = min_len
        self.normalize_scores = normalize_scores
        self.len_penalty = len_penalty
        self.unk_penalty = unk_penalty
        self.temperature = temperature
        self.match_source_len = match_source_len
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self.search = search_strategy or BeamSearch(tgt_dict)
        self.seed = seed
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def generate(self, models, sample, prefix_tokens=None, bos_token=None,
                 encoder_outs=None, **kwargs):
        """models: list of (model, variables); sample: collated host batch.

        ``encoder_outs``: optional precomputed, already beam-replicated
        (B*K ordered [s0 x K, ...]) encoder outputs — lets callers (e.g.
        the two-phase generator) encode once and share across phases.

        Returns, per sentence, a list of up to beam hypo dicts sorted by
        score descending: {tokens, score, positional_scores, alignment}.
        """
        if not isinstance(models, EnsembleModel):
            ensemble = EnsembleModel(models)
        else:
            ensemble = models
        net_input = sample["net_input"]
        batch = {
            "src_tokens": jnp.asarray(net_input["src_tokens"]),
            "src_lengths": jnp.asarray(net_input["src_lengths"]),
        }
        bsz = batch["src_tokens"].shape[0]
        src_len = int(batch["src_tokens"].shape[1])
        if self.match_source_len:
            max_len = int(np.max(np.asarray(net_input["src_lengths"])))
        else:
            max_len = min(
                int(self.max_len_a * src_len + self.max_len_b),
                ensemble.max_decoder_positions() - 1,
            )
        max_len = max(max_len, self.min_len)

        if prefix_tokens is not None:
            prefix_tokens = jnp.asarray(prefix_tokens)

        fin = self._run(
            ensemble, batch, max_len, prefix_tokens, bos_token,
            encoder_outs=encoder_outs,
        )
        return self._collect(fin, bsz, max_len)

    # ------------------------------------------------------------------
    # device loop
    # ------------------------------------------------------------------

    def _run(self, ensemble, batch, max_len: int, prefix_tokens,
             bos_token=None, encoder_outs=None, init_scores=None,
             beam_ctx=None):
        """Dispatch to a cached jitted beam loop.

        Every per-call tensor (batch, prefix, precomputed encoder outs,
        step-0 score offsets, per-beam context) rides in the traced
        operand dict, never in the closure — so one jit per
        (model, variables, max_len, bos) serves every batch, and jax's own
        per-treedef/shape caching handles the optional-operand combos."""
        ops = {"b": batch}
        if prefix_tokens is not None:
            ops["p"] = prefix_tokens
        if encoder_outs is not None:
            ops["enc"] = encoder_outs
        if init_scores is not None:
            ops["init"] = jnp.asarray(init_scores)
        if beam_ctx is not None:
            ops["ctx"] = beam_ctx
        key = (
            id(ensemble.models[0][0]),
            id(ensemble.models[0][1]),  # variables: new weights != old fn
            max_len,
            bos_token,
        )
        if key not in self._jit_cache:
            fn = jax.jit(
                lambda o: self._generate_impl(
                    ensemble,
                    o["b"],
                    max_len,
                    o.get("p"),
                    init_scores=o.get("init"),
                    beam_ctx=o.get("ctx"),
                    encoder_outs=o.get("enc"),
                    bos_token=bos_token,
                )
            )
            self._jit_cache[key] = fn
            # bounded cache: each entry retains XLA executables plus their
            # closed-over model variables; long multi-model runs would
            # otherwise grow without limit
            while len(self._jit_cache) > 16:
                self._jit_cache.pop(next(iter(self._jit_cache)))
        else:
            self._jit_cache[key] = self._jit_cache.pop(key)  # LRU touch
        return jax.device_get(self._jit_cache[key](ops))

    def _generate_impl(
        self,
        ensemble,
        batch,
        max_len: int,
        prefix_tokens,
        init_scores=None,
        beam_ctx=None,
        encoder_outs=None,
        caches=None,
        bos_token=None,
    ):
        """Core fixed-shape beam loop.

        Extensions for hierarchical (two-phase) decoding:
          * init_scores (B, K): per-beam step-0 cumulative score offsets
            (the transcript scores of HierarchicalBeamSearch,
            twophase_sequence_generator.py:22-50) — beams are NOT collapsed
            to beam 0 at step 0 when given;
          * beam_ctx: dict of (B*K, ...) per-beam tensors (e.g. the aux
            padding mask) threaded through the loop and reordered with the
            beams; passed to decode_step as keyword args;
          * caches/encoder_outs may be precomputed by the caller.
        The finalized output carries ``fin_origin``: the initial-beam index
        each hypothesis descends from (which transcript produced it).
        """
        bsz = batch["src_tokens"].shape[0]
        K = self.beam_size
        T = max_len + 2
        V = self.vocab_size

        # length-constrained search reads per-sentence source lengths;
        # assigning INSIDE the traced function makes them a per-call traced
        # input (never a constant baked from the first batch)
        if hasattr(self.search, "src_lengths") and "src_lengths" in batch:
            self.search.src_lengths = batch["src_lengths"]

        if encoder_outs is None:
            encoder_outs = ensemble.forward_encoder(batch)
            # replicate each sentence K times: order [s0 x K, s1 x K, ...]
            new_order = jnp.repeat(jnp.arange(bsz), K)
            encoder_outs = [reorder_encoder_out(e, new_order) for e in encoder_outs]
        dtype = encoder_outs[0].encoder_out.dtype
        if caches is None:
            caches = ensemble.init_caches(encoder_outs, bsz * K, T, dtype)

        tokens = jnp.full((bsz, K, T), self.pad, jnp.int32)
        tokens = tokens.at[:, :, 0].set(
            self.eos if bos_token is None else bos_token
        )
        scores = jnp.zeros((bsz, K, T), jnp.float32)
        blacklist = jnp.zeros((bsz, K), bool)
        fin_tokens = jnp.full((bsz, K, T), self.pad, jnp.int32)
        fin_cum = jnp.zeros((bsz, K, T), jnp.float32)
        fin_score = jnp.full((bsz, K), -jnp.inf, jnp.float32)
        fin_len = jnp.zeros((bsz, K), jnp.int32)
        fin_origin = jnp.zeros((bsz, K), jnp.int32)
        fin_count = jnp.zeros((bsz,), jnp.int32)
        finished = jnp.zeros((bsz,), bool)
        origin = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :], (bsz, 1))

        rng0 = jax.random.PRNGKey(self.seed)

        def cond(state):
            return (~jnp.all(state["finished"])) & (state["step"] <= max_len)

        def body(state):
            step = state["step"]
            flat_tokens = state["tokens"].reshape(bsz * K, T)
            cur = jax.lax.dynamic_slice_in_dim(flat_tokens, step, 1, axis=1)
            decode_kwargs = dict(state["beam_ctx"]) if beam_ctx is not None else {}
            lprobs, new_caches = ensemble.forward_decoder(
                cur, encoder_outs, state["caches"], step, self.temperature,
                **decode_kwargs,
            )
            lprobs = lprobs.reshape(bsz, K, V)

            vocab = jnp.arange(V)
            is_eos_tok = (vocab == self.eos)[None, None, :]
            # pad never generated; unk penalized (:263-266)
            lprobs = jnp.where((vocab == self.pad)[None, None, :], NEG_INF, lprobs)
            if self.unk_penalty != 0:
                lprobs = jnp.where(
                    (vocab == self.unk)[None, None, :],
                    lprobs - self.unk_penalty,
                    lprobs,
                )
            # min/max length (:268-284)
            lprobs = jnp.where(
                (step < self.min_len) & is_eos_tok, NEG_INF, lprobs
            )
            at_max = step >= max_len
            lprobs = jnp.where(at_max & ~is_eos_tok, NEG_INF, lprobs)

            # prefix constraint
            if prefix_tokens is not None:
                plen = prefix_tokens.shape[1]
                in_prefix = step < plen
                ptok = jnp.take_along_axis(
                    prefix_tokens,
                    jnp.minimum(step, plen - 1)[None]
                    .astype(jnp.int32)
                    .reshape(1, 1)
                    .repeat(bsz, 0),
                    axis=1,
                )[:, 0]
                valid_prefix = (ptok != self.pad) & in_prefix
                keep = vocab[None, None, :] == ptok[:, None, None]
                plp = jnp.take_along_axis(
                    lprobs,
                    ptok[:, None, None].repeat(K, 1),
                    axis=2,
                )
                constrained = jnp.where(keep, plp, NEG_INF)
                lprobs = jnp.where(
                    valid_prefix[:, None, None], constrained, lprobs
                )

            if self.no_repeat_ngram_size > 0:
                lprobs = _ban_repeated_ngrams(
                    state["tokens"], lprobs, step, self.no_repeat_ngram_size
                )

            # blacklisted beams must not produce candidates
            lprobs = jnp.where(
                state["blacklist"][:, :, None], NEG_INF, lprobs
            )
            # finished sentences: freeze (their candidates are ignored anyway)
            prev_cum = jax.lax.dynamic_slice_in_dim(
                state["scores"], jnp.maximum(step - 1, 0), 1, axis=2
            )[:, :, 0]
            if init_scores is not None:
                # hierarchical step 0: every beam active, seeded with its
                # transcript score (HierarchicalBeamSearch.step)
                prev_cum = jnp.where(step == 0, init_scores, prev_cum)
                search_step = jnp.maximum(step, 1)
            else:
                prev_cum = jnp.where(step == 0, jnp.zeros_like(prev_cum), prev_cum)
                search_step = step

            rng = jax.random.fold_in(rng0, step)
            out: SearchOutput = self.search.step(search_step, lprobs, prev_cum, rng)
            cand_scores, cand_tokens, cand_beams = out

            # ---- finalization (reference :316-350, :483-545) ----
            eos_mask = (cand_tokens == self.eos) & (cand_scores > NEG_INF / 2)
            eos_topk = eos_mask.at[:, K:].set(False)  # only top-K finalize

            norm = (step.astype(jnp.float32) + 1.0) ** self.len_penalty
            cand_norm = cand_scores / (norm if self.normalize_scores else 1.0)

            can_fin = eos_topk & (~state["finished"])[:, None]
            rank = jnp.cumsum(can_fin.astype(jnp.int32), axis=1) - 1
            slot = state["fin_count"][:, None] + rank
            valid_fin = can_fin & (slot < K)
            slot_safe = jnp.where(valid_fin, slot, K)  # OOB -> dropped

            # gather finalized rows: tokens of source beam + eos at step+1
            src_rows = jnp.take_along_axis(
                state["tokens"], cand_beams[:, :, None], axis=1
            )  # (B, 2K, T)
            step_pos = jnp.arange(T)[None, None, :]
            fin_rows = jnp.where(step_pos == step + 1, self.eos, src_rows)
            fin_rows = jnp.where(step_pos > step + 1, self.pad, fin_rows)
            cum_rows = jnp.take_along_axis(
                state["scores"], cand_beams[:, :, None], axis=1
            )
            cum_rows = jnp.where(
                step_pos == step, cand_scores[:, :, None], cum_rows
            )
            cum_rows = jnp.where(step_pos > step, 0.0, cum_rows)

            def scatter_rows(buf, rows):
                return jax.vmap(
                    lambda b, r, s: b.at[s].set(r, mode="drop")
                )(buf, rows, slot_safe)

            fin_tokens = scatter_rows(state["fin_tokens"], fin_rows)
            fin_cum = scatter_rows(state["fin_cum"], cum_rows)
            fin_score = jax.vmap(lambda b, r, s: b.at[s].set(r, mode="drop"))(
                state["fin_score"], jnp.where(valid_fin, cand_norm, -jnp.inf), slot_safe
            )
            fin_len = jax.vmap(lambda b, r, s: b.at[s].set(r, mode="drop"))(
                state["fin_len"],
                jnp.full_like(slot_safe, step + 2),
                slot_safe,
            )
            cand_origin = jnp.take_along_axis(state["origin"], cand_beams, axis=1)
            fin_origin = jax.vmap(lambda b, r, s: b.at[s].set(r, mode="drop"))(
                state["fin_origin"], cand_origin, slot_safe
            )
            fin_count = state["fin_count"] + jnp.sum(
                valid_fin.astype(jnp.int32), axis=1
            )
            finished = state["finished"] | (fin_count >= K) | (step >= max_len)

            # ---- active selection (reference active_mask mechanics
            # :386-401): eos candidates are pushed behind all non-eos ones,
            # then the K smallest ranks continue; a selected eos/dead
            # candidate means < K live continuations -> that beam is
            # blacklisted (its lprobs are NEG_INF'd next step, the
            # fixed-shape equivalent of the reference's column blacklist) ----
            CAND = 2 * K
            active_mask = jnp.arange(CAND)[None, :] + eos_mask * CAND
            _, active_hypos = jax.lax.top_k(-active_mask, K)
            active_hypos = jnp.sort(active_hypos, axis=1)
            new_blacklist = (
                jnp.take_along_axis(active_mask, active_hypos, axis=1) >= CAND
            )

            sel_beams = jnp.take_along_axis(cand_beams, active_hypos, axis=1)
            sel_tokens = jnp.take_along_axis(cand_tokens, active_hypos, axis=1)
            sel_scores = jnp.take_along_axis(cand_scores, active_hypos, axis=1)
            new_blacklist = new_blacklist | (sel_scores < NEG_INF / 2)

            # reorder beam state
            new_tokens = jnp.take_along_axis(
                state["tokens"], sel_beams[:, :, None], axis=1
            )
            new_tokens = jnp.where(
                step_pos == step + 1, sel_tokens[:, :, None], new_tokens
            )
            new_scores = jnp.take_along_axis(
                state["scores"], sel_beams[:, :, None], axis=1
            )
            new_scores = jnp.where(
                step_pos == step, sel_scores[:, :, None], new_scores
            )

            new_origin = jnp.take_along_axis(state["origin"], sel_beams, axis=1)

            # frozen rows for finished sentences
            fmask = state["finished"][:, None, None]
            new_tokens = jnp.where(fmask, state["tokens"], new_tokens)
            new_scores = jnp.where(fmask, state["scores"], new_scores)
            new_blacklist = jnp.where(
                state["finished"][:, None], state["blacklist"], new_blacklist
            )
            new_origin = jnp.where(
                state["finished"][:, None], state["origin"], new_origin
            )

            # reorder incremental caches: flat (B*K) gather
            flat_order = (
                jnp.arange(bsz)[:, None] * K + sel_beams
            ).reshape(-1)
            flat_order = jnp.where(
                jnp.repeat(state["finished"], K),
                jnp.arange(bsz * K),
                flat_order,
            )
            new_caches = jax.tree_util.tree_map(
                lambda x: jnp.take(x, flat_order, axis=0), new_caches
            )
            new_beam_ctx = state["beam_ctx"]
            if beam_ctx is not None:
                new_beam_ctx = jax.tree_util.tree_map(
                    lambda x: jnp.take(x, flat_order, axis=0), state["beam_ctx"]
                )

            return {
                "step": step + 1,
                "tokens": new_tokens,
                "scores": new_scores,
                "blacklist": new_blacklist,
                "origin": new_origin,
                "fin_tokens": fin_tokens,
                "fin_cum": fin_cum,
                "fin_score": fin_score,
                "fin_len": fin_len,
                "fin_origin": fin_origin,
                "fin_count": fin_count,
                "finished": finished,
                "caches": new_caches,
                "beam_ctx": new_beam_ctx,
            }

        state = {
            "step": jnp.int32(0),
            "tokens": tokens,
            "scores": scores,
            "blacklist": blacklist,
            "origin": origin,
            "fin_tokens": fin_tokens,
            "fin_cum": fin_cum,
            "fin_score": fin_score,
            "fin_len": fin_len,
            "fin_origin": fin_origin,
            "fin_count": fin_count,
            "finished": finished,
            "caches": caches,
            "beam_ctx": beam_ctx if beam_ctx is not None else {},
        }
        state = jax.lax.while_loop(cond, body, state)
        return {
            k: state[k]
            for k in (
                "fin_tokens", "fin_cum", "fin_score", "fin_len",
                "fin_origin", "fin_count",
            )
        }

    # ------------------------------------------------------------------
    # host-side collection
    # ------------------------------------------------------------------

    def _collect(self, fin, bsz: int, max_len: int) -> List[List[dict]]:
        return collect_hypotheses(fin, bsz, self.beam_size)


def _ban_repeated_ngrams(tokens, lprobs, step, n: int):
    """no-repeat-ngram (reference sequence_generator.py:617-651): ban token v
    if the (n-1)-gram ending at the current position followed by v occurred
    before. tokens: (B, K, T) incl. leading eos; bans apply from step n-1."""
    b, k, t = tokens.shape
    v = lprobs.shape[-1]
    if n <= 1:
        # ban any previously generated token
        pos = jnp.arange(t)[None, None, :]
        prev_mask = (pos >= 1) & (pos <= step)
        onehot = jax.nn.one_hot(tokens, v, dtype=bool) & prev_mask[..., None]
        banned = jnp.any(onehot, axis=2)
        return jnp.where(banned, NEG_INF, lprobs)

    # context: last n-1 generated tokens (positions step-n+2 .. step)
    idx = jnp.arange(n - 1)[None, None, :] + (step - (n - 2))
    idx_safe = jnp.clip(idx, 0, t - 1)
    context = jnp.take_along_axis(tokens, idx_safe.repeat(k, 1).repeat(b, 0), axis=2)

    # all prior (n-1)-grams starting at p in [1, step-n+2], next token at p+n-1
    starts = jnp.arange(t)
    gram_idx = starts[:, None] + jnp.arange(n - 1)[None, :]  # (T, n-1)
    gram_idx_safe = jnp.clip(gram_idx, 0, t - 1)
    grams = tokens[:, :, gram_idx_safe]  # (B, K, T, n-1)
    next_idx = jnp.clip(starts + (n - 1), 0, t - 1)
    next_tok = jnp.take_along_axis(
        tokens, next_idx[None, None, :].repeat(k, 1).repeat(b, 0), axis=2
    )  # (B, K, T)

    # valid gram windows: start >= 1 (skip bos), start + n - 1 <= step
    valid = (starts >= 1) & (starts + (n - 1) <= step)
    match = jnp.all(grams == context[:, :, None, :], axis=-1) & valid[None, None, :]
    banned = jax.vmap(
        jax.vmap(
            lambda m, nt: jnp.zeros((v,), bool).at[jnp.where(m, nt, v)].set(
                True, mode="drop"
            )
        )
    )(match, next_tok)
    active = step >= n - 1
    return jnp.where(active & banned, NEG_INF, lprobs)
