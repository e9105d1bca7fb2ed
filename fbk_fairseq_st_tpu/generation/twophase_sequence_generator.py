"""Two-phase (hierarchical) beam decoding for dual-decoder ST models.

Counterpart of examples/speech_recognition/twophase_sequence_generator.py:
  * phase 1 (:477+): full beam search with the auxiliary (transcript)
    decoder -> K transcript hypotheses per sentence;
  * phase 2 (:171+): ONE beam search over the target decoder whose K initial
    beams each carry a different transcript — its teacher-forced aux-decoder
    features as per-beam cross-attention context — seeded at step 0 with the
    transcript scores (HierarchicalBeamSearch :22-50), so final scores are
    joint transcript+translation;
  * model hooks: dualdecoder ignores the aux context in phase 2, triangle
    double-cross-attends it, 2stage attends ONLY it (each model's
    forward_decoder hook in the reference).

TPU design: both phases are the same fixed-shape jitted while_loop as
SequenceGenerator; the per-beam aux context is threaded through the loop
state and reordered with the beams (beam_ctx), and the teacher-forced aux
feature computation is one batched full-sequence pass over all B*K chosen
transcripts.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import EncoderOut, reorder_encoder_out
from .sequence_generator import EnsembleModel, SequenceGenerator


class _AuxAdapter:
    """Expose the auxiliary decoder as a standalone model to the phase-1
    beam search."""

    def __init__(self, model):
        self.model = model
        self.max_target_positions = model.aux_decoder_cfg.max_positions

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        return self.model.encode(variables, src_tokens, src_lengths, rng, training)

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        return self.model.init_aux_cache(variables, batch, max_len, encoder_out, dtype)

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        return self.model.decode_aux_step(variables, tokens, cache, step, encoder_out)


class _PackedEncOut(NamedTuple):
    """Encoder output + teacher-forced aux-decoder features, packed so both
    ride the standard (traced) encoder_outs path instead of being baked
    into a closure — one compiled phase-2 executable then serves every
    batch."""

    enc: Any
    aux: Any

    @property
    def encoder_out(self):  # dtype probe in the beam loop
        return self.enc.encoder_out


class _TgtAdapter:
    """Target decoder with per-beam aux context for phase 2. Stateless:
    the packed (encoder_out, aux_features) arrives per call through the
    encoder_outs operand."""

    def __init__(self, model):
        self.model = model
        self.max_target_positions = model.decoder_cfg.max_positions

    def init_cache(self, variables, batch, max_len, enc_pack, dtype=jnp.float32):
        return self.model.init_cache(
            variables, batch, max_len, enc_pack.enc, dtype,
            aux_out=enc_pack.aux,
        )

    def decode_step(self, variables, tokens, cache, step, enc_pack,
                    aux_padding_mask=None):
        return self.model.decode_step(
            variables, tokens, cache, step, enc_pack.enc,
            aux_padding_mask=aux_padding_mask,
        )


class TwoPhaseSequenceGenerator(SequenceGenerator):
    def __init__(self, src_dict, tgt_dict, **kwargs):
        super().__init__(tgt_dict, **kwargs)
        self.src_dict = src_dict
        # phase-1 generator persists so its compiled-executable cache does;
        # per-model aux adapters are reused for the same reason (the jit
        # cache keys on the adapter object's identity)
        self.aux_gen = SequenceGenerator(
            self.src_dict,
            beam_size=self.beam_size,
            max_len_a=self.max_len_a,
            max_len_b=self.max_len_b,
            min_len=self.min_len,
            normalize_scores=self.normalize_scores,
            len_penalty=self.len_penalty,
            unk_penalty=self.unk_penalty,
            temperature=self.temperature,
            no_repeat_ngram_size=self.no_repeat_ngram_size,
            match_source_len=self.match_source_len,
            seed=self.seed,
        )
        self._adapters: dict = {}

    def _adapters_for(self, model):
        key = id(model)
        if key not in self._adapters:
            self._adapters[key] = (_AuxAdapter(model), _TgtAdapter(model))
        return self._adapters[key]

    def generate(self, models, sample, prefix_tokens=None, **kwargs):
        model, variables = models[0]
        aux_adapter, tgt_adapter = self._adapters_for(model)
        net_input = sample["net_input"]
        batch = {
            "src_tokens": jnp.asarray(net_input["src_tokens"]),
            "src_lengths": jnp.asarray(net_input["src_lengths"]),
        }
        bsz = batch["src_tokens"].shape[0]
        K = self.beam_size
        src_len = int(batch["src_tokens"].shape[1])
        if self.match_source_len:
            max_len = int(np.max(np.asarray(net_input["src_lengths"])))
        else:
            max_len = min(
                int(self.max_len_a * src_len + self.max_len_b),
                model.max_target_positions - 1,
            )
        max_len = max(max_len, self.min_len)
        if prefix_tokens is not None:
            prefix_tokens = jnp.asarray(prefix_tokens)

        # ---- encode ONCE, beam-replicate, share across both phases ----
        enc_single = model.encode(
            variables, batch["src_tokens"], batch["src_lengths"]
        )[0]
        enc_rep = reorder_encoder_out(
            enc_single, jnp.repeat(jnp.arange(bsz), K)
        )

        # ---- phase 1: transcripts with the auxiliary decoder ----
        aux_hypos = self.aux_gen.generate(
            [(aux_adapter, variables)], sample,
            prefix_tokens=prefix_tokens,
            encoder_outs=[enc_rep],
        )

        # assemble padded transcripts + scores (B, K)
        aux_len = max(
            max((len(h["tokens"]) for h in sent), default=1) for sent in aux_hypos
        )
        aux_len = max(aux_len, 2)
        transcripts = np.full((bsz, K, aux_len), self.src_dict.pad(), np.int32)
        aux_scores = np.full((bsz, K), -1e9, np.float32)
        host_transcripts: List[List[np.ndarray]] = []
        for b, sent in enumerate(aux_hypos):
            row = []
            for k in range(K):
                h = sent[min(k, len(sent) - 1)] if sent else None
                if h is None:
                    row.append(np.array([self.src_dict.eos()], np.int64))
                    continue
                toks = np.asarray(h["tokens"])
                transcripts[b, k, : len(toks)] = toks
                aux_scores[b, k] = h["score"]
                row.append(toks)
            host_transcripts.append(row)

        # ---- phase 2 prep: teacher-forced aux features per transcript ----
        flat_transcripts = jnp.asarray(transcripts.reshape(bsz * K, aux_len))
        src_pad = self.src_dict.pad()
        src_eos = self.src_dict.eos()
        prev_aux = jnp.concatenate(
            [
                jnp.full((bsz * K, 1), src_eos, jnp.int32),
                flat_transcripts[:, :-1],
            ],
            axis=1,
        )
        # positions beyond the hypothesis stay pad
        prev_aux = jnp.where(flat_transcripts == src_pad, src_pad, prev_aux)

        aux_feats = model.aux_features(variables, prev_aux, enc_rep)
        aux_padding_mask = flat_transcripts == src_pad

        ensemble = EnsembleModel([(tgt_adapter, variables)])
        fin = self._run(
            ensemble,
            batch,
            max_len,
            prefix_tokens,
            encoder_outs=[_PackedEncOut(enc_rep, aux_feats)],
            init_scores=aux_scores,
            beam_ctx={"aux_padding_mask": aux_padding_mask},
        )
        results = self._collect(fin, bsz, max_len)
        # attach the originating transcript to each hypothesis
        for b, sent in enumerate(results):
            for h in sent:
                origin = int(h.get("origin", 0))
                h["transcript_tokens"] = host_transcripts[b][
                    min(origin, len(host_transcripts[b]) - 1)
                ]
                h["transcript_score"] = float(aux_scores[b, min(origin, K - 1)])
        return results
