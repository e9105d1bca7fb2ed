"""Stateful context-chained generation (INTERSPEECH 2020).

Counterpart of examples/speech_recognition/sequence_generator_with_context.py:
the generator keeps a buffer across consecutive ``generate`` calls — the
previous utterance's generated target (Target variant) or previous audio
(Audio variant) becomes the next utterance's context. Requires the
order-preserving batch iterator of speech_recognition_context.

The cross-batch chaining is inherently sequential and stays host-driven
(SURVEY §7 hard part #4); each call still runs the fixed-shape jitted beam
loop on device — context enters through the EncoderOut context fields.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .sequence_generator import SequenceGenerator


class _CtxEnsemble:
    """Single-model ensemble whose encoder receives context tokens."""

    def __init__(self, model, variables, context_tokens, context_lengths):
        self.models = [(model, variables)]
        self._ctx = (context_tokens, context_lengths)

    def max_decoder_positions(self):
        return self.models[0][0].max_target_positions

    def forward_encoder(self, batch):
        model, variables = self.models[0]
        ctx_tokens, ctx_lengths = self._ctx
        enc, _ = model.encode(
            variables,
            batch["src_tokens"],
            batch["src_lengths"],
            context_tokens=ctx_tokens,
            context_lengths=ctx_lengths,
        )
        return [enc]

    def init_caches(self, encoder_outs, batch, max_len, dtype):
        model, variables = self.models[0]
        return [model.init_cache(variables, batch, max_len, encoder_outs[0], dtype)]

    def forward_decoder(self, tokens, encoder_outs, caches, step, temperature=1.0,
                        **kw):
        import jax

        model, variables = self.models[0]
        logits, new_cache, _ = model.decode_step(
            variables, tokens, caches[0], step, encoder_outs[0]
        )
        logits = logits.astype(jnp.float32)
        if temperature != 1.0:
            logits = logits / temperature
        return jax.nn.log_softmax(logits, axis=-1), [new_cache]


class ContextAwareSequenceGenerator(SequenceGenerator):
    def __init__(self, tgt_dict, **kwargs):
        kwargs.pop("match_source_len", None)
        super().__init__(tgt_dict, **kwargs)
        self.buffer = self.default_buffer
        self.context = None

    @property
    def default_buffer(self):
        raise NotImplementedError

    def next_batch_context(self, src_tokens, buffer):
        raise NotImplementedError

    def new_prev_buffer(self, src_tokens, hypos):
        raise NotImplementedError

    def generate(self, models, sample, prefix_tokens=None, **kwargs):
        model, variables = models[0]
        net_input = sample["net_input"]
        src_tokens = np.asarray(net_input["src_tokens"])
        context_tokens, context_lengths = self.next_batch_context(
            src_tokens, self.buffer
        )
        assert context_tokens.shape[0] == src_tokens.shape[0], (
            "Batch size ({}) is different from context batch size ({})".format(
                src_tokens.shape[0], context_tokens.shape[0]
            )
        )
        ensemble = _CtxEnsemble(
            model, variables,
            jnp.asarray(context_tokens), jnp.asarray(context_lengths),
        )
        batch = {
            "src_tokens": jnp.asarray(net_input["src_tokens"]),
            "src_lengths": jnp.asarray(net_input["src_lengths"]),
        }
        src_len = int(batch["src_tokens"].shape[1])
        max_len = min(
            int(self.max_len_a * src_len + self.max_len_b),
            ensemble.max_decoder_positions() - 1,
        )
        max_len = max(max_len, self.min_len)
        import jax

        fin = jax.device_get(
            jax.jit(lambda b: self._generate_impl(ensemble, b, max_len, None))(batch)
        )
        hypos = self._collect(fin, src_tokens.shape[0], max_len)
        self.buffer = self.new_prev_buffer(src_tokens, hypos)
        return hypos


class TargetContextAwareSequenceGenerator(ContextAwareSequenceGenerator):
    """Previous generated target text is the next context
    (reference :104-121)."""

    @property
    def default_buffer(self):
        return np.array([[self.eos]], dtype=np.int64)

    def next_batch_context(self, src_tokens, buffer):
        bsz = src_tokens.shape[0]
        # batches are order-preserving; with bsz>1 only the first row can use
        # the cross-batch buffer, subsequent rows use the previous row's
        # REFERENCE-order context — the reference asserts matching batch
        # size, which in practice means bsz==1 decoding; replicate that.
        ctx = np.tile(buffer, (bsz, 1))
        lengths = np.full((bsz,), ctx.shape[1], dtype=np.int64)
        return ctx, lengths

    def new_prev_buffer(self, src_tokens, hypos):
        # most likely hypo of the last sentence becomes the next context
        toks = np.asarray(hypos[-1][0]["tokens"], dtype=np.int64)
        if toks.ndim == 1:
            toks = toks[None, :]
        return toks


class AudioContextAwareSequenceGenerator(ContextAwareSequenceGenerator):
    """Previous utterance's audio is the next context (reference :124-157)."""

    @property
    def default_buffer(self):
        return None

    def next_batch_context(self, src_tokens, buffer):
        bsz, t, f = src_tokens.shape
        if buffer is not None:
            prev = buffer
        else:
            prev = np.zeros((t, f), dtype=src_tokens.dtype)
        if bsz == 1:
            ctx = prev[None, :, :]
            lengths = np.full((1,), ctx.shape[1], dtype=np.int64)
            return ctx, lengths
        # within the batch, row i's context is row i-1's audio
        context = src_tokens[:-1]
        if context.shape[1] > prev.shape[0]:
            prev = np.pad(prev, ((0, context.shape[1] - prev.shape[0]), (0, 0)))
        elif context.shape[1] < prev.shape[0]:
            context = np.pad(
                context, ((0, 0), (0, prev.shape[0] - context.shape[1]), (0, 0))
            )
        ctx = np.concatenate([prev[None], context], axis=0)
        lengths = np.full((bsz,), ctx.shape[1], dtype=np.int64)
        return ctx, lengths

    def new_prev_buffer(self, src_tokens, hypos):
        return src_tokens[-1]
