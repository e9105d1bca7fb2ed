"""Non-autoregressive translation: CMLM (mask-predict) transformer.

Counterpart of the reference NAT family's flagship member
(fairseq/models/nat/cmlm_transformer.py, Ghazvininejad et al. 2019): a
full-context (non-causal) transformer decoder predicts all masked target
positions at once, plus a length-prediction head over mean-pooled encoder
states; decoding is iterative mask-predict with skeptical unmasking
(generation/iterative_refinement_generator.py) — and the Levenshtein
transformer (fairseq/models/nat/levenshtein_transformer.py +
levenshtein_utils.py), whose libnat edit-alignment labels are computed on
device (ops/edit_distance.lcs_matched_masks) and whose insert/delete edit
ops run at a fixed width so the refinement loop compiles to one program.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.core import NEG_INF, RngStream, normal_init
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .transformer import (
    TransformerEncoder,
    TransformerEncoderConfig,
    TransformerModel,
    base_architecture as transformer_base,
)
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig

MAX_LENGTH = 256  # length-prediction head range (reference defaults to 256)


@register_model("cmlm_transformer")
class CMLMTransformerModel(TransformerModel):
    """Conditional masked LM NAT model."""

    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False,
                 unk=3, bos=0, eos=2, pad=1,
                 pred_length_offset: bool = False,
                 sg_length_pred: bool = False):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.unk = unk
        self.bos = bos
        self.eos = eos
        self.pad = pad
        # reference nonautoregressive_transformer.py:202-203: predict the
        # length DELTA vs the source (offset by 128) / stop-gradient the
        # pooled features entering the length head
        self.pred_length_offset = pred_length_offset
        self.sg_length_pred = sg_length_pred

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        parser.add_argument("--src-embedding-copy", action="store_true",
                            help="copy encoder word embeddings as the "
                                 "initial decoder input")
        # reference nonautoregressive_transformer.py:58-75
        # (--length-loss-factor lives on the nat_loss criterion here — same
        # dest, avoids a duplicate-option parser conflict; --apply-bert-init
        # is accepted for command-line parity, but initialization scheme is
        # not part of the parity surface — checkpoint converters map weights)
        parser.add_argument("--apply-bert-init", action="store_true",
                            help="use custom param initialization for BERT")
        parser.add_argument("--sg-length-pred", action="store_true",
                            help="stop the gradients back-propagated from "
                                 "the length predictor")
        parser.add_argument("--pred-length-offset", action="store_true",
                            help="predicting the length difference between "
                                 "the target and source sentences")

    @staticmethod
    def _length_pred_kwargs(args) -> dict:
        return {
            "pred_length_offset": getattr(args, "pred_length_offset", False),
            "sg_length_pred": getattr(args, "sg_length_pred", False),
        }

    @classmethod
    def build_model(cls, args, task):
        cmlm_base_architecture(args)
        model = super().build_model(args, task)
        d = task.target_dictionary
        nat = cls(
            model.encoder_cfg, model.decoder_cfg, model.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
            **cls._length_pred_kwargs(args),
        )
        return nat

    def init(self, key):
        variables = super().init(key)
        variables["params"]["embed_length"] = normal_init(
            jax.random.fold_in(key, 777),
            (MAX_LENGTH, self.encoder_cfg.embed_dim),
            std=self.encoder_cfg.embed_dim ** -0.5,
        )
        return variables

    # -- length prediction -----------------------------------------------------

    def forward_length(self, variables, encoder_out: EncoderOut):
        """Length logits from mean-pooled (non-pad) encoder states
        (reference nonautoregressive_transformer.py:218-226; --sg-length-pred
        detaches the pooled features so the length loss does not train the
        encoder)."""
        x = encoder_out.encoder_out.astype(jnp.float32)
        mask = encoder_out.encoder_padding_mask
        keep = (~mask).astype(jnp.float32)[:, :, None]
        pooled = (x * keep).sum(axis=1) / jnp.maximum(keep.sum(axis=1), 1.0)
        if self.sg_length_pred:
            pooled = jax.lax.stop_gradient(pooled)
        w = variables["params"]["embed_length"].astype(jnp.float32)
        return pooled @ w.T  # (B, MAX_LENGTH)

    def _src_lengths(self, encoder_out: EncoderOut):
        return jnp.sum(
            ~encoder_out.encoder_padding_mask, axis=1
        ).astype(jnp.int32)

    def length_targets(self, tgt_tokens, encoder_out: EncoderOut = None):
        """Length-head class target (reference
        nonautoregressive_transformer.py:351-359): the target length, or
        with --pred-length-offset the delta vs the source length + 128."""
        tgt_lengs = jnp.sum(tgt_tokens != self.pad, axis=1)
        if self.pred_length_offset and encoder_out is not None:
            tgt_lengs = tgt_lengs - self._src_lengths(encoder_out) + 128
        return jnp.clip(tgt_lengs, 0, MAX_LENGTH - 1)

    def decode_lengths(self, length_pred, encoder_out: EncoderOut):
        """Map argmax/top-k length-head classes to actual lengths
        (reference :361-368)."""
        if self.pred_length_offset:
            src = self._src_lengths(encoder_out)
            while src.ndim < length_pred.ndim:
                src = src[:, None]
            return length_pred - 128 + src
        return length_pred

    # -- training forward --------------------------------------------------------

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        enc_params, dec_params = self._split_params(variables["params"])
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        length_out = self.forward_length(variables, enc)
        word_ins_out, extra = self.decoder(
            dec_params,
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
            causal=False,
        )
        extra["encoder_out"] = enc
        extra["length_out"] = length_out
        extra["length_tgt"] = self.length_targets(batch["target"], enc)
        extra["word_ins_mask"] = batch["prev_output_tokens"] == self.unk
        return (word_ins_out, extra), {}

    # -- mask-predict decoding -----------------------------------------------------

    def initialize_output_tokens(self, variables, encoder_out: EncoderOut,
                                 max_len: int):
        """Predict lengths and build initial [bos, unk*L, eos] rows."""
        length_logits = self.forward_length(variables, encoder_out)
        length_tgt = self.decode_lengths(
            jnp.argmax(length_logits, axis=-1), encoder_out
        )
        length_tgt = jnp.clip(length_tgt, 2, max_len - 1)
        b = length_logits.shape[0]
        pos = jnp.arange(max_len)[None, :]
        tokens = jnp.where(pos < length_tgt[:, None], self.unk, self.pad)
        tokens = tokens.at[:, 0].set(self.bos)
        tokens = jnp.where(pos == (length_tgt - 1)[:, None], self.eos, tokens)
        scores = jnp.zeros((b, max_len), jnp.float32)
        return tokens.astype(jnp.int32), scores

    def forward_decoder_step(self, variables, output_tokens, output_scores,
                             encoder_out: EncoderOut):
        """One mask-predict pass: fill unk positions with argmax predictions."""
        _, dec_params = self._split_params(variables["params"])
        logits, _ = self.decoder(
            dec_params,
            output_tokens,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            causal=False,
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        scores = jnp.max(lprobs, axis=-1)
        tokens = jnp.argmax(lprobs, axis=-1).astype(jnp.int32)
        masks = output_tokens == self.unk
        new_tokens = jnp.where(masks, tokens, output_tokens)
        new_scores = jnp.where(masks, scores, output_scores)
        return new_tokens, new_scores


# ---------------------------------------------------------------------------
# vanilla / iterative NAT
# ---------------------------------------------------------------------------

def uniform_copy_embeddings(src_embed, src_mask, tgt_mask):
    """Map source embeddings onto target positions proportionally
    (reference nonautoregressive_transformer.py forward_embedding's
    uniform copy): tgt position t reads src position
    floor(t * src_len / tgt_len)."""
    B, Ts, D = src_embed.shape
    Tt = tgt_mask.shape[1]
    src_len = jnp.maximum(jnp.sum(src_mask, axis=1), 1)  # (B,)
    tgt_len = jnp.maximum(jnp.sum(tgt_mask, axis=1), 1)
    t = jnp.arange(Tt)[None, :]
    idx = jnp.clip(
        (t * src_len[:, None]) // tgt_len[:, None], 0, Ts - 1
    ).astype(jnp.int32)
    copied = jnp.take_along_axis(src_embed, idx[:, :, None], axis=1)
    return copied * tgt_mask[:, :, None].astype(copied.dtype)


@register_model("nonautoregressive_transformer")
class NATransformerModel(CMLMTransformerModel):
    """Vanilla NAT (Gu et al. 2018): predict every target position in one
    shot from a fully-masked decoder input, with length prediction.

    Counterpart of fairseq/models/nat/nonautoregressive_transformer.py:
    50-190; use --noise full_mask with the translation_lev task. Optional
    --src-embedding-copy replaces the unk input embeddings with
    uniformly-copied source embeddings (:209-217)."""

    def __init__(self, *args, src_embedding_copy: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.src_embedding_copy = src_embedding_copy

    @staticmethod
    def add_args(parser):
        # inherited from CMLMTransformerModel (in the reference the
        # hierarchy is inverted — cmlm extends NAT — so both accept the
        # NAT length-prediction flags either way)
        CMLMTransformerModel.add_args(parser)

    @classmethod
    def build_model(cls, args, task):
        nat_base_architecture(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        d = task.target_dictionary
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
            src_embedding_copy=getattr(args, "src_embedding_copy", False),
            **cls._length_pred_kwargs(args),
        )

    def _decoder_inputs(self, variables, batch, enc):
        if not self.src_embedding_copy:
            return None
        from ..ops.core import embedding

        enc_params, _ = self._split_params(variables["params"])
        src_embed = embedding(
            enc_params["embed_tokens"], batch["src_tokens"]
        )
        src_mask = batch["src_tokens"] != self.pad
        tgt_mask = batch["prev_output_tokens"] != self.pad
        return uniform_copy_embeddings(src_embed, src_mask, tgt_mask)

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        enc_params, dec_params = self._split_params(variables["params"])
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        length_out = self.forward_length(variables, enc)
        word_ins_out, extra = self.decoder(
            dec_params,
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng, deterministic=not training, causal=False,
            token_embeddings=self._decoder_inputs(variables, batch, enc),
        )
        extra["encoder_out"] = enc
        extra["length_out"] = length_out
        extra["length_tgt"] = self.length_targets(batch["target"], enc)
        extra["word_ins_mask"] = batch["prev_output_tokens"] == self.unk
        return (word_ins_out, extra), {}


@register_model_architecture(
    "nonautoregressive_transformer", "nonautoregressive_transformer"
)
def nat_base_architecture(args):
    args.src_embedding_copy = getattr(args, "src_embedding_copy", False)
    args.encoder_normalize_before = getattr(
        args, "encoder_normalize_before", False
    )
    args.decoder_normalize_before = getattr(
        args, "decoder_normalize_before", False
    )
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", True
    )
    transformer_base(args)


@register_model_architecture(
    "nonautoregressive_transformer", "nonautoregressive_transformer_wmt_en_de"
)
def nat_wmt_en_de(args):
    nat_base_architecture(args)


def sequential_poisoning(key, s, vocab_size, bos, eos, pad, beta=0.33):
    """DAE corruption for iterative NAT training (reference
    iterative_nonautoregressive_transformer.py:12-43): sweeping left to
    right, each position independently (p = beta/3 each) is replaced by a
    random word, repeated into the next slot, or swapped with the next
    token; bos/eos/pad are safe. One lax.scan over positions — the carried
    (B, T) array is updated with two dynamic column writes per step.

    (The reference body compares next_word against the literal 3 — the eos
    of its own *default* arguments — instead of the eos actually passed;
    this build uses the real eos index.)
    """
    k1, k2 = jax.random.split(key)
    rand_words = jax.random.randint(k1, s.shape, 4, vocab_size, dtype=s.dtype)
    choices = jax.random.uniform(k2, s.shape)
    choices = jnp.where((s == pad) | (s == bos) | (s == eos), 1.0, choices)
    replace = choices < beta / 3
    repeat = (choices >= beta / 3) & (choices < 2 * beta / 3)
    swap = (choices >= 2 * beta / 3) & (choices < beta)
    safe = choices >= beta

    def col(a, j):
        return jax.lax.dynamic_slice_in_dim(a, j, 1, axis=1)[:, 0]

    def body(s, i):
        rand_word = col(rand_words, i)
        self_word = col(s, i)
        next_word = col(s, i + 1)
        replace_i = col(replace, i)
        swap_i = col(swap, i) & (next_word != eos)
        repeat_i = col(repeat, i) & (next_word != eos)
        safe_i = col(safe, i) | ((next_word == eos) & ~replace_i)
        new_i = (
            self_word * (safe_i | repeat_i)
            + next_word * swap_i
            + rand_word * replace_i
        )
        new_next = next_word * (safe_i | replace_i) + self_word * (
            swap_i | repeat_i
        )
        s = jax.lax.dynamic_update_slice_in_dim(
            s, new_i[:, None].astype(s.dtype), i, axis=1
        )
        s = jax.lax.dynamic_update_slice_in_dim(
            s, new_next[:, None].astype(s.dtype), i + 1, axis=1
        )
        return s, None

    if s.shape[1] < 2:
        return s
    s, _ = jax.lax.scan(body, s, jnp.arange(s.shape[1] - 1))
    return s


@register_model("iterative_nonautoregressive_transformer")
class IterNATransformerModel(NATransformerModel):
    """Iterative NAT (Lee et al. 2018): unroll --train-step refinement
    passes at training time, feeding each pass's (optionally
    stochastically sampled) predictions into the next.

    Counterpart of fairseq/models/nat/
    iterative_nonautoregressive_transformer.py:31-199."""

    def __init__(self, *args, train_step: int = 4, dae_ratio: float = 0.5,
                 stochastic_approx: bool = False, label_smoothing: float = 0.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.train_step = train_step
        self.dae_ratio = dae_ratio
        self.stochastic_approx = stochastic_approx
        self.label_smoothing = label_smoothing

    @staticmethod
    def add_args(parser):
        NATransformerModel.add_args(parser)
        parser.add_argument("--train-step", type=int, default=4,
                            help="number of refinement iterations during "
                                 "training")
        parser.add_argument("--stochastic-approx", action="store_true",
                            help="sample from the categorical (Gumbel) "
                                 "instead of argmax between iterations")
        parser.add_argument("--dae-ratio", type=float,
                            help="probability of switching a sentence to "
                                 "the denoising auto-encoder input "
                                 "(reference iterative_nat.py:58-60)")

    @classmethod
    def build_model(cls, args, task):
        iter_nat_base_architecture(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        d = task.target_dictionary
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
            src_embedding_copy=getattr(args, "src_embedding_copy", False),
            train_step=getattr(args, "train_step", 4),
            dae_ratio=getattr(args, "dae_ratio", 0.5),
            stochastic_approx=getattr(args, "stochastic_approx", False),
            label_smoothing=getattr(args, "label_smoothing", 0.0),
            **cls._length_pred_kwargs(args),
        )

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        enc_params, dec_params = self._split_params(variables["params"])
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        length_out = self.forward_length(variables, enc)
        prev = batch["prev_output_tokens"].astype(jnp.int32)
        tgt = batch["target"].astype(jnp.int32)
        # every non-pad target position is supervised at every step
        # (reference iterative_nat.py:94 word_ins_mask = tgt.ne(pad))
        word_ins_mask = tgt != self.pad

        losses = {}
        word_ins_out = None
        for t in range(self.train_step):
            word_ins_out, _ = self.decoder(
                dec_params, prev,
                encoder_out=enc.encoder_out,
                encoder_padding_mask=enc.encoder_padding_mask,
                rng=rng, deterministic=not training, causal=False,
            )
            losses[f"word_ins_{t}"] = {
                "out": word_ins_out,
                "tgt": tgt,
                "mask": word_ins_mask,
                "ls": self.label_smoothing,
                "nll_loss": t == 0,
            }
            if t < self.train_step - 1:
                # prediction for the next iteration
                # (reference iterative_nat.py:100-111)
                logits32 = word_ins_out.astype(jnp.float32)
                if self.stochastic_approx and rng is not None and training:
                    pred = jax.random.categorical(rng.next(), logits32)
                else:
                    pred = jnp.argmax(logits32, axis=-1)
                pred = jax.lax.stop_gradient(pred).astype(jnp.int32)
                prev = jnp.where(word_ins_mask, pred, prev)
                if self.dae_ratio > 0 and training and rng is not None:
                    # per-sentence switch to the denoising auto-encoder
                    # input: a poisoned copy of the target
                    # (reference iterative_nat.py:113-126)
                    corrupt = (
                        jax.random.uniform(rng.next(), (tgt.shape[0],))
                        < self.dae_ratio
                    )
                    poisoned = sequential_poisoning(
                        rng.next(), tgt, self.decoder_cfg.vocab_size,
                        self.bos, self.eos, self.pad,
                    )
                    prev = jnp.where(corrupt[:, None], poisoned, prev)

        extra = {
            "encoder_out": enc,
            "losses": losses,
            "length_out": length_out,
            "length_tgt": self.length_targets(tgt, enc),
            "word_ins_mask": word_ins_mask,
        }
        return (word_ins_out, extra), {}


@register_model_architecture(
    "iterative_nonautoregressive_transformer",
    "iterative_nonautoregressive_transformer",
)
def iter_nat_base_architecture(args):
    args.train_step = getattr(args, "train_step", 4)
    args.dae_ratio = getattr(args, "dae_ratio", 0.5)
    args.stochastic_approx = getattr(args, "stochastic_approx", False)
    nat_base_architecture(args)


@register_model_architecture(
    "iterative_nonautoregressive_transformer",
    "iterative_nonautoregressive_transformer_wmt_en_de",
)
def iter_nat_wmt_en_de(args):
    """Reference iterative_nonautoregressive_transformer.py:200-205."""
    iter_nat_base_architecture(args)


# ---------------------------------------------------------------------------
# Levenshtein transformer
# ---------------------------------------------------------------------------

def apply_del_words(tokens, scores, del_pred, pad, bos, eos):
    """Drop tokens marked for deletion, compacting left at fixed width
    (reference levenshtein_utils._apply_del_words:193-225 without the
    dynamic-width gather)."""
    in_mask = tokens != pad
    protect = (tokens == bos) | (tokens == eos)
    keep = (~del_pred | protect) & in_mask
    L = tokens.shape[1]
    ar = jnp.arange(L)[None, :]
    order = jnp.argsort(jnp.where(keep, ar, L + ar), axis=1)
    n_keep = jnp.sum(keep, axis=1, keepdims=True)
    out_tokens = jnp.take_along_axis(tokens, order, axis=1)
    out_tokens = jnp.where(ar < n_keep, out_tokens, pad)
    out_scores = jnp.take_along_axis(scores, order, axis=1)
    out_scores = jnp.where(ar < n_keep, out_scores, 0.0)
    return out_tokens, out_scores


def apply_ins_masks(tokens, scores, ins_pred, pad, unk, eos):
    """Insert `ins_pred[i]` unk placeholders after position i, clipped to the
    fixed width (reference levenshtein_utils._apply_ins_masks:139-173; the
    dynamic out_max_len becomes a greedy budget clip at L)."""
    B, L = tokens.shape
    in_mask = tokens != pad
    in_len = jnp.sum(in_mask, axis=1)
    ins = jnp.where(in_mask[:, 1:], ins_pred, 0)
    # greedy clip: keep earlier insertions once the width budget runs out
    cum = jnp.cumsum(ins, axis=1)
    cum = jnp.minimum(cum, (L - in_len)[:, None])
    ins = jnp.diff(jnp.concatenate([jnp.zeros((B, 1), cum.dtype), cum], axis=1))
    out_len = in_len + cum[:, -1]

    ar = jnp.arange(L)[None, :]
    out_tokens = jnp.where(ar < out_len[:, None], unk, pad)
    out_scores = jnp.zeros_like(scores)
    # new position of input token i>=1: i + insertions before it
    newpos = jnp.concatenate(
        [jnp.zeros((B, 1), cum.dtype), jnp.arange(1, L)[None, :] + cum], axis=1
    )
    newpos = jnp.where(in_mask, newpos, L)  # drop pads
    out_tokens = jax.vmap(
        lambda o, p, t: o.at[p].set(t, mode="drop")
    )(out_tokens, newpos, tokens)
    out_scores = jax.vmap(
        lambda o, p, s: o.at[p].set(s, mode="drop")
    )(out_scores, newpos, scores)
    return out_tokens, out_scores


def apply_ins_words(tokens, scores, word_pred, word_scores, unk):
    """Fill unk placeholders with predicted words (reference
    levenshtein_utils._apply_ins_words:176-190)."""
    m = tokens == unk
    return (
        jnp.where(m, word_pred, tokens),
        jnp.where(m, word_scores, scores),
    )


def get_ins_targets(prev_tokens, tgt_tokens, pad, unk):
    """Device-side insertion labels (reference levenshtein_utils.
    _get_ins_targets:30-91, libnat suggested_ed2_path): align prev/tgt by
    LCS; unmatched target tokens are the insertions. Returns
    (masked_tgt_masks (B,Lt) bool, masked_tgt_tokens, mask_ins_targets
    (B,Lp-1) int)."""
    from ..ops.edit_distance import lcs_matched_masks

    B, Lp = prev_tokens.shape
    Lt = tgt_tokens.shape[1]
    prev_len = jnp.sum(prev_tokens != pad, axis=1)
    tgt_len = jnp.sum(tgt_tokens != pad, axis=1)
    matched_prev, matched_tgt = lcs_matched_masks(
        prev_tokens, prev_len, tgt_tokens, tgt_len
    )
    tgt_mask = tgt_tokens != pad
    masked_tgt_masks = tgt_mask & ~matched_tgt
    masked_tgt_tokens = jnp.where(masked_tgt_masks, unk, tgt_tokens)

    # each unmatched tgt token belongs to the gap after the r-th matched
    # token, r = #matched tgt positions before it
    rank_before = jnp.cumsum(matched_tgt.astype(jnp.int32), axis=1)
    rank_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), rank_before[:, :-1]], axis=1
    )
    counts = jax.vmap(
        lambda seg, w: jnp.zeros(Lp + 1, jnp.int32).at[seg].add(w, mode="drop")
    )(rank_before, masked_tgt_masks.astype(jnp.int32))  # counts[r]

    # prev position of the r-th matched prev token (1-indexed rank)
    ar = jnp.arange(Lp)[None, :]
    matched_pos_sorted = jnp.sort(
        jnp.where(matched_prev, ar, Lp), axis=1
    )  # (B, Lp): positions of matched tokens in rank order, Lp beyond
    n_matched = jnp.sum(matched_prev, axis=1)
    # mask_ins_targets[slot i] = counts[rank of prev token i], scattered at
    # the matched positions (gap after that token)
    mask_ins_targets = jax.vmap(
        lambda pos, c, n: jnp.zeros(Lp - 1, jnp.int32).at[
            jnp.where(jnp.arange(Lp) < n, pos, Lp)
        ].add(
            jnp.where(jnp.arange(Lp) < n, c[1: Lp + 1], 0), mode="drop"
        )
    )(matched_pos_sorted, counts, n_matched)
    mask_ins_targets = jnp.clip(mask_ins_targets, 0, 255)
    return masked_tgt_masks, masked_tgt_tokens, mask_ins_targets


def get_del_targets(pred_tokens, tgt_tokens, pad):
    """Device-side deletion labels (reference levenshtein_utils.
    _get_del_targets:94-137): 1 where the predicted token is not kept by the
    LCS alignment with the target."""
    from ..ops.edit_distance import lcs_matched_masks

    pred_len = jnp.sum(pred_tokens != pad, axis=1)
    tgt_len = jnp.sum(tgt_tokens != pad, axis=1)
    matched_pred, _ = lcs_matched_masks(
        pred_tokens, pred_len, tgt_tokens, tgt_len
    )
    return ((pred_tokens != pad) & ~matched_pred).astype(jnp.int32)


@register_model("levenshtein_transformer")
class LevenshteinTransformerModel(TransformerModel):
    """Insertion/deletion-based NAT (Gu et al. 2019).

    Counterpart of fairseq/models/nat/levenshtein_transformer.py:33-478.
    TPU redesign: all edit operations run at one fixed width L (padding
    compacts/stretches in place) so the whole refinement loop jits as one
    program; training labels come from the on-device LCS alignment
    (ops/edit_distance.lcs_matched_masks) instead of libnat C++, so label
    generation lives inside the compiled train step like the rest of the
    loss. Per-head early exit and the optional separate discriminator /
    mask-predictor stacks are preserved."""

    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False,
                 unk=3, bos=0, eos=2, pad=1, early_exit=(6, 6, 6),
                 no_share_discriminator=False, no_share_maskpredictor=False,
                 share_discriminator_maskpredictor=False,
                 sampling_for_deletion=False, label_smoothing=0.0):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.unk, self.bos, self.eos, self.pad = unk, bos, eos, pad
        self.early_exit = tuple(early_exit)  # (word_del, mask_ins, word_ins)
        self.no_share_discriminator = no_share_discriminator
        self.no_share_maskpredictor = no_share_maskpredictor
        self.share_discriminator_maskpredictor = (
            share_discriminator_maskpredictor
        )
        self.sampling_for_deletion = sampling_for_deletion
        self.label_smoothing = label_smoothing

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        # reference levenshtein_transformer.py:40-68
        parser.add_argument("--early-exit", default="6,6,6", type=str,
                            help="decoder layers before word_del, mask_ins, "
                                 "word_ins")
        parser.add_argument("--no-share-discriminator", action="store_true")
        parser.add_argument("--no-share-maskpredictor", action="store_true")
        parser.add_argument("--share-discriminator-maskpredictor",
                            action="store_true")
        parser.add_argument("--sampling-for-deletion", action="store_true")

    @classmethod
    def build_model(cls, args, task):
        levenshtein_base_architecture(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        d = task.target_dictionary
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
            early_exit=[int(i) for i in args.early_exit.split(",")],
            no_share_discriminator=getattr(
                args, "no_share_discriminator", False),
            no_share_maskpredictor=getattr(
                args, "no_share_maskpredictor", False),
            share_discriminator_maskpredictor=getattr(
                args, "share_discriminator_maskpredictor", False),
            sampling_for_deletion=getattr(
                args, "sampling_for_deletion", False),
            label_smoothing=getattr(args, "label_smoothing", 0.0),
        )

    def init(self, key):
        variables = super().init(key)
        p = variables["params"]
        d = self.decoder_cfg.embed_dim
        ks = jax.random.split(jax.random.fold_in(key, 1234), 4)
        from ..ops.core import init_linear
        from ..ops.transformer_layer import init_decoder_layer

        p["embed_mask_ins"] = init_linear(ks[0], 2 * d, 256, bias=False)
        p["embed_word_del"] = init_linear(ks[1], d, 2, bias=False)
        layer_cfg = self.decoder_cfg.layer_cfg
        if self.no_share_discriminator:
            p["layers_del"] = [
                init_decoder_layer(jax.random.fold_in(ks[2], i), layer_cfg)
                for i in range(self.early_exit[0])
            ]
        if self.no_share_maskpredictor and not (
            self.share_discriminator_maskpredictor
        ):
            p["layers_msk"] = [
                init_decoder_layer(jax.random.fold_in(ks[3], i), layer_cfg)
                for i in range(self.early_exit[1])
            ]
        return variables

    # -- head feature extraction -------------------------------------------------

    def _features(self, params, tokens, enc, head: str, rng=None,
                  deterministic=True):
        """Full-context decoder features with per-head early exit and
        (optionally) a head-specific layer stack."""
        _, dec_params = self._split_params(params)
        idx = {"word_del": 0, "mask_ins": 1, "word_ins": 2}[head]
        layers = dec_params["layers"]
        if head == "word_del" and self.no_share_discriminator:
            layers = params["layers_del"]
        if head == "mask_ins":
            if self.share_discriminator_maskpredictor:
                if self.no_share_discriminator:
                    layers = params["layers_del"]
            elif self.no_share_maskpredictor:
                layers = params["layers_msk"]
        sub = {**dec_params, "layers": list(layers)[: self.early_exit[idx]]}
        return self.decoder(
            sub, tokens,
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng, deterministic=deterministic,
            features_only=True, causal=False,
        )[0]

    def forward_mask_ins(self, params, tokens, enc, rng=None,
                         deterministic=True):
        from ..ops.core import linear

        f = self._features(params, tokens, enc, "mask_ins", rng, deterministic)
        f_cat = jnp.concatenate([f[:, :-1, :], f[:, 1:, :]], axis=2)
        return linear(params["embed_mask_ins"], f_cat)  # (B, L-1, 256)

    def forward_word_ins(self, params, tokens, enc, rng=None,
                         deterministic=True):
        _, dec_params = self._split_params(params)
        f = self._features(params, tokens, enc, "word_ins", rng, deterministic)
        return self.decoder.output_layer(dec_params, f)

    def forward_word_del(self, params, tokens, enc, rng=None,
                         deterministic=True):
        from ..ops.core import linear

        f = self._features(params, tokens, enc, "word_del", rng, deterministic)
        return linear(params["embed_word_del"], f)  # (B, L, 2)

    # -- training ---------------------------------------------------------------

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        params = variables["params"]
        enc_params, _ = self._split_params(params)
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        prev = batch["prev_output_tokens"].astype(jnp.int32)
        tgt = batch["target"].astype(jnp.int32)

        masked_tgt_masks, masked_tgt_tokens, mask_ins_targets = (
            get_ins_targets(prev, tgt, self.pad, self.unk)
        )
        mask_ins_out = self.forward_mask_ins(
            params, prev, enc, rng, not training
        )
        word_ins_out = self.forward_word_ins(
            params, masked_tgt_tokens, enc, rng, not training
        )

        if self.sampling_for_deletion and rng is not None and training:
            word_predictions = jax.random.categorical(
                rng.next(), word_ins_out.astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
        else:
            word_predictions = jnp.argmax(word_ins_out, axis=-1).astype(
                jnp.int32
            )
        word_predictions = jnp.where(masked_tgt_masks, word_predictions, tgt)

        word_del_targets = get_del_targets(word_predictions, tgt, self.pad)
        word_del_out = self.forward_word_del(
            params, word_predictions, enc, rng, not training
        )

        extra = {
            "encoder_out": enc,
            "losses": {
                "mask_ins": {
                    "out": mask_ins_out,
                    "tgt": mask_ins_targets,
                    "mask": prev[:, 1:] != self.pad,
                    "ls": 0.01,
                },
                "word_ins": {
                    "out": word_ins_out,
                    "tgt": tgt,
                    "mask": masked_tgt_masks,
                    "ls": self.label_smoothing,
                    "nll_loss": True,
                },
                "word_del": {
                    "out": word_del_out,
                    "tgt": word_del_targets,
                    "mask": word_predictions != self.pad,
                },
            },
        }
        return (word_ins_out, extra), {}

    # -- iterative refinement -----------------------------------------------------

    def initialize_output_tokens(self, variables, encoder_out: EncoderOut,
                                 max_len: int):
        """[bos, eos, pad...] at fixed width (reference :253-262)."""
        b = encoder_out.encoder_out.shape[0]
        tokens = jnp.full((b, max_len), self.pad, jnp.int32)
        tokens = tokens.at[:, 0].set(self.bos).at[:, 1].set(self.eos)
        return tokens, jnp.zeros((b, max_len), jnp.float32)

    def refinement_step(self, variables, output_tokens, output_scores,
                        encoder_out: EncoderOut, eos_penalty: float = 0.0,
                        max_ratio: Optional[float] = None):
        """delete -> insert placeholders -> fill words, all fixed-width
        (reference forward_decoder :140-250; the _skip/_fill dynamic
        sub-batching is replaced by row masking — every row runs every
        phase, terminated rows are no-ops)."""
        params = variables["params"]
        L = output_tokens.shape[1]
        if max_ratio is None:
            max_lens = jnp.full(output_tokens.shape[:1], L - 1, jnp.int32)
        else:
            src_lens = jnp.sum(
                ~encoder_out.encoder_padding_mask, axis=1
            ).astype(jnp.float32)
            max_lens = jnp.clip(
                (src_lens * max_ratio).astype(jnp.int32), 10, L - 1
            )

        # 1) delete words (rows with > 2 real tokens)
        can_del = jnp.sum(output_tokens != self.pad, axis=1) > 2
        del_logits = self.forward_word_del(params, output_tokens, encoder_out)
        del_pred = (jnp.argmax(del_logits, axis=-1) == 1) & can_del[:, None]
        output_tokens, output_scores = apply_del_words(
            output_tokens, output_scores, del_pred,
            self.pad, self.bos, self.eos,
        )

        # 2) insert unk placeholders (rows under their length budget)
        can_ins = jnp.sum(output_tokens != self.pad, axis=1) < max_lens
        ins_logits = self.forward_mask_ins(params, output_tokens, encoder_out)
        ins_scores = jax.nn.log_softmax(ins_logits.astype(jnp.float32), -1)
        if eos_penalty > 0.0:
            ins_scores = ins_scores.at[:, :, 0].add(-eos_penalty)
        ins_pred = jnp.argmax(ins_scores, axis=-1).astype(jnp.int32)
        ins_pred = jnp.minimum(ins_pred, max_lens[:, None])
        ins_pred = jnp.where(can_ins[:, None], ins_pred, 0)
        output_tokens, output_scores = apply_ins_masks(
            output_tokens, output_scores, ins_pred,
            self.pad, self.unk, self.eos,
        )

        # 3) fill the placeholders with words
        word_logits = self.forward_word_ins(params, output_tokens, encoder_out)
        word_lprobs = jax.nn.log_softmax(word_logits.astype(jnp.float32), -1)
        word_scores = jnp.max(word_lprobs, axis=-1)
        word_pred = jnp.argmax(word_lprobs, axis=-1).astype(jnp.int32)
        output_tokens, output_scores = apply_ins_words(
            output_tokens, output_scores, word_pred, word_scores, self.unk
        )
        return output_tokens, output_scores


# ---------------------------------------------------------------------------
# NA-CRF transformer
# ---------------------------------------------------------------------------

@register_model("nacrf_transformer")
class NACRFTransformerModel(NATransformerModel):
    """NAT with a dynamic (low-rank, beam-approximated) CRF over the output
    tokens (Sun et al. 2019).

    Counterpart of fairseq/models/nat/nat_crf_transformer.py:20-107; the
    CRF forward/Viterbi run as lax.scan (ops/dynamic_crf.py)."""

    def __init__(self, *args, crf_lowrank_approx=32, crf_beam_approx=64,
                 word_ins_loss_factor=0.5, label_smoothing=0.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.crf_lowrank_approx = crf_lowrank_approx
        self.crf_beam_approx = crf_beam_approx
        self.word_ins_loss_factor = word_ins_loss_factor
        self.label_smoothing = label_smoothing

    @staticmethod
    def add_args(parser):
        NATransformerModel.add_args(parser)
        parser.add_argument("--crf-lowrank-approx", type=int,
                            help="rank of the CRF transition approximation")
        parser.add_argument("--crf-beam-approx", type=int,
                            help="beam for approximating the normalizer")
        parser.add_argument("--word-ins-loss-factor", type=float,
                            help="weight of the NAT loss co-trained with "
                                 "the CRF loss")

    @classmethod
    def build_model(cls, args, task):
        nacrf_base_architecture(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        d = task.target_dictionary
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
            src_embedding_copy=getattr(args, "src_embedding_copy", False),
            crf_lowrank_approx=args.crf_lowrank_approx,
            crf_beam_approx=args.crf_beam_approx,
            word_ins_loss_factor=args.word_ins_loss_factor,
            label_smoothing=getattr(args, "label_smoothing", 0.0),
            **cls._length_pred_kwargs(args),
        )

    def init(self, key):
        from ..ops.dynamic_crf import init_dynamic_crf

        variables = super().init(key)
        variables["params"]["crf"] = init_dynamic_crf(
            jax.random.fold_in(key, 888), self.decoder_cfg.vocab_size,
            self.crf_lowrank_approx,
        )
        return variables

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        from ..ops.dynamic_crf import crf_log_likelihood

        (word_ins_out, extra), state = super().forward(
            variables, batch, rng, training
        )
        tgt = batch["target"].astype(jnp.int32)
        mask = tgt != self.pad
        crf_ll = crf_log_likelihood(
            variables["params"]["crf"], word_ins_out, tgt, mask,
            beam=self.crf_beam_approx,
        )
        crf_nll = jnp.mean(
            -crf_ll / jnp.maximum(jnp.sum(mask, axis=1), 1)
        )
        extra["losses"] = {
            "word_ins": {
                "out": word_ins_out,
                "tgt": tgt,
                "mask": mask,
                "ls": self.label_smoothing,
                "nll_loss": True,
                "factor": self.word_ins_loss_factor,
            },
            "word_crf": {"loss": crf_nll},
        }
        extra.pop("word_ins_mask", None)
        return (word_ins_out, extra), state

    def forward_decoder_step(self, variables, output_tokens, output_scores,
                             encoder_out: EncoderOut):
        """Emissions -> CRF Viterbi over the beam (reference :73-98)."""
        from ..ops.dynamic_crf import crf_viterbi

        _, dec_params = self._split_params(variables["params"])
        emissions, _ = self.decoder(
            dec_params, output_tokens,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            causal=False,
        )
        masks = output_tokens != self.pad
        scores, tokens = crf_viterbi(
            variables["params"]["crf"], emissions, masks,
            beam=self.crf_beam_approx,
        )
        new_tokens = jnp.where(masks, tokens.astype(jnp.int32), output_tokens)
        new_scores = jnp.where(masks, scores, output_scores)
        return new_tokens, new_scores


@register_model_architecture("nacrf_transformer", "nacrf_transformer")
def nacrf_base_architecture(args):
    """Reference nat_crf_transformer.py:100-107."""
    args.crf_lowrank_approx = getattr(args, "crf_lowrank_approx", 32)
    args.crf_beam_approx = getattr(args, "crf_beam_approx", 64)
    args.word_ins_loss_factor = getattr(args, "word_ins_loss_factor", 0.5)
    args.encoder_normalize_before = getattr(
        args, "encoder_normalize_before", True
    )
    args.decoder_normalize_before = getattr(
        args, "decoder_normalize_before", True
    )
    nat_base_architecture(args)


# ---------------------------------------------------------------------------
# insertion transformer
# ---------------------------------------------------------------------------

def get_insertion_targets(prev_tokens, tgt_tokens, pad, vocab_size: int,
                          tau=None):
    """Soft per-slot insertion labels (reference insertion_transformer.py
    _get_ins_targets :57-95 + NegativeDistanceScore :22-50): slot j (the gap
    after prev position j) is trained on a distribution over the unmatched
    target tokens of that gap, weighted by the balanced-binary-tree score
    softmax(-|n/2 - k| / tau) (uniform when tau is None); empty slots are
    trained to emit pad. Returns (B, L-1, V)."""
    from ..ops.edit_distance import lcs_matched_masks

    B, Lp = prev_tokens.shape
    prev_len = jnp.sum(prev_tokens != pad, axis=1)
    tgt_len = jnp.sum(tgt_tokens != pad, axis=1)
    matched_prev, matched_tgt = lcs_matched_masks(
        prev_tokens, prev_len, tgt_tokens, tgt_len
    )
    tgt_mask = tgt_tokens != pad
    unmatched = tgt_mask & ~matched_tgt

    # gap rank per tgt position, position-within-gap, gap sizes
    rank_before = jnp.cumsum(matched_tgt.astype(jnp.int32), axis=1)
    rank_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), rank_before[:, :-1]], axis=1
    )  # gap id g (number of matched tgt before this position)
    Lt = tgt_tokens.shape[1]

    # position within gap: cumcount of unmatched per gap
    def cumcount(um, gap_id):
        # k[j] = number of unmatched tokens with the same gap id before j
        one = um.astype(jnp.int32)
        cum = jnp.cumsum(one) - one  # exclusive prefix count (all gaps)
        # offset[g] = total unmatched before gap g's first element
        per_gap = jax.ops.segment_sum(one, gap_id, num_segments=Lp + 1)
        gap_offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(per_gap)[:-1]]
        )
        return cum - gap_offsets[gap_id]

    def row_labels(um, gap_id, toks, m_prev):
        k = cumcount(um, gap_id)  # (Lt,)
        n = jax.ops.segment_sum(
            um.astype(jnp.float32), gap_id, num_segments=Lp + 1
        )[gap_id]  # span size per token
        if tau is None:
            w = jnp.where(um, 1.0 / jnp.maximum(n, 1.0), 0.0)
        else:
            s = -jnp.abs(n / 2.0 - k.astype(jnp.float32)) / tau
            e = jnp.where(um, jnp.exp(s), 0.0)
            z = jax.ops.segment_sum(e, gap_id, num_segments=Lp + 1)[gap_id]
            w = jnp.where(um, e / jnp.maximum(z, 1e-9), 0.0)
        # slot index for gap g: position of the g-th matched prev token
        ar = jnp.arange(Lp)
        matched_pos = jnp.sort(jnp.where(m_prev, ar, Lp))
        n_matched = jnp.sum(m_prev)
        slot_of_gap = jnp.concatenate(
            [jnp.full(1, Lp, jnp.int32), matched_pos.astype(jnp.int32)]
        )  # gap 0 = before first token: dropped (bos always matches)
        slots = slot_of_gap[gap_id]  # (Lt,)
        labels = jnp.zeros((Lp - 1, vocab_size), jnp.float32)
        labels = labels.at[slots, toks].add(jnp.where(um, w, 0.0),
                                            mode="drop")
        # empty real slots -> emit pad
        filled = jax.ops.segment_sum(
            um.astype(jnp.float32), slots, num_segments=Lp
        )[: Lp - 1]
        real_slot = (jnp.arange(Lp - 1) + 1) < jnp.sum(m_prev)  # interior
        labels = labels.at[:, pad].add(
            jnp.where(real_slot & (filled == 0), 1.0, 0.0)
        )
        return labels

    return jax.vmap(row_labels)(
        unmatched, rank_before, tgt_tokens.astype(jnp.int32), matched_prev
    )


def apply_ins_words_between(tokens, scores, pred, pred_scores, pad):
    """Interleave one predicted token into each gap whose prediction is not
    pad, at fixed width (reference insertion_transformer.py
    _apply_ins_words :104-121)."""
    B, L = tokens.shape
    in_mask = tokens != pad
    ins = (
        (pred != pad) & in_mask[:, 1:]
    ).astype(jnp.int32)  # one slot per gap
    in_len = jnp.sum(in_mask, axis=1)
    cum = jnp.cumsum(ins, axis=1)
    cum = jnp.minimum(cum, (L - in_len)[:, None])
    ins = jnp.diff(
        jnp.concatenate([jnp.zeros((B, 1), cum.dtype), cum], axis=1)
    )
    out_tokens = jnp.full((B, L), pad, tokens.dtype)
    out_scores = jnp.zeros_like(scores)
    newpos = jnp.concatenate(
        [jnp.zeros((B, 1), cum.dtype), jnp.arange(1, L)[None, :] + cum],
        axis=1,
    )
    newpos = jnp.where(in_mask, newpos, L)
    out_tokens = jax.vmap(lambda o, p, t: o.at[p].set(t, mode="drop"))(
        out_tokens, newpos, tokens
    )
    out_scores = jax.vmap(lambda o, p, s: o.at[p].set(s, mode="drop"))(
        out_scores, newpos, scores
    )
    # insertion for gap j lands right after token j
    ins_pos = jnp.where(
        ins > 0, jnp.arange(L - 1)[None, :] + cum, L
    )
    out_tokens = jax.vmap(lambda o, p, t: o.at[p].set(t, mode="drop"))(
        out_tokens, ins_pos, pred.astype(tokens.dtype)
    )
    out_scores = jax.vmap(lambda o, p, s: o.at[p].set(s, mode="drop"))(
        out_scores, ins_pos, pred_scores
    )
    return out_tokens, out_scores


@register_model("insertion_transformer")
class InsertionTransformerModel(LevenshteinTransformerModel):
    """Insertion-based NAT (Stern et al. 2019): one token per slot per
    refinement pass, trained with balanced-tree soft labels.

    Counterpart of fairseq/models/nat/insertion_transformer.py:22-280."""

    def __init__(self, *args, label_tau=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.label_tau = label_tau

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        parser.add_argument("--label-tau", default=None, type=float)

    @classmethod
    def build_model(cls, args, task):
        insertion_base_architecture(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        d = task.target_dictionary
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            unk=d.unk(), bos=d.bos(), eos=d.eos(), pad=d.pad(),
            label_tau=getattr(args, "label_tau", None),
            label_smoothing=getattr(args, "label_smoothing", 0.0),
        )

    def init(self, key):
        variables = TransformerModel.init(self, key)
        from ..ops.core import init_linear

        d = self.decoder_cfg.embed_dim
        variables["params"]["pool_out"] = init_linear(
            jax.random.fold_in(key, 4321), 2 * d, d
        )
        return variables

    def forward_word_ins(self, params, tokens, enc, rng=None,
                         deterministic=True):
        """Pairwise-pooled slot features -> vocab logits (B, L-1, V)."""
        from ..ops.core import linear

        _, dec_params = self._split_params(params)
        f = self.decoder(
            dec_params, tokens,
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng, deterministic=deterministic,
            features_only=True, causal=False,
        )[0]
        pooled = linear(
            params["pool_out"],
            jnp.concatenate([f[:, :-1, :], f[:, 1:, :]], axis=2),
        )
        return self.decoder.output_layer(dec_params, pooled)

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        params = variables["params"]
        enc_params, _ = self._split_params(params)
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        prev = batch["prev_output_tokens"].astype(jnp.int32)
        tgt = batch["target"].astype(jnp.int32)
        word_ins_out = self.forward_word_ins(
            params, prev, enc, rng, not training
        )
        word_ins_tgt = get_insertion_targets(
            prev, tgt, self.pad, word_ins_out.shape[-1], tau=self.label_tau
        )
        extra = {
            "encoder_out": enc,
            "losses": {
                "word_ins": {
                    "out": word_ins_out,
                    "tgt": word_ins_tgt,
                    "mask": prev[:, 1:] != self.pad,
                    "ls": self.label_smoothing,
                    "nll_loss": True,
                },
            },
        }
        return (word_ins_out, extra), {}

    def refinement_step(self, variables, output_tokens, output_scores,
                        encoder_out: EncoderOut, eos_penalty: float = 0.0,
                        max_ratio=None):
        lprobs = jax.nn.log_softmax(
            self.forward_word_ins(
                variables["params"], output_tokens, encoder_out
            ).astype(jnp.float32),
            axis=-1,
        )
        if eos_penalty > 0.0:
            lprobs = lprobs.at[:, :, self.pad].add(-eos_penalty)
        scores = jnp.max(lprobs, axis=-1)
        pred = jnp.argmax(lprobs, axis=-1).astype(jnp.int32)
        return apply_ins_words_between(
            output_tokens, output_scores, pred, scores, self.pad
        )


@register_model_architecture("insertion_transformer",
                             "insertion_transformer")
def insertion_base_architecture(args):
    """Reference insertion_transformer.py:240-280."""
    args.label_tau = getattr(args, "label_tau", None)
    args.early_exit = getattr(args, "early_exit", "6,6,6")
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", False
    )
    transformer_base(args)


@register_model_architecture(
    "levenshtein_transformer", "levenshtein_transformer"
)
def levenshtein_base_architecture(args):
    """Reference levenshtein_transformer.py:400-450."""
    args.early_exit = getattr(args, "early_exit", "6,6,6")
    args.no_share_discriminator = getattr(
        args, "no_share_discriminator", False
    )
    args.no_share_maskpredictor = getattr(
        args, "no_share_maskpredictor", False
    )
    args.share_discriminator_maskpredictor = getattr(
        args, "share_discriminator_maskpredictor", False
    )
    args.sampling_for_deletion = getattr(args, "sampling_for_deletion", False)
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", True
    )
    transformer_base(args)


@register_model_architecture(
    "levenshtein_transformer", "levenshtein_transformer_wmt_en_de"
)
def levenshtein_wmt_en_de(args):
    levenshtein_base_architecture(args)


@register_model_architecture(
    "levenshtein_transformer", "levenshtein_transformer_vaswani_wmt_en_de_big"
)
def levenshtein_vaswani_wmt_en_de_big(args):
    """Reference levenshtein_transformer.py:453-467 (1024/4096/16, drop .3)."""
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1024)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 4096)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    args.encoder_normalize_before = getattr(
        args, "encoder_normalize_before", False
    )
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 1024)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 4096)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    args.dropout = getattr(args, "dropout", 0.3)
    levenshtein_base_architecture(args)


@register_model_architecture(
    "levenshtein_transformer", "levenshtein_transformer_wmt_en_de_big"
)
def levenshtein_wmt_en_de_big_t2t(args):
    """Reference levenshtein_transformer.py:470-479 (t2t: pre-norm + attn/act
    dropout .1 on top of the vaswani big preset)."""
    args.encoder_normalize_before = getattr(
        args, "encoder_normalize_before", True
    )
    args.decoder_normalize_before = getattr(
        args, "decoder_normalize_before", True
    )
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_dropout = getattr(args, "activation_dropout", 0.1)
    levenshtein_vaswani_wmt_en_de_big(args)


@register_model_architecture("cmlm_transformer", "cmlm_transformer")
def cmlm_base_architecture(args):
    args.encoder_normalize_before = getattr(args, "encoder_normalize_before", False)
    args.decoder_normalize_before = getattr(args, "decoder_normalize_before", False)
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", True
    )
    transformer_base(args)


@register_model_architecture("cmlm_transformer", "cmlm_transformer_wmt_en_de")
def cmlm_wmt_en_de(args):
    cmlm_base_architecture(args)
