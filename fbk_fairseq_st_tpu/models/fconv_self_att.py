"""fconv_self_att: convolutional seq2seq with (gated, downsampled)
self-attention — the hierarchical story-generation model (Fan et al. 2018).

Counterpart of fairseq/models/fconv_self_att.py:35-584 +
fairseq/modules/downsampled_multihead_attention.py +
fairseq/modules/scalar_bias.py. Preserved: GLU conv stacks with sqrt(0.5)
residuals, encoder (x, y) split for attention, strict-past causal mask with
a learned-to-zero scalar-bias sink position, per-head key/value time
downsampling (stride = head_index + 1), GatedLinear (GLU-interspersed)
projections, and the grad-multiply encoder scaling. TPU notes: everything
is batch-first (B, T, C); downsampled heads run at fixed strided widths so
the whole stack jits statically; incremental generation re-runs the causal
decoder at full width per step (self-attention needs the whole prefix
anyway). The --pretrained fusion variant (frozen second model + gated
joining, reference :376-478) is implemented below
(fconv_selfatt_pretrained, lines ~246-482).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import NEG_INF, RngStream, dropout, embedding, init_embedding, linear, normal_init
from ..ops.positional import PositionalEmbedding
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .fconv import _conv1d, _init_conv, _init_fc, grad_multiply


def scalar_bias(x, axis: int):
    """Prepend a zero 'sink' slot along axis (reference scalar_bias.py)."""
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (1, 0)
    return jnp.pad(x, pad_widths)


def _init_gated_linear(key, in_f, out_f, dropout_p=0.0):
    ks = jax.random.split(key, 3)
    return {
        "l1": _init_fc(ks[0], in_f, out_f * 4, dropout_p),
        "l2": _init_fc(ks[1], out_f * 2, out_f * 2, dropout_p),
        "l3": _init_fc(ks[2], out_f, out_f, dropout_p),
    }


def gated_linear(p, x):
    """Linear+GLU x2 then Linear (reference GatedLinear :248-257)."""
    x = jax.nn.glu(linear(p["l1"], x), axis=-1)
    x = jax.nn.glu(linear(p["l2"], x), axis=-1)
    return linear(p["l3"], x)


class AttnConfig(NamedTuple):
    out_channels: int
    embed_dim: int
    num_heads: int
    project_input: bool = True
    gated: bool = False
    downsample: bool = False


def _init_proj(key, cfg: AttnConfig, in_f, out_f):
    if cfg.gated:
        return _init_gated_linear(key, in_f, out_f)
    return _init_fc(key, in_f, out_f)


def _proj(cfg: AttnConfig, p, x):
    return gated_linear(p, x) if cfg.gated else linear(p, x)


def init_downsampled_mha(key, cfg: AttnConfig):
    """Reference DownsampledMultiHeadAttention :150-187."""
    head_dim = cfg.embed_dim // cfg.num_heads
    assert head_dim * cfg.num_heads == cfg.embed_dim
    if cfg.downsample:
        heads = []
        for i in range(cfg.num_heads):
            ks = jax.random.split(jax.random.fold_in(key, i), 4)
            heads.append({
                "q": _init_proj(ks[0], cfg, cfg.embed_dim, head_dim),
                "k": _init_proj(ks[1], cfg, cfg.embed_dim, head_dim),
                "v": _init_proj(ks[2], cfg, cfg.embed_dim, head_dim),
                "out": _init_fc(ks[3], head_dim, head_dim),
            })
        return {
            "heads": heads,
            "out_proj": _init_fc(
                jax.random.fold_in(key, 99), cfg.embed_dim, cfg.out_channels
            ),
        }
    ks = jax.random.split(key, 4)
    d = cfg.embed_dim
    return {
        "q": _init_proj(ks[0], cfg, d, d),
        "k": _init_proj(ks[1], cfg, d, d),
        "v": _init_proj(ks[2], cfg, d, d),
        "out": _init_fc(ks[3], d, cfg.out_channels),
    }


def _one_head(cfg: AttnConfig, p, query, key, value, head_index: int,
              mask_future: bool, use_scalar_bias: bool, head_dim: int):
    """(B, T, C) single head (reference SingleHeadAttention :62-147)."""
    stride = head_index + 1 if cfg.downsample else 1
    k, v = key, value
    if cfg.downsample:
        k = k[:, ::stride]
        v = v[:, ::stride]
    q = query
    if cfg.project_input:
        q = _proj(cfg, p["q"], q)
        k = _proj(cfg, p["k"], k)
        v = _proj(cfg, p["v"], v)
    q = q * head_dim ** -0.5

    B, T = query.shape[0], query.shape[1]
    S = k.shape[1]
    if not cfg.downsample and cfg.num_heads > 1:
        # fold heads into batch
        q = q.reshape(B, T, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
    else:
        scores = jnp.einsum("btd,bsd->bts", q, k)

    if mask_future:
        # strictly-past mask: position t sees source positions j with
        # j * stride < t (reference :107-118 tril(diagonal=-1) strided)
        tq = jnp.arange(T)[:, None]
        sj = jnp.arange(S)[None, :] * stride
        allowed = sj < tq
        shape = (1,) * (scores.ndim - 2) + (T, S)
        scores = jnp.where(
            allowed.reshape(shape), scores, NEG_INF
        )
    if use_scalar_bias:
        scores = scalar_bias(scores, scores.ndim - 1)
        v = scalar_bias(v, v.ndim - 2)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        query.dtype
    )
    if not cfg.downsample and cfg.num_heads > 1:
        out = jnp.einsum("bhts,bhsd->bhtd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, cfg.embed_dim)
    else:
        out = jnp.einsum("bts,bsd->btd", w, v)
    return linear(p["out"], out), w


def downsampled_mha(cfg: AttnConfig, p, query, key, value,
                    mask_future: bool = False,
                    use_scalar_bias: bool = False):
    head_dim = cfg.embed_dim // cfg.num_heads
    if cfg.downsample:
        outs = []
        w0 = None
        for i, hp in enumerate(p["heads"]):
            o, w = _one_head(
                cfg, hp, query, key, value, i, mask_future,
                use_scalar_bias, head_dim,
            )
            outs.append(o)
            if i == 0:
                w0 = w
        full = jnp.concatenate(outs, axis=-1)
        return linear(p["out_proj"], full), w0
    return _one_head(
        cfg, p, query, key, value, 1, mask_future, use_scalar_bias, head_dim
    )


def init_self_attention(key, cfg: AttnConfig):
    """Reference SelfAttention :490-509 (q/k/v pre-projections + LN)."""
    ks = jax.random.split(key, 5)
    return {
        "attn": init_downsampled_mha(ks[0], cfg),
        "in_proj_q": _init_fc(ks[1], cfg.out_channels, cfg.embed_dim),
        "in_proj_k": _init_fc(ks[2], cfg.out_channels, cfg.embed_dim),
        "in_proj_v": _init_fc(ks[3], cfg.out_channels, cfg.embed_dim),
        "ln": {"scale": jnp.ones(cfg.out_channels),
               "bias": jnp.zeros(cfg.out_channels)},
    }


def self_attention(cfg: AttnConfig, p, x):
    residual = x
    q = linear(p["in_proj_q"], x)
    k = linear(p["in_proj_k"], x)
    v = linear(p["in_proj_v"], x)
    out, _ = downsampled_mha(
        cfg, p["attn"], q, k, v, mask_future=True, use_scalar_bias=True
    )
    from ..ops.core import layer_norm

    return layer_norm(p["ln"], out + residual)


def _expand_bool(val, n):
    if isinstance(val, bool):
        return [val] * n
    return list(val)


class FConvSelfAttConfig(NamedTuple):
    src_vocab: int
    tgt_vocab: int
    encoder_embed_dim: int
    decoder_embed_dim: int
    decoder_out_embed_dim: int
    encoder_convolutions: Tuple[Tuple[int, int], ...]
    decoder_convolutions: Tuple[Tuple[int, int], ...]
    encoder_attention: Tuple[bool, ...]
    decoder_attention: Tuple[bool, ...]
    self_attention: Tuple[bool, ...]
    encoder_attention_nheads: int
    attention_nheads: int
    selfattention_nheads: int
    project_input: bool
    gated_attention: bool
    downsample: bool
    dropout: float
    padding_idx: int
    max_positions: int = 1024


@register_model("fconv_self_att")
class FConvSelfAttModel(Model):
    def __init__(self, cfg: FConvSelfAttConfig):
        self.cfg = cfg
        self.pos_enc = PositionalEmbedding(
            cfg.max_positions, cfg.encoder_embed_dim, cfg.padding_idx,
            learned=True,
        )
        self.pos_dec = PositionalEmbedding(
            cfg.max_positions, cfg.decoder_embed_dim, cfg.padding_idx,
            learned=True,
        )
        self.num_attention_layers = sum(1 for a in cfg.decoder_attention if a)
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions
        self.pretrained_model = None  # set for the fusion variant
        self.pretrained_params = None

    @staticmethod
    def add_args(parser):
        # reference fconv_self_att.py:69-107
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--encoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--encoder-layers", type=str, metavar="EXPR")
        parser.add_argument("--decoder-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-layers", type=str, metavar="EXPR")
        parser.add_argument("--decoder-out-embed-dim", type=int, metavar="N")
        parser.add_argument("--decoder-attention", type=str, metavar="EXPR")
        parser.add_argument("--self-attention", type=str, metavar="EXPR")
        parser.add_argument("--multihead-attention-nheads", type=int)
        parser.add_argument("--multihead-self-attention-nheads", type=int)
        parser.add_argument("--encoder-attention", type=str, metavar="EXPR")
        parser.add_argument("--encoder-attention-nheads", type=int)
        parser.add_argument("--project-input", type=str, metavar="EXPR")
        parser.add_argument("--gated-attention", type=str, metavar="EXPR")
        parser.add_argument("--downsample", type=str, metavar="EXPR")
        parser.add_argument("--pretrained-checkpoint", metavar="DIR")
        parser.add_argument("--pretrained", type=str, metavar="EXPR")

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        pretrained = eval(str(getattr(args, "pretrained", "False")))  # noqa: S307
        enc_convs = tuple(eval(args.encoder_layers))  # noqa: S307
        dec_convs = tuple(eval(args.decoder_layers))  # noqa: S307
        cfg = FConvSelfAttConfig(
            src_vocab=len(task.source_dictionary),
            tgt_vocab=len(task.target_dictionary),
            encoder_embed_dim=args.encoder_embed_dim,
            decoder_embed_dim=args.decoder_embed_dim,
            decoder_out_embed_dim=args.decoder_out_embed_dim,
            encoder_convolutions=enc_convs,
            decoder_convolutions=dec_convs,
            encoder_attention=tuple(_expand_bool(
                eval(args.encoder_attention), len(enc_convs)  # noqa: S307
            )),
            decoder_attention=tuple(_expand_bool(
                eval(args.decoder_attention), len(dec_convs)  # noqa: S307
            )),
            self_attention=tuple(_expand_bool(
                eval(args.self_attention), len(dec_convs)  # noqa: S307
            )),
            encoder_attention_nheads=args.encoder_attention_nheads,
            attention_nheads=args.multihead_attention_nheads,
            selfattention_nheads=args.multihead_self_attention_nheads,
            project_input=eval(str(args.project_input)),  # noqa: S307
            gated_attention=eval(str(args.gated_attention)),  # noqa: S307
            downsample=eval(str(args.downsample)),  # noqa: S307
            dropout=args.dropout,
            padding_idx=task.target_dictionary.pad(),
            max_positions=min(
                getattr(args, "max_source_positions", 1024),
                getattr(args, "max_target_positions", 1024),
            ),
        )
        model = cls(cfg)
        if pretrained:
            # model fusion (reference fconv_self_att.py:111-147 and
            # :376-478): a frozen copy of a pretrained checkpoint runs in
            # parallel; gates over the concatenated fc2 features pick
            # between the two before the output projection
            from ..train.checkpoint import load_model_ensemble

            ensemble, _ = load_model_ensemble(
                [args.pretrained_checkpoint], task=task
            )
            pre_model, pre_vars = ensemble[0]
            assert isinstance(pre_model, FConvSelfAttModel), (
                "--pretrained-checkpoint must hold an fconv_self_att model"
            )
            model.pretrained_model = pre_model
            model.pretrained_params = pre_vars["params"]
        return model

    # -- init -----------------------------------------------------------------

    def _enc_attn_cfg(self, out_c):
        return AttnConfig(
            out_channels=out_c,
            embed_dim=self.cfg.encoder_embed_dim,
            num_heads=self.cfg.encoder_attention_nheads,
        )

    def _dec_attn_cfg(self, out_c):
        return AttnConfig(
            out_channels=out_c,
            embed_dim=self.cfg.decoder_embed_dim,
            num_heads=self.cfg.attention_nheads,
            project_input=False, gated=False, downsample=False,
        )

    def _self_attn_cfg(self, out_c):
        return AttnConfig(
            out_channels=out_c,
            embed_dim=self.cfg.decoder_embed_dim,
            num_heads=self.cfg.selfattention_nheads,
            project_input=self.cfg.project_input,
            gated=self.cfg.gated_attention,
            downsample=self.cfg.downsample,
        )

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, 12)
        p: Dict[str, Any] = {
            "encoder_embed": {
                "w": normal_init(ks[0], (cfg.src_vocab, cfg.encoder_embed_dim),
                                 std=0.1).at[cfg.padding_idx].set(0.0)
            },
            "encoder_pos": {
                "w": normal_init(
                    ks[1],
                    (cfg.max_positions + cfg.padding_idx + 1,
                     cfg.encoder_embed_dim), std=0.1,
                )
            },
            "decoder_embed": {
                "w": normal_init(ks[2], (cfg.tgt_vocab, cfg.decoder_embed_dim),
                                 std=0.1).at[cfg.padding_idx].set(0.0)
            },
            "decoder_pos": {
                "w": normal_init(
                    ks[3],
                    (cfg.max_positions + cfg.padding_idx + 1,
                     cfg.decoder_embed_dim), std=0.1,
                )
            },
        }
        in_c = cfg.encoder_convolutions[0][0]
        p["enc_fc1"] = _init_fc(ks[4], cfg.encoder_embed_dim, in_c, cfg.dropout)
        p["enc_projs"], p["enc_convs"], p["enc_attn"] = {}, [], {}
        for i, (out_c, k) in enumerate(cfg.encoder_convolutions):
            kk = jax.random.fold_in(ks[5], i)
            if in_c != out_c:
                p["enc_projs"][str(i)] = _init_fc(kk, in_c, out_c)
            p["enc_convs"].append(
                _init_conv(jax.random.fold_in(kk, 1), in_c, out_c * 2, k,
                           cfg.dropout)
            )
            if cfg.encoder_attention[i]:
                p["enc_attn"][str(i)] = init_self_attention(
                    jax.random.fold_in(kk, 2), self._enc_attn_cfg(out_c)
                )
            in_c = out_c
        p["enc_fc2"] = _init_fc(ks[6], in_c, cfg.encoder_embed_dim)

        in_c = cfg.decoder_convolutions[0][0]
        p["dec_fc1"] = _init_fc(ks[7], cfg.decoder_embed_dim, in_c, cfg.dropout)
        p["dec_projs"], p["dec_convs"] = {}, []
        p["dec_attn"], p["dec_attproj"], p["dec_selfattn"] = {}, {}, {}
        for i, (out_c, k) in enumerate(cfg.decoder_convolutions):
            kk = jax.random.fold_in(ks[8], i)
            if in_c != out_c:
                p["dec_projs"][str(i)] = _init_fc(kk, in_c, out_c)
            p["dec_convs"].append(
                _init_conv(jax.random.fold_in(kk, 1), in_c, out_c * 2, k,
                           cfg.dropout)
            )
            if cfg.decoder_attention[i]:
                p["dec_attn"][str(i)] = init_downsampled_mha(
                    jax.random.fold_in(kk, 2), self._dec_attn_cfg(out_c)
                )
                p["dec_attproj"][str(i)] = _init_fc(
                    jax.random.fold_in(kk, 3), out_c, cfg.decoder_embed_dim,
                    cfg.dropout,
                )
            if cfg.self_attention[i]:
                p["dec_selfattn"][str(i)] = init_self_attention(
                    jax.random.fold_in(kk, 4), self._self_attn_cfg(out_c)
                )
            in_c = out_c
        p["dec_fc2"] = _init_fc(ks[9], in_c, cfg.decoder_out_embed_dim)
        p["dec_fc3"] = _init_fc(
            ks[10], cfg.decoder_out_embed_dim, cfg.tgt_vocab, cfg.dropout
        )
        if self.pretrained_model is not None:
            # frozen pretrained copy (gradients stopped in forward) + the
            # gating / joining fusion stack (reference :104-127)
            o = cfg.decoder_out_embed_dim
            fk = jax.random.fold_in(key, 777)
            fks = jax.random.split(fk, 6)
            p["pretrained"] = self.pretrained_params
            p["gate1"] = _init_fc(fks[0], 2 * o, o)
            p["gate2"] = _init_fc(fks[1], 2 * o, o)
            p["joining"] = {
                "l1": _init_fc(fks[2], 2 * o, 2 * o),
                "ln1": {"scale": jnp.ones(2 * o), "bias": jnp.zeros(2 * o)},
                "l2": _init_fc(fks[3], o, 2 * o),
                "ln2": {"scale": jnp.ones(2 * o), "bias": jnp.zeros(2 * o)},
                "l3": _init_fc(fks[4], o, o),
                "ln3": {"scale": jnp.ones(o), "bias": jnp.zeros(o)},
            }
        return {"params": p, "state": {}}

    # -- encoder ---------------------------------------------------------------

    def encode(self, variables, src_tokens, src_lengths, rng=None,
               training=False):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        x = embedding(p["encoder_embed"], src_tokens) + self.pos_enc.from_ids(
            p["encoder_pos"], src_tokens
        )
        x = dropout(x, cfg.dropout, rng, not training)
        input_embedding = x
        x = linear(p["enc_fc1"], x)
        padding_mask = src_tokens == cfg.padding_idx

        for i, (out_c, k) in enumerate(cfg.encoder_convolutions):
            r = (
                linear(p["enc_projs"][str(i)], x)
                if str(i) in p["enc_projs"] else x
            )
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
            x = dropout(x, cfg.dropout, rng, not training)
            pad = ((k - 1) // 2, k // 2)
            x = _conv1d(p["enc_convs"][i], x, k, pad)
            x = jax.nn.glu(x, axis=-1)
            if str(i) in p["enc_attn"]:
                x = self_attention(
                    self._enc_attn_cfg(out_c), p["enc_attn"][str(i)], x
                )
            x = (x + r) * math.sqrt(0.5)

        x = linear(p["enc_fc2"], x)
        x = jnp.where(padding_mask[:, :, None], 0.0, x)
        if training and self.num_attention_layers:
            x = grad_multiply(x, 1.0 / (2.0 * self.num_attention_layers))
        y = (x + input_embedding) * math.sqrt(0.5)
        extras = {"y": y}
        if self.pretrained_model is not None and "pretrained" in p:
            # CompositeEncoder: the frozen pretrained encoder runs on the
            # same source (reference :57-66); gradients stopped
            pre_p = jax.lax.stop_gradient(p["pretrained"])
            pre_enc, _ = self.pretrained_model.encode(
                {"params": pre_p, "state": {}}, src_tokens, src_lengths,
            )
            extras["pre_x"] = pre_enc.encoder_out
            extras["pre_y"] = pre_enc.extras["y"]
        return (
            EncoderOut(
                encoder_out=x,
                encoder_padding_mask=padding_mask,
                src_lengths=src_lengths,
                extras=extras,
            ),
            {},
        )

    # -- decoder ----------------------------------------------------------------

    def _decode(self, p, prev_tokens, enc: EncoderOut, rng, deterministic,
                features: bool = False):
        cfg = self.cfg
        enc_a, enc_b = enc.encoder_out, enc.extras["y"]
        pos = self.pos_dec.from_ids(p["decoder_pos"], prev_tokens)
        x = embedding(p["decoder_embed"], prev_tokens) + pos
        x = dropout(x, cfg.dropout, rng, deterministic)
        target_embedding = x
        x = linear(p["dec_fc1"], x)

        avg_attn = None
        for i, (out_c, k) in enumerate(cfg.decoder_convolutions):
            r = (
                linear(p["dec_projs"][str(i)], x)
                if str(i) in p["dec_projs"] else x
            )
            x = dropout(x, cfg.dropout, rng, deterministic)
            x = _conv1d(p["dec_convs"][i], x, k, (k - 1, 0))  # causal
            x = jax.nn.glu(x, axis=-1)

            if str(i) in p["dec_attn"]:
                res = x
                q = linear(p["dec_attproj"][str(i)], x) + target_embedding
                out, w = downsampled_mha(
                    self._dec_attn_cfg(out_c), p["dec_attn"][str(i)],
                    q, enc_a, enc_b,
                )
                x = out + res
                avg_attn = w if avg_attn is None else avg_attn + w
            if str(i) in p["dec_selfattn"]:
                x = self_attention(
                    self._self_attn_cfg(out_c), p["dec_selfattn"][str(i)], x
                )
            x = (x + r) * math.sqrt(0.5)

        x = linear(p["dec_fc2"], x)
        x = dropout(x, cfg.dropout, rng, deterministic)

        if self.pretrained_model is not None and "pretrained" in p:
            # gated fusion with the frozen pretrained decoder's fc2 features
            # (reference :447-470)
            from ..ops.core import layer_norm

            pre_p = jax.lax.stop_gradient(p["pretrained"])
            pre_enc = EncoderOut(
                encoder_out=enc.extras["pre_x"],
                encoder_padding_mask=enc.encoder_padding_mask,
                src_lengths=enc.src_lengths,
                extras={"y": enc.extras["pre_y"]},
            )
            trained_x, _ = self.pretrained_model._decode(
                pre_p, prev_tokens, pre_enc, rng, True, features=True
            )
            trained_x = jax.lax.stop_gradient(trained_x)
            y = jnp.concatenate([x, trained_x], axis=-1)
            g1 = jax.nn.sigmoid(linear(p["gate1"], y))
            g2 = jax.nn.sigmoid(linear(p["gate2"], y))
            fusion = jnp.concatenate([g1 * x, g2 * trained_x], axis=-1)
            j = p["joining"]
            fusion = jax.nn.glu(
                layer_norm(j["ln1"], linear(j["l1"], fusion)), axis=-1
            )
            fusion = jax.nn.glu(
                layer_norm(j["ln2"], linear(j["l2"], fusion)), axis=-1
            )
            x = layer_norm(j["ln3"], linear(j["l3"], fusion))

        if features:
            return x, {"attn": avg_attn}
        return linear(p["dec_fc3"], x), {"attn": avg_attn}

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        rng = rng or RngStream(None)
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"],
            rng, training,
        )
        logits, extra = self._decode(
            variables["params"], batch["prev_output_tokens"], enc,
            rng, not training,
        )
        extra["encoder_out"] = enc
        return (logits, extra), {}

    # -- generation (full re-decode per step: self-attention needs the whole
    # prefix, so the cache is just the growing token buffer) --------------------

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        b = encoder_out.encoder_out.shape[0]
        return {
            "tokens": jnp.full((b, max_len), self.cfg.padding_idx, jnp.int32)
        }

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        buf = jax.lax.dynamic_update_slice_in_dim(
            cache["tokens"], tokens.astype(jnp.int32), step, axis=1
        )
        logits, _ = self._decode(
            variables["params"], buf, encoder_out, RngStream(None), True
        )
        step_logits = jax.lax.dynamic_slice_in_dim(logits, step, 1, axis=1)[
            :, 0
        ]
        return step_logits, {"tokens": buf}, None


@register_model_architecture("fconv_self_att", "fconv_self_att")
def base_architecture(args):
    """Reference fconv_self_att.py:551-569."""
    args.dropout = getattr(args, "dropout", 0.1)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_layers = getattr(args, "encoder_layers", "[(512, 3)] * 3")
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_layers = getattr(args, "decoder_layers", "[(512, 3)] * 8")
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 256)
    args.decoder_attention = getattr(args, "decoder_attention", "True")
    args.self_attention = getattr(args, "self_attention", "False")
    args.encoder_attention = getattr(args, "encoder_attention", "False")
    args.multihead_attention_nheads = getattr(
        args, "multihead_attention_nheads", 1
    )
    args.multihead_self_attention_nheads = getattr(
        args, "multihead_self_attention_nheads", 1
    )
    args.encoder_attention_nheads = getattr(
        args, "encoder_attention_nheads", 1
    )
    args.project_input = getattr(args, "project_input", "False")
    args.gated_attention = getattr(args, "gated_attention", "False")
    args.downsample = getattr(args, "downsample", "False")
    args.pretrained_checkpoint = getattr(args, "pretrained_checkpoint", "")
    args.pretrained = getattr(args, "pretrained", "False")


@register_model_architecture("fconv_self_att", "fconv_self_att_wp")
def fconv_self_att_wp(args):
    """Reference fconv_self_att.py:572-584."""
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 256)
    args.encoder_layers = getattr(
        args, "encoder_layers", "[(128, 3)] * 2 + [(512,3)] * 1"
    )
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 256)
    args.decoder_layers = getattr(
        args, "decoder_layers",
        "[(512, 4)] * 4 + [(768, 4)] * 2 + [(1024, 4)] * 1",
    )
    args.decoder_out_embed_dim = getattr(args, "decoder_out_embed_dim", 256)
    args.self_attention = getattr(args, "self_attention", "True")
    args.multihead_self_attention_nheads = getattr(
        args, "multihead_self_attention_nheads", 4
    )
    args.project_input = getattr(args, "project_input", "True")
    args.gated_attention = getattr(args, "gated_attention", "True")
    args.downsample = getattr(args, "downsample", "True")
    base_architecture(args)
