"""multilingual_conv_transformer — one model per language pair with optional
sharing (COLING 2020 multilingual/gender-aware ST).

Counterpart of examples/speech_recognition/models/
multilingual_conv_transformer.py:31-226 (a FairseqMultiModel of
conv_transformers): per-pair encoder/decoder with --share-encoders /
--share-decoders / --share-decoder-embeddings; encoder language tokens are
learned embeddings of the fbank feature dim merged by 'sum' (added to every
valid frame) or 'concat' (prepended as an extra frame) —
--langtok-merge-strategy; decoder langtok replaces the bos token (handled by
the LangtokFilterBanksToTextDataset collater).

Functional layout: params = {"encoders": {key: ...}, "decoders":
{key: ...}, "lang_embeddings": (n_langs, F)}; ``pair_view(pair)`` exposes a
single-pair Model for criterions and generators.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, normal_init
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .conv_transformer import (
    ConvTransformerEncoder,
    _base_defaults,
    configs_from_args,
)
from .transformer_decoder import TransformerDecoder


def _lang_token(lang: str) -> str:
    return "__{}__".format(lang)


def _lang_token_index(dic, lang: str) -> int:
    idx = dic.index(_lang_token(lang))
    assert idx != dic.unk_index, f"cannot find language token for lang {lang}"
    return idx


class _PairView(Model):
    """Single-pair view over the multilingual param tree."""

    def __init__(self, parent: "MultilingualConvolutionalTransformerModel", pair: str):
        self.parent = parent
        self.pair = pair
        self.encoder_key = parent.encoder_key(pair)
        self.decoder_key = parent.decoder_key(pair)
        self.encoder = parent.encoders[self.encoder_key]
        self.decoder = parent.decoders[self.decoder_key]
        self.src_lang, self.tgt_lang = pair.split("-")
        self.max_source_positions = parent.max_source_positions
        self.max_target_positions = parent.max_target_positions

    def _apply_langtok(self, variables, src_tokens, src_lengths):
        p = self.parent
        if p.encoder_langtok is None:
            return src_tokens, src_lengths
        lang = (
            self.src_lang if p.encoder_langtok == "src" else self.tgt_lang
        )
        lang_idx = p.langs.index(lang)
        embed = variables["params"]["lang_embeddings"][lang_idx].astype(
            src_tokens.dtype
        )
        if p.langtok_merge_strategy == "sum":
            t = src_tokens.shape[1]
            valid = (
                jnp.arange(t)[None, :] < src_lengths[:, None]
            )[..., None].astype(src_tokens.dtype)
            return src_tokens + valid * embed, src_lengths
        # concat: prepend the lang embedding as an extra frame
        b = src_tokens.shape[0]
        frame = jnp.broadcast_to(embed, (b, 1, embed.shape[-1]))
        return (
            jnp.concatenate([frame, src_tokens], axis=1),
            src_lengths + 1,
        )

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        src_tokens, src_lengths = self._apply_langtok(
            variables, src_tokens, src_lengths
        )
        enc_params = variables["params"]["encoders"][self.encoder_key]
        enc_state = variables["state"]["encoders"][self.encoder_key]
        out, new_state = self.encoder(
            enc_params, enc_state, src_tokens, src_lengths,
            rng=rng, deterministic=not training, training=training,
        )
        return out, new_state

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        encoder_out, enc_state = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits, extra = self.decoder(
            variables["params"]["decoders"][self.decoder_key],
            batch["prev_output_tokens"],
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        extra["encoder_out"] = encoder_out
        new_states = dict(variables["state"]["encoders"])
        new_states[self.encoder_key] = enc_state
        return (logits, extra), {"encoders": new_states}

    def init_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        return self.decoder.init_cache(
            variables["params"]["decoders"][self.decoder_key],
            batch, max_len, encoder_out.encoder_out, dtype,
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        return self.decoder.step(
            variables["params"]["decoders"][self.decoder_key],
            tokens, cache, step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
        )


@register_model("multilingual_conv_transformer")
class MultilingualConvolutionalTransformerModel(Model):
    def __init__(self, lang_pairs: List[str], langs: List[str],
                 encoder_cfg, decoder_cfgs: Dict[str, object],
                 share_encoders: bool, share_decoders: bool,
                 encoder_langtok: Optional[str], langtok_merge_strategy: str,
                 audio_features: int,
                 pretrained_encoder: Optional[str] = None,
                 pretrained_decoder: Optional[str] = None,
                 allow_partial_restore: bool = False):
        self.pretrained_encoder = pretrained_encoder
        self.pretrained_decoder = pretrained_decoder
        self.allow_partial_restore = allow_partial_restore
        self.lang_pairs = lang_pairs
        self.langs = langs
        self.share_encoders = share_encoders
        self.share_decoders = share_decoders
        self.encoder_langtok = encoder_langtok
        self.langtok_merge_strategy = langtok_merge_strategy
        self.audio_features = audio_features
        self.encoder_cfg = encoder_cfg
        self.decoder_cfgs = decoder_cfgs

        self.encoders = {
            key: ConvTransformerEncoder(encoder_cfg)
            for key in self._encoder_keys()
        }
        self.decoders = {
            key: TransformerDecoder(decoder_cfgs[key])
            for key in self._decoder_keys()
        }
        self.max_source_positions = encoder_cfg.max_positions
        self.max_target_positions = next(iter(decoder_cfgs.values())).max_positions

    def _encoder_keys(self):
        if self.share_encoders:
            return ["shared"]
        return sorted({p.split("-")[0] for p in self.lang_pairs})

    def _decoder_keys(self):
        if self.share_decoders:
            return ["shared"]
        return sorted({p.split("-")[1] for p in self.lang_pairs})

    def encoder_key(self, pair: str) -> str:
        return "shared" if self.share_encoders else pair.split("-")[0]

    def decoder_key(self, pair: str) -> str:
        return "shared" if self.share_decoders else pair.split("-")[1]

    def pair_view(self, pair: str) -> _PairView:
        return _PairView(self, pair)

    @staticmethod
    def add_args(parser):
        from .conv_transformer import ConvolutionalTransformerModel

        ConvolutionalTransformerModel.add_args(parser)
        parser.add_argument("--share-encoders", action="store_true",
                            help="share encoders across languages")
        parser.add_argument("--share-decoders", action="store_true",
                            help="share decoders across languages")
        parser.add_argument("--share-decoder-embeddings", action="store_true",
                            help="share decoder embeddings across languages")
        parser.add_argument("--pretrained-encoder", type=str, default=None)
        parser.add_argument("--pretrained-decoder", type=str, default=None)
        # --allow-partial-restore is a checkpoint-group flag (options.py);
        # the reference model reads args.allow_partial_restore without
        # re-registering it (multilingual_conv_transformer.py:93,136)

    @classmethod
    def build_model(cls, args, task):
        base_multilingual_architecture(args)
        lang_pairs = (
            args.lang_pairs
            if isinstance(args.lang_pairs, list)
            else args.lang_pairs.split(",")
        )
        langs = sorted({x for p in lang_pairs for x in p.split("-")})

        # per-decoder configs from the per-target dictionaries
        decoder_cfgs = {}

        class _SingleDictTask:
            def __init__(self, tgt_dict):
                self.target_dictionary = tgt_dict
                self.source_dictionary = None

        share_decoders = getattr(args, "share_decoders", False)
        if share_decoders:
            tgt = lang_pairs[0].split("-")[1]
            encoder_cfg, dec_cfg = configs_from_args(
                args, _SingleDictTask(task.dicts[tgt])
            )
            decoder_cfgs["shared"] = dec_cfg
        else:
            encoder_cfg = None
            for pair in lang_pairs:
                tgt = pair.split("-")[1]
                encoder_cfg, dec_cfg = configs_from_args(
                    args, _SingleDictTask(task.dicts[tgt])
                )
                decoder_cfgs.setdefault(tgt, dec_cfg)

        return cls(
            lang_pairs=lang_pairs,
            langs=langs,
            encoder_cfg=encoder_cfg,
            decoder_cfgs=decoder_cfgs,
            share_encoders=getattr(args, "share_encoders", False),
            share_decoders=share_decoders,
            encoder_langtok=getattr(args, "encoder_langtok", None),
            langtok_merge_strategy=getattr(args, "langtok_merge_strategy", "concat"),
            audio_features=args.input_feat_per_channel,
            pretrained_encoder=getattr(args, "pretrained_encoder", None),
            pretrained_decoder=getattr(args, "pretrained_decoder", None),
            allow_partial_restore=getattr(args, "allow_partial_restore", False),
        )

    def init(self, key):
        params: Dict[str, object] = {"encoders": {}, "decoders": {}}
        state: Dict[str, object] = {"encoders": {}}
        for i, (k, enc) in enumerate(sorted(self.encoders.items())):
            p, s = enc.init(jax.random.fold_in(key, i))
            params["encoders"][k] = p
            state["encoders"][k] = s
        for i, (k, dec) in enumerate(sorted(self.decoders.items())):
            params["decoders"][k] = dec.init(jax.random.fold_in(key, 100 + i))
        if self.encoder_langtok is not None:
            params["lang_embeddings"] = normal_init(
                jax.random.fold_in(key, 999),
                (len(self.langs), self.audio_features),
                std=self.audio_features ** -0.5,
            )
        variables = {"params": params, "state": state}
        if self.pretrained_encoder or self.pretrained_decoder:
            variables = self._load_pretrained(variables)
        return variables

    def _load_pretrained(self, variables):
        """Warm-start each encoder/decoder from a (mono- or bi-lingual)
        conv_transformer checkpoint, growing vocab-sized matrices by
        len(langs) rows for the appended language tokens — the reference
        resize_model_to_new_dict fine-tuning path
        (multilingual_conv_transformer.py:104-127). New rows keep their fresh
        random init; old rows are copied."""
        from ..train.checkpoint import load_checkpoint_to_cpu

        def merge(dst, src, path=()):
            if isinstance(dst, dict) and isinstance(src, dict):
                out = {}
                for k in dst:
                    out[k] = (
                        merge(dst[k], src[k], path + (k,))
                        if k in src else dst[k]
                    )
                missing = set(src) - set(dst)
                if missing and not self.allow_partial_restore:
                    raise ValueError(
                        "Cannot load from checkpoint, unexpected keys at "
                        "{}: {}".format("/".join(path), sorted(missing))
                    )
                return out
            if isinstance(dst, list) and isinstance(src, list):
                return [
                    merge(d, s, path + (str(i),))
                    for i, (d, s) in enumerate(zip(dst, src))
                ] + dst[len(src):]
            dst_arr, src_arr = jnp.asarray(dst), jnp.asarray(src)
            if dst_arr.shape == src_arr.shape:
                return src_arr
            if (
                dst_arr.ndim == src_arr.ndim
                and dst_arr.shape[1:] == src_arr.shape[1:]
                and dst_arr.shape[0] == src_arr.shape[0] + len(self.langs)
            ):
                # dictionary grown by the language tokens: copy old rows,
                # keep fresh init for the new ones
                return dst_arr.at[: src_arr.shape[0]].set(src_arr)
            raise ValueError(
                "Shape mismatch at {}: checkpoint {} vs model {}".format(
                    "/".join(path), src_arr.shape, dst_arr.shape
                )
            )

        state = load_checkpoint_to_cpu(
            self.pretrained_encoder or self.pretrained_decoder
        )
        pre = state["model"]
        params = variables["params"]
        if self.pretrained_encoder:
            enc_src = pre.get("encoder")
            assert enc_src is not None, "checkpoint has no encoder params"
            for k in params["encoders"]:
                params["encoders"][k] = merge(
                    params["encoders"][k], enc_src, ("encoders", k)
                )
        if self.pretrained_decoder:
            if self.pretrained_decoder != self.pretrained_encoder:
                pre = load_checkpoint_to_cpu(self.pretrained_decoder)["model"]
            dec_src = pre.get("decoder")
            assert dec_src is not None, "checkpoint has no decoder params"
            for k in params["decoders"]:
                params["decoders"][k] = merge(
                    params["decoders"][k], dec_src, ("decoders", k)
                )
        return variables

    def forward(self, variables, batch, rng=None, training=False):
        """batch: {pair: flat sub-batch}. Returns per-pair outputs."""
        outputs = {}
        running = variables["state"]
        for pair in self.lang_pairs:
            if pair not in batch:
                continue
            view = self.pair_view(pair)
            out, running = view.forward(
                {"params": variables["params"], "state": running},
                batch[pair], rng, training,
            )
            outputs[pair] = out
        return outputs, running


@register_model_architecture(
    "multilingual_conv_transformer", "multilingual_conv_transformer"
)
def base_multilingual_architecture(args):
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)
    args.share_encoders = getattr(args, "share_encoders", False)
    args.share_decoders = getattr(args, "share_decoders", False)
    args.share_decoder_embeddings = getattr(args, "share_decoder_embeddings", False)


@register_model_architecture(
    "multilingual_conv_transformer", "multilingual_conv_transformer_big"
)
def multilingual_big(args):
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)
    args.share_encoders = getattr(args, "share_encoders", False)
    args.share_decoders = getattr(args, "share_decoders", False)
    args.share_decoder_embeddings = getattr(args, "share_decoder_embeddings", False)


@register_model_architecture(
    "multilingual_conv_transformer", "multilingual_conv_transformer_big2"
)
def multilingual_big2(args):
    """Reference multilingual_conv_transformer.py:304-306 -> conv_transformer
    speechtransformer_big2 (512/2048/8)."""
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)
    args.share_encoders = getattr(args, "share_encoders", False)
    args.share_decoders = getattr(args, "share_decoders", False)
    args.share_decoder_embeddings = getattr(args, "share_decoder_embeddings", False)
