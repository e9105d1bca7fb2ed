"""multilingual_transformer: per-language-pair transformers with optional
parameter sharing.

Counterpart of fairseq/models/multilingual_transformer.py:23-225
(FairseqMultiModel over per-pair TransformerModels): one transformer
encoder per source language and one decoder per target language,
--share-encoders / --share-decoders collapse them to a single stack, and
--share-encoder-embeddings / --share-decoder-embeddings share just the
embedding leaf across languages (functional substitution, like
--share-all-embeddings in the base transformer). Training runs every pair's
view inside one jitted step; ``pair_view(pair)`` exposes the standard Model
interface for the generators."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.core import RngStream
from ..registry import register_model, register_model_architecture
from .base import Model
from .transformer import (
    TransformerEncoder,
    TransformerEncoderConfig,
    base_architecture as transformer_base,
)
from .transformer_args import add_transformer_args
from .transformer_decoder import TransformerDecoder, TransformerDecoderConfig


class _PairView(Model):
    def __init__(self, parent: "MultilingualTransformerModel", pair: str):
        self.parent = parent
        self.pair = pair
        self.encoder_key = parent.encoder_key(pair)
        self.decoder_key = parent.decoder_key(pair)
        self.encoder = parent.encoders[self.encoder_key]
        self.decoder = parent.decoders[self.decoder_key]
        self.max_source_positions = parent.max_source_positions
        self.max_target_positions = parent.max_target_positions

    def _params(self, variables):
        p = variables["params"]
        enc = dict(p["encoders"][self.encoder_key])
        dec = dict(p["decoders"][self.decoder_key])
        if "shared_encoder_embed" in p:
            enc["embed_tokens"] = p["shared_encoder_embed"]
        if "shared_decoder_embed" in p:
            dec["embed_tokens"] = p["shared_decoder_embed"]
        return enc, dec

    def encode(self, variables, src_tokens, src_lengths, rng=None,
               training=False):
        enc, _ = self._params(variables)
        return (
            self.encoder(
                enc, src_tokens, src_lengths,
                rng=rng, deterministic=not training,
            ),
            {},
        )

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        enc_p, dec_p = self._params(variables)
        enc = self.encoder(
            enc_p, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        logits, extra = self.decoder(
            dec_p,
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng, deterministic=not training,
        )
        extra["encoder_out"] = enc
        return (logits, extra), {}

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        _, dec_p = self._params(variables)
        return self.decoder.init_cache(
            dec_p, batch, max_len, encoder_out.encoder_out, dtype
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        _, dec_p = self._params(variables)
        return self.decoder.step(
            dec_p, tokens, cache, step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
        )


@register_model("multilingual_transformer")
class MultilingualTransformerModel(Model):
    def __init__(self, lang_pairs: List[str],
                 encoder_cfgs: Dict[str, TransformerEncoderConfig],
                 decoder_cfgs: Dict[str, TransformerDecoderConfig],
                 share_encoders: bool, share_decoders: bool,
                 share_encoder_embeddings: bool,
                 share_decoder_embeddings: bool):
        self.lang_pairs = lang_pairs
        self.share_encoders = share_encoders
        self.share_decoders = share_decoders
        self.share_encoder_embeddings = share_encoder_embeddings
        self.share_decoder_embeddings = share_decoder_embeddings
        self.encoders = {
            k: TransformerEncoder(cfg) for k, cfg in encoder_cfgs.items()
        }
        self.decoders = {
            k: TransformerDecoder(cfg) for k, cfg in decoder_cfgs.items()
        }
        self.encoder_cfgs = encoder_cfgs
        self.decoder_cfgs = decoder_cfgs
        any_enc = next(iter(encoder_cfgs.values()))
        any_dec = next(iter(decoder_cfgs.values()))
        self.max_source_positions = any_enc.max_positions
        self.max_target_positions = any_dec.max_positions

    def encoder_key(self, pair: str) -> str:
        return "shared" if self.share_encoders else pair.split("-")[0]

    def decoder_key(self, pair: str) -> str:
        return "shared" if self.share_decoders else pair.split("-")[1]

    def pair_view(self, pair: str) -> _PairView:
        return _PairView(self, pair)

    @staticmethod
    def add_args(parser):
        add_transformer_args(parser)
        # reference multilingual_transformer.py:47-55
        parser.add_argument("--share-encoder-embeddings", action="store_true",
                            help="share encoder embeddings across languages")
        parser.add_argument("--share-decoder-embeddings", action="store_true",
                            help="share decoder embeddings across languages")
        parser.add_argument("--share-encoders", action="store_true",
                            help="share encoders across languages")
        parser.add_argument("--share-decoders", action="store_true",
                            help="share decoders across languages")

    @classmethod
    def build_model(cls, args, task):
        base_multilingual_architecture(args)
        lang_pairs = (
            args.lang_pairs if isinstance(args.lang_pairs, list)
            else args.lang_pairs.split(",")
        )
        share_encoders = getattr(args, "share_encoders", False)
        share_decoders = getattr(args, "share_decoders", False)
        share_enc_emb = (
            getattr(args, "share_encoder_embeddings", False) or share_encoders
        )
        share_dec_emb = (
            getattr(args, "share_decoder_embeddings", False) or share_decoders
        )

        def enc_cfg(lang):
            d = task.dicts[lang]
            return TransformerEncoderConfig(
                vocab_size=len(d),
                embed_dim=args.encoder_embed_dim,
                ffn_dim=args.encoder_ffn_embed_dim,
                layers=args.encoder_layers,
                heads=args.encoder_attention_heads,
                dropout=args.dropout,
                attention_dropout=args.attention_dropout,
                activation_dropout=getattr(args, "relu_dropout", 0.0),
                normalize_before=args.encoder_normalize_before,
                learned_pos=args.encoder_learned_pos,
                max_positions=getattr(args, "max_source_positions", 1024),
                padding_idx=d.pad(),
            )

        def dec_cfg(lang):
            d = task.dicts[lang]
            return TransformerDecoderConfig(
                vocab_size=len(d),
                embed_dim=args.decoder_embed_dim,
                ffn_dim=args.decoder_ffn_embed_dim,
                layers=args.decoder_layers,
                heads=args.decoder_attention_heads,
                dropout=args.dropout,
                attention_dropout=args.attention_dropout,
                activation_dropout=getattr(args, "relu_dropout", 0.0),
                normalize_before=args.decoder_normalize_before,
                learned_pos=args.decoder_learned_pos,
                max_positions=getattr(args, "max_target_positions", 1024),
                padding_idx=d.pad(),
                share_input_output_embed=getattr(
                    args, "share_decoder_input_output_embed", False
                ),
            )

        src_langs = sorted({p.split("-")[0] for p in lang_pairs})
        tgt_langs = sorted({p.split("-")[1] for p in lang_pairs})
        if share_enc_emb:
            # shared embedding requires one joined vocabulary size
            sizes = {len(task.dicts[lang]) for lang in src_langs}
            assert len(sizes) == 1, (
                "--share-encoder-embeddings requires identical vocabularies"
            )
        if share_dec_emb:
            sizes = {len(task.dicts[lang]) for lang in tgt_langs}
            assert len(sizes) == 1, (
                "--share-decoder-embeddings requires identical vocabularies"
            )
        encoder_cfgs = (
            {"shared": enc_cfg(src_langs[0])}
            if share_encoders
            else {lang: enc_cfg(lang) for lang in src_langs}
        )
        decoder_cfgs = (
            {"shared": dec_cfg(tgt_langs[0])}
            if share_decoders
            else {lang: dec_cfg(lang) for lang in tgt_langs}
        )
        return cls(
            lang_pairs, encoder_cfgs, decoder_cfgs,
            share_encoders, share_decoders, share_enc_emb, share_dec_emb,
        )

    def init(self, key):
        params: Dict[str, object] = {"encoders": {}, "decoders": {}}
        for i, (k, enc) in enumerate(sorted(self.encoders.items())):
            params["encoders"][k] = enc.init(
                jax.random.fold_in(key, i),
                init_embed=not self.share_encoder_embeddings,
            )
        for i, (k, dec) in enumerate(sorted(self.decoders.items())):
            p = dec.init(jax.random.fold_in(key, 100 + i))
            if self.share_decoder_embeddings:
                shared = p.pop("embed_tokens")
                params.setdefault("shared_decoder_embed", shared)
            params["decoders"][k] = p
        if self.share_encoder_embeddings:
            from ..ops.core import init_embedding

            cfg = next(iter(self.encoder_cfgs.values()))
            params["shared_encoder_embed"] = init_embedding(
                jax.random.fold_in(key, 999), cfg.vocab_size, cfg.embed_dim,
                cfg.padding_idx,
            )
        return {"params": params, "state": {}}

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        """batch: {pair: flat sub-batch} -> per-pair outputs."""
        outputs = {}
        for pair in self.lang_pairs:
            if pair not in batch:
                continue
            (logits, extra), _ = self.pair_view(pair).forward(
                variables, batch[pair], rng, training
            )
            outputs[pair] = (logits, extra)
        return outputs, {}


@register_model_architecture(
    "multilingual_transformer", "multilingual_transformer"
)
def base_multilingual_architecture(args):
    """Reference multilingual_transformer.py:203-210."""
    transformer_base(args)
    args.share_encoder_embeddings = getattr(
        args, "share_encoder_embeddings", False
    )
    args.share_decoder_embeddings = getattr(
        args, "share_decoder_embeddings", False
    )
    args.share_encoders = getattr(args, "share_encoders", False)
    args.share_decoders = getattr(args, "share_decoders", False)


@register_model_architecture(
    "multilingual_transformer", "multilingual_transformer_iwslt_de_en"
)
def multilingual_transformer_iwslt_de_en(args):
    """Reference multilingual_transformer.py:213-225."""
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 512)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 1024)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 4)
    args.encoder_layers = getattr(args, "encoder_layers", 6)
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 512)
    args.decoder_ffn_embed_dim = getattr(args, "decoder_ffn_embed_dim", 1024)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 4)
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    base_multilingual_architecture(args)
