"""Multi-decoder ST models: dual-decoder (DirMul), triangle, 2-stage.

Counterparts of examples/speech_recognition/models/{multi_task.py,
conv_transformer_dualdecoder.py, conv_transformer_triangle.py,
conv_transformer_2stage.py} — one shared ConvTransformer encoder, a target
decoder and an auxiliary (transcript) decoder:

  * dualdecoder (Weiss 2017 / Sperber "DirMul"): both decoders attend to the
    encoder independently;
  * triangle (Sperber / IWSLT-2021 captions+subtitles): the aux decoder runs
    first (features_only); each target-decoder layer adds a second
    cross-attention over the aux states, fused by fc_concat;
  * 2stage (Sperber): the target decoder attends ONLY to the aux decoder's
    output states (re-packed as a synthetic encoder output).

``forward`` returns ((decoder_out), (aux_logits, aux_extra)) for
cross_entropy_dualdecoder; ``forward_decoder``/aux hooks serve the
TwoPhaseSequenceGenerator.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.core import RngStream
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model
from .conv_transformer import (
    ConvTransformerEncoder,
    _base_defaults,
    configs_from_args,
)
from .transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
    TriangleTransformerDecoder,
)


class MultiTaskModel(Model):
    """encoder + target decoder + auxiliary decoder (reference
    models/multi_task.py:7-22)."""

    aux_attends_encoder = True  # dualdecoder/triangle: aux decoder sees encoder

    def __init__(self, encoder_cfg, decoder_cfg: TransformerDecoderConfig,
                 aux_decoder_cfg: TransformerDecoderConfig):
        self.encoder_cfg = encoder_cfg
        self.decoder_cfg = decoder_cfg
        self.aux_decoder_cfg = aux_decoder_cfg
        self.encoder = ConvTransformerEncoder(encoder_cfg)
        self.decoder = self.build_target_decoder(decoder_cfg)
        self.auxiliary_decoder = TransformerDecoder(aux_decoder_cfg)
        self.max_source_positions = encoder_cfg.max_positions
        self.max_target_positions = decoder_cfg.max_positions

    def build_target_decoder(self, cfg):
        return TransformerDecoder(cfg)

    @staticmethod
    def add_args(parser):
        from .conv_transformer import ConvolutionalTransformerModel

        ConvolutionalTransformerModel.add_args(parser)
        parser.add_argument(
            "--auxiliary-decoder-embed-path", type=str, metavar="STR",
            help="path to pre-trained decoder embedding",
        )

    @classmethod
    def build_model(cls, args, task):
        from .conv_transformer import base_architecture

        base_architecture(args)
        assert task.source_dictionary is not None, (
            f"{cls.__name__} requires a task providing transcripts "
            "(speech_translation_with_transcription)"
        )
        encoder_cfg, decoder_cfg = configs_from_args(args, task)
        aux_decoder_cfg = decoder_cfg._replace(
            vocab_size=len(task.source_dictionary),
            padding_idx=task.source_dictionary.pad(),
        )
        return cls(encoder_cfg, decoder_cfg, aux_decoder_cfg)

    def init(self, key):
        ek, dk, ak = jax.random.split(key, 3)
        enc_params, enc_state = self.encoder.init(ek)
        return {
            "params": {
                "encoder": enc_params,
                "decoder": self.decoder.init(dk),
                "auxiliary_decoder": self.auxiliary_decoder.init(ak),
            },
            "state": {"encoder": enc_state},
        }

    def encode(self, variables, src_tokens, src_lengths, rng=None, training=False):
        return self.encoder(
            variables["params"]["encoder"],
            variables["state"]["encoder"],
            src_tokens,
            src_lengths,
            rng=rng,
            deterministic=not training,
            training=training,
        )

    # -- training forward -----------------------------------------------------

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        encoder_out, enc_state = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        aux_prev = batch["transcript_prev_output_tokens"]
        decoder_out, aux_out = self._forward_decoders(
            variables, batch["prev_output_tokens"], aux_prev, encoder_out,
            rng, training,
        )
        decoder_out[1]["encoder_out"] = encoder_out
        return (decoder_out, aux_out), {"encoder": enc_state}

    def _forward_decoders(self, variables, prev, aux_prev, encoder_out, rng, training):
        """dualdecoder wiring: both decoders over the encoder
        (conv_transformer_dualdecoder.py:74-81)."""
        decoder_out = self.decoder(
            variables["params"]["decoder"],
            prev,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        aux_out = self.auxiliary_decoder(
            variables["params"]["auxiliary_decoder"],
            aux_prev,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        return decoder_out, aux_out

    def get_auxiliary_target(self, batch, auxiliary_output):
        return batch["transcript_target"]

    def get_auxiliary_token_lens(self, batch):
        return batch["transcript_target_lengths"]

    # -- two-phase incremental decoding ---------------------------------------

    def init_aux_cache(self, variables, batch, max_len, encoder_out, dtype=jnp.float32):
        enc = encoder_out.encoder_out if self.aux_attends_encoder else None
        return self.auxiliary_decoder.init_cache(
            variables["params"]["auxiliary_decoder"], batch, max_len, enc, dtype
        )

    def decode_aux_step(self, variables, tokens, cache, step, encoder_out):
        return self.auxiliary_decoder.step(
            variables["params"]["auxiliary_decoder"],
            tokens,
            cache,
            step,
            encoder_padding_mask=encoder_out.encoder_padding_mask
            if self.aux_attends_encoder
            else None,
        )

    def aux_features(self, variables, aux_tokens, encoder_out):
        """Full-sequence aux-decoder features for a fixed transcript
        hypothesis (phase 2 preparation)."""
        feats, _ = self.auxiliary_decoder(
            variables["params"]["auxiliary_decoder"],
            aux_tokens,
            encoder_out=encoder_out.encoder_out if self.aux_attends_encoder else None,
            encoder_padding_mask=encoder_out.encoder_padding_mask
            if self.aux_attends_encoder
            else None,
            features_only=True,
        )
        return feats

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32, aux_out=None, aux_padding_mask=None):
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len,
            encoder_out.encoder_out, dtype,
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out,
                    aux_padding_mask=None):
        return self.decoder.step(
            variables["params"]["decoder"],
            tokens,
            cache,
            step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
        )


@register_model("conv_transformer_dualdecoder")
class ConvolutionalTransformerDualDecoder(MultiTaskModel):
    pass


@register_model("conv_transformer_triangle")
class ConvolutionalTransformerTriangle(MultiTaskModel):
    """Triangle: target decoder layers cross-attend the aux decoder states
    (conv_transformer_triangle.py:79-105)."""

    def build_target_decoder(self, cfg):
        return TriangleTransformerDecoder(cfg)

    def _forward_decoders(self, variables, prev, aux_prev, encoder_out, rng, training):
        aux_feats, aux_extra = self.auxiliary_decoder(
            variables["params"]["auxiliary_decoder"],
            aux_prev,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
            features_only=True,
        )
        aux_padding_mask = aux_prev == self.aux_decoder_cfg.padding_idx
        decoder_out = self.decoder(
            variables["params"]["decoder"],
            prev,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            aux_decoder_out=aux_feats,
            aux_decoder_padding_mask=aux_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        aux_logits = self.auxiliary_decoder.output_layer(
            variables["params"]["auxiliary_decoder"], aux_feats
        )
        return decoder_out, (aux_logits, aux_extra)

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32, aux_out=None, aux_padding_mask=None):
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len,
            encoder_out.encoder_out, dtype, aux_out=aux_out,
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out,
                    aux_padding_mask=None):
        return self.decoder.step(
            variables["params"]["decoder"],
            tokens,
            cache,
            step,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            aux_decoder_padding_mask=aux_padding_mask,
        )


@register_model("conv_transformer_2stage")
class ConvolutionalTransformer2Stage(MultiTaskModel):
    """2Stage: target decoder attends ONLY to aux decoder states
    (conv_transformer_2stage.py:75-92)."""

    def _forward_decoders(self, variables, prev, aux_prev, encoder_out, rng, training):
        aux_feats, aux_extra = self.auxiliary_decoder(
            variables["params"]["auxiliary_decoder"],
            aux_prev,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
            features_only=True,
        )
        aux_padding_mask = aux_prev == self.aux_decoder_cfg.padding_idx
        decoder_out = self.decoder(
            variables["params"]["decoder"],
            prev,
            encoder_out=aux_feats,
            encoder_padding_mask=aux_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        aux_logits = self.auxiliary_decoder.output_layer(
            variables["params"]["auxiliary_decoder"], aux_feats
        )
        return decoder_out, (aux_logits, aux_extra)

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32, aux_out=None, aux_padding_mask=None):
        # the synthetic "encoder" is the aux decoder's states
        return self.decoder.init_cache(
            variables["params"]["decoder"], batch, max_len, aux_out, dtype
        )

    def decode_step(self, variables, tokens, cache, step, encoder_out,
                    aux_padding_mask=None):
        return self.decoder.step(
            variables["params"]["decoder"],
            tokens,
            cache,
            step,
            encoder_padding_mask=aux_padding_mask,
        )


def _multitask_archs(model_name, base_fn_name_prefix):
    pass  # presets registered explicitly below


@register_model_architecture("conv_transformer_dualdecoder", "conv_transformer_dualdecoder")
def dualdecoder_base(args):
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_dualdecoder", "conv_transformer_dualdecoder_big")
def dualdecoder_big(args):
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_dualdecoder", "conv_transformer_dualdecoder_big2")
def dualdecoder_big2(args):
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_triangle", "conv_transformer_triangle")
def triangle_base(args):
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_triangle", "conv_transformer_triangle_big")
def triangle_big(args):
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_triangle", "conv_transformer_triangle_big2")
def triangle_big2(args):
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_2stage", "conv_transformer_2stage")
def twostage_base(args):
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_2stage", "conv_transformer_2stage_big")
def twostage_big(args):
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)


@register_model_architecture("conv_transformer_2stage", "conv_transformer_2stage_big2")
def twostage_big2(args):
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)
    args.auxiliary_decoder_embed_path = getattr(args, "auxiliary_decoder_embed_path", None)