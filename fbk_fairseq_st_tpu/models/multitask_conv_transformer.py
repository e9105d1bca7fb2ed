"""multitask_conv_transformer — ST + utterance-level classification
(COLING 2020 speaker-gender tagging).

Counterpart of examples/speech_recognition/models/
multitask_conv_transformer.py:10-49 + models/multi_task.py ClassifierDecoder:
conv_transformer plus a 2-layer FFN classifier head mean-pooled over encoder
time; output_size==1 uses sigmoid, otherwise softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, init_linear, linear
from ..registry import register_model, register_model_architecture
from .base import Model
from .conv_transformer import (
    ConvolutionalTransformerModel,
    _base_defaults,
    configs_from_args,
)


class FFNDecoderClassifier:
    """reference multitask_conv_transformer.py:26-36."""

    def __init__(self, input_size: int, output_size: int):
        self.input_size = input_size
        self.output_size = output_size

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "fc1": init_linear(k1, self.input_size, self.input_size),
            "fc2": init_linear(k2, self.input_size, self.output_size),
        }

    def __call__(self, params, encoder_out):
        """encoder_out: EncoderOut -> (B, output_size), mean over valid T."""
        x = encoder_out.encoder_out
        h = linear(params["fc2"], jax.nn.relu(linear(params["fc1"], x)))
        # the reference means over the full padded time axis (:36); padded
        # positions carry (mostly) zero activations post-encoder, but we
        # reproduce the plain mean for output parity
        return jnp.mean(h, axis=1)

    def get_normalized_probs(self, net_output, log_probs: bool = False):
        logits = net_output[0] if isinstance(net_output, tuple) else net_output
        logits = logits.astype(jnp.float32)
        if self.output_size == 1:
            return (
                jax.nn.log_sigmoid(logits) if log_probs else jax.nn.sigmoid(logits)
            )
        return (
            jax.nn.log_softmax(logits, axis=-1)
            if log_probs
            else jax.nn.softmax(logits, axis=-1)
        )


@register_model("multitask_conv_transformer")
class MultitaskConvolutionalTransformer(ConvolutionalTransformerModel):
    def __init__(self, encoder_cfg, decoder_cfg, additional_output_size: int):
        super().__init__(encoder_cfg, decoder_cfg)
        self.auxiliary_decoder = FFNDecoderClassifier(
            encoder_cfg.embed_dim, additional_output_size
        )

    @staticmethod
    def add_args(parser):
        ConvolutionalTransformerModel.add_args(parser)
        parser.add_argument(
            "--additional-output-size", type=int, default=1,
            help="number of outputs for the additional decoder",
        )

    @classmethod
    def build_model(cls, args, task):
        from .conv_transformer import base_architecture

        base_architecture(args)
        encoder_cfg, decoder_cfg = configs_from_args(args, task)
        return cls(
            encoder_cfg, decoder_cfg,
            getattr(args, "additional_output_size", 1),
        )

    def init(self, key):
        variables = super().init(key)
        variables["params"]["auxiliary_decoder"] = self.auxiliary_decoder.init(
            jax.random.fold_in(key, 1234)
        )
        return variables

    def forward(self, variables, batch, rng: Optional[RngStream] = None, training=False):
        encoder_out, enc_state = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng, training
        )
        logits, extra = self.decoder(
            variables["params"]["decoder"],
            batch["prev_output_tokens"],
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=not training,
        )
        extra["encoder_out"] = encoder_out
        aux_logits = self.auxiliary_decoder(
            variables["params"]["auxiliary_decoder"], encoder_out
        )
        return ((logits, extra), aux_logits), {"encoder": enc_state}

    def classify(self, variables, src_tokens, src_lengths):
        """Classifier-head probabilities (generate_multitask_classifier)."""
        encoder_out, _ = self.encode(variables, src_tokens, src_lengths)
        aux_logits = self.auxiliary_decoder(
            variables["params"]["auxiliary_decoder"], encoder_out
        )
        return self.auxiliary_decoder.get_normalized_probs(aux_logits)

    def get_auxiliary_target(self, batch, auxiliary_output):
        return batch["auxiliary_target"]


@register_model_architecture("multitask_conv_transformer", "multitask_conv_transformer")
def multitask_base(args):
    _base_defaults(args, enc_dim=256, ffn_dim=768, heads=4)


@register_model_architecture(
    "multitask_conv_transformer", "multitask_conv_transformer_big"
)
def multitask_big(args):
    _base_defaults(args, enc_dim=512, ffn_dim=1024, heads=8)


@register_model_architecture(
    "multitask_conv_transformer", "multitask_conv_transformer_big2"
)
def multitask_big2(args):
    _base_defaults(args, enc_dim=512, ffn_dim=2048, heads=8)
