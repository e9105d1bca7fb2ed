"""transformer_from_pretrained_xlm: NMT warm-started from an XLM masked-LM
checkpoint.

Counterpart of fairseq/models/transformer_from_pretrained_xlm.py: both the
encoder and the decoder copy every parameter whose name/shape matches the
pretrained masked-LM encoder (embeddings, positions, self-attention and FFN
stacks); decoder cross-attention stays freshly initialized. Because this
framework's masked_lm model and transformer encoder/decoder share the same
layer parameter layout (ops/transformer_layer.py), the mapping is a direct
leaf merge rather than the reference's name-rewriting state-dict dance."""

from __future__ import annotations

import logging

import jax.numpy as jnp

from ..registry import register_model, register_model_architecture
from .transformer import TransformerModel, base_architecture

logger = logging.getLogger(__name__)


@register_model("transformer_from_pretrained_xlm")
class TransformerFromPretrainedXLMModel(TransformerModel):
    def __init__(self, *args, pretrained_xlm_checkpoint=None,
                 init_encoder=True, init_decoder=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.pretrained_xlm_checkpoint = pretrained_xlm_checkpoint
        self.init_encoder = init_encoder
        self.init_decoder = init_decoder

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        parser.add_argument("--pretrained-xlm-checkpoint", type=str,
                            metavar="STR",
                            help="XLM checkpoint to initialize from")
        parser.add_argument("--init-encoder-only", action="store_true")
        parser.add_argument("--init-decoder-only", action="store_true")

    @classmethod
    def build_model(cls, args, task):
        base_transformer_from_pretrained_xlm(args)
        assert getattr(args, "pretrained_xlm_checkpoint", None), (
            "--pretrained-xlm-checkpoint required"
        )
        assert not (
            getattr(args, "init_encoder_only", False)
            and getattr(args, "init_decoder_only", False)
        ), "Only one of --init-encoder-only and --init-decoder-only can be set"
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            pretrained_xlm_checkpoint=args.pretrained_xlm_checkpoint,
            init_encoder=not getattr(args, "init_decoder_only", False),
            init_decoder=not getattr(args, "init_encoder_only", False),
        )

    def init(self, key):
        variables = super().init(key)
        from ..train.checkpoint import load_checkpoint_to_cpu

        pre = load_checkpoint_to_cpu(self.pretrained_xlm_checkpoint)["model"]

        def merge(dst, src, path=()):
            if isinstance(dst, dict) and isinstance(src, dict):
                return {
                    k: merge(dst[k], src[k], path + (k,)) if k in src
                    else dst[k]
                    for k in dst
                }
            if isinstance(dst, list) and isinstance(src, list):
                return [
                    merge(d, s, path + (str(i),))
                    for i, (d, s) in enumerate(zip(dst, src))
                ] + list(dst[len(src):])
            if jnp.asarray(dst).shape == jnp.asarray(src).shape:
                return jnp.asarray(src)
            logger.info(
                "skipping XLM leaf with mismatched shape at %s",
                "/".join(path),
            )
            return dst

        params = variables["params"]
        for side, enabled in (
            ("encoder", self.init_encoder),
            ("decoder", self.init_decoder),
        ):
            if not enabled or side not in params:
                continue
            params[side] = merge(params[side], pre, (side,))
        return variables


@register_model_architecture(
    "transformer_from_pretrained_xlm", "transformer_from_pretrained_xlm"
)
def base_transformer_from_pretrained_xlm(args):
    base_architecture(args)
