"""transformer_align: jointly learning to align and translate (Garg et al.
2019).

Counterpart of fairseq/models/transformer_align.py:14-95. The alignment
attention comes from a second decoder pass truncated at --alignment-layer
(optionally full-context, i.e. non-causal) with need_attn — the reference
threads alignment_layer through one pass instead; re-running the prefix
keeps the decoder interface unchanged and XLA dedups the shared
computation. Deviation: the supervised attention averages ALL heads of the
alignment layer (the reference supervises only the first
--alignment-heads); with the default alignment_heads=1 on small models the
difference is the averaging width."""

from __future__ import annotations

from typing import Optional

from ..ops.core import RngStream
from ..registry import register_model, register_model_architecture
from .transformer import (
    TransformerModel,
    base_architecture,
    transformer_wmt_en_de_big,
)


@register_model("transformer_align")
class TransformerAlignModel(TransformerModel):
    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False,
                 alignment_heads=1, alignment_layer=4,
                 full_context_alignment=False):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.alignment_heads = alignment_heads
        self.alignment_layer = alignment_layer
        self.full_context_alignment = full_context_alignment

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        # reference transformer_align.py:28-37
        parser.add_argument("--alignment-heads", type=int, metavar="D",
                            help="number of cross-attention heads to "
                                 "supervise with alignments")
        parser.add_argument("--alignment-layer", type=int, metavar="D",
                            help="decoder layer whose attention is "
                                 "supervised (0 = bottom)")
        parser.add_argument("--full-context-alignment", action="store_true",
                            help="supervise alignment conditioned on the "
                                 "full target context")

    @classmethod
    def build_model(cls, args, task):
        transformer_align(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        return cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            alignment_heads=args.alignment_heads,
            alignment_layer=args.alignment_layer,
            full_context_alignment=args.full_context_alignment,
        )

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        (logits, extra), state = super().forward(
            variables, batch, rng, training
        )
        # alignment attention: decoder prefix up to alignment_layer,
        # need_attn on its last layer (reference :53-77)
        _, dec_params = self._split_params(variables["params"])
        sub = {
            **dec_params,
            "layers": list(dec_params["layers"])[: self.alignment_layer + 1],
        }
        sub.pop("final_ln", None)
        enc = extra["encoder_out"]
        _, align_extra = self.decoder(
            sub,
            batch["prev_output_tokens"],
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng, deterministic=True,
            features_only=True, need_attn=True,
            causal=not self.full_context_alignment,
        )
        extra["attn"] = align_extra["attn"]
        return (logits, extra), state


@register_model_architecture("transformer_align", "transformer_align")
def transformer_align(args):
    """Reference transformer_align.py:81-86."""
    args.alignment_heads = getattr(args, "alignment_heads", 1)
    args.alignment_layer = getattr(args, "alignment_layer", 4)
    args.full_context_alignment = getattr(
        args, "full_context_alignment", False
    )
    base_architecture(args)


@register_model_architecture(
    "transformer_align", "transformer_wmt_en_de_big_align"
)
def transformer_wmt_en_de_big_align(args):
    args.alignment_heads = getattr(args, "alignment_heads", 1)
    args.alignment_layer = getattr(args, "alignment_layer", 4)
    transformer_wmt_en_de_big(args)
