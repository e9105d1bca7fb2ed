"""BART: denoising sequence-to-sequence pretraining (Lewis et al. 2019).

Counterpart of fairseq/models/bart/model.py:29-322: the standard
transformer with learned positions, tied embeddings and embedding
layer-norm, plus RoBERTa-style classification heads pooled from the final
decoder state at the last EOS position (:75-93). The bart_base/bart_large/
mbart_* presets are preserved."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, dropout, get_activation, init_linear, linear
from ..registry import register_model, register_model_architecture
from .base import Model
from .roberta import HeadConfig
from .transformer import TransformerModel, base_architecture as transformer_base


@register_model("bart")
class BARTModel(TransformerModel):
    def __init__(self, encoder_cfg, decoder_cfg, share_all_embeddings=False,
                 eos=2, pooler_activation="tanh", pooler_dropout=0.0):
        super().__init__(encoder_cfg, decoder_cfg, share_all_embeddings)
        self.eos = eos
        self.pooler_activation = pooler_activation
        self.pooler_dropout = pooler_dropout
        self.classification_heads: Dict[str, HeadConfig] = {}

    @property
    def supported_targets(self):
        return {"self"}  # reference bart/model.py:62-64

    @staticmethod
    def add_args(parser):
        TransformerModel.add_args(parser)
        # reference bart/model.py:50-60
        parser.add_argument("--pooler-dropout", type=float, metavar="D")
        parser.add_argument("--pooler-activation-fn", type=str)

    @classmethod
    def build_model(cls, args, task):
        bart_large_architecture(args)
        base = TransformerModel.build_model.__func__(
            TransformerModel, args, task
        )
        model = cls(
            base.encoder_cfg, base.decoder_cfg, base.share_all_embeddings,
            eos=task.target_dictionary.eos(),
            pooler_activation=getattr(args, "pooler_activation_fn", "tanh"),
            pooler_dropout=getattr(args, "pooler_dropout", 0.0),
        )
        if getattr(args, "criterion", None) == "sentence_prediction":
            model.register_classification_head(
                getattr(args, "classification_head_name",
                        "sentence_classification_head"),
                num_classes=args.num_classes,
            )
        return model

    def register_classification_head(self, name, num_classes=None,
                                     inner_dim=None, **kwargs):
        self.classification_heads[name] = HeadConfig(
            num_classes=num_classes,
            inner_dim=inner_dim or self.decoder_cfg.embed_dim,
        )

    def init(self, key):
        variables = super().init(key)
        if self.classification_heads:
            heads = {}
            for i, name in enumerate(sorted(self.classification_heads)):
                head = self.classification_heads[name]
                k1, k2 = jax.random.split(
                    jax.random.fold_in(jax.random.fold_in(key, 555), i)
                )
                heads[name] = {
                    "dense": init_linear(
                        k1, self.decoder_cfg.embed_dim, head.inner_dim
                    ),
                    "out_proj": init_linear(
                        k2, head.inner_dim, head.num_classes
                    ),
                }
            variables["params"]["classification_heads"] = heads
        return variables

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False, features_only=False,
                classification_head_name=None):
        if classification_head_name is not None:
            features_only = True
        enc_params, dec_params = self._split_params(variables["params"])
        rng = rng or RngStream(None)
        enc = self.encoder(
            enc_params, batch["src_tokens"], batch["src_lengths"],
            rng=rng, deterministic=not training,
        )
        prev = batch.get("prev_output_tokens")
        if prev is None:
            # classification fine-tuning feeds the source on both sides
            # (reference BARTHubInterface / sentence_prediction usage)
            prev = batch["src_tokens"]
        x, extra = self.decoder(
            dec_params, prev,
            encoder_out=enc.encoder_out,
            encoder_padding_mask=enc.encoder_padding_mask,
            rng=rng, deterministic=not training,
            features_only=features_only,
        )
        extra["encoder_out"] = enc
        if classification_head_name is not None:
            # final decoder state at the LAST eos of each row (:75-87)
            is_eos = prev == self.eos
            pos = jnp.arange(prev.shape[1])[None, :]
            last_eos = jnp.argmax(
                jnp.where(is_eos, pos, -1), axis=1
            )
            rep = jnp.take_along_axis(
                x, last_eos[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            hp = variables["params"]["classification_heads"][
                classification_head_name
            ]
            rep = dropout(rep, self.pooler_dropout, rng, not training)
            rep = get_activation(self.pooler_activation)(
                linear(hp["dense"], rep)
            )
            rep = dropout(rep, self.pooler_dropout, rng, not training)
            x = linear(hp["out_proj"], rep)
        return (x, extra), {}


@register_model_architecture("bart", "bart_large")
def bart_large_architecture(args):
    """Reference bart/model.py:259-294."""
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1024)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 4096)
    args.encoder_layers = getattr(args, "encoder_layers", 12)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    args.encoder_normalize_before = getattr(
        args, "encoder_normalize_before", False
    )
    args.encoder_learned_pos = getattr(args, "encoder_learned_pos", True)
    args.decoder_embed_dim = getattr(
        args, "decoder_embed_dim", args.encoder_embed_dim
    )
    args.decoder_ffn_embed_dim = getattr(
        args, "decoder_ffn_embed_dim", args.encoder_ffn_embed_dim
    )
    args.decoder_layers = getattr(args, "decoder_layers", 12)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 16)
    args.decoder_normalize_before = getattr(
        args, "decoder_normalize_before", False
    )
    args.decoder_learned_pos = getattr(args, "decoder_learned_pos", True)
    args.attention_dropout = getattr(args, "attention_dropout", 0.0)
    args.relu_dropout = getattr(args, "relu_dropout", 0.0)
    args.dropout = getattr(args, "dropout", 0.1)
    args.max_target_positions = getattr(args, "max_target_positions", 1024)
    args.max_source_positions = getattr(args, "max_source_positions", 1024)
    args.share_decoder_input_output_embed = getattr(
        args, "share_decoder_input_output_embed", True
    )
    args.share_all_embeddings = getattr(args, "share_all_embeddings", True)
    args.no_scale_embedding = getattr(args, "no_scale_embedding", True)
    args.layernorm_embedding = getattr(args, "layernorm_embedding", True)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    args.pooler_activation_fn = getattr(args, "pooler_activation_fn", "tanh")
    args.pooler_dropout = getattr(args, "pooler_dropout", 0.0)
    transformer_base(args)


@register_model_architecture("bart", "bart_base")
def bart_base_architecture(args):
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 768)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 3072)
    args.encoder_layers = getattr(args, "encoder_layers", 6)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 12)
    args.decoder_layers = getattr(args, "decoder_layers", 6)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 12)
    bart_large_architecture(args)


@register_model_architecture("bart", "mbart_large")
def mbart_large_architecture(args):
    args.no_scale_embedding = getattr(args, "no_scale_embedding", False)
    bart_large_architecture(args)


@register_model_architecture("bart", "mbart_base")
def mbart_base_architecture(args):
    args.no_scale_embedding = getattr(args, "no_scale_embedding", False)
    bart_base_architecture(args)


@register_model_architecture("bart", "mbart_base_wmt20")
def mbart_base_wmt20_architecture(args):
    args.layernorm_embedding = getattr(args, "layernorm_embedding", False)
    mbart_base_architecture(args)
