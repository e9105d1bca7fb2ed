"""Megatron-style model-parallel model-name aliases.

The reference implements tensor parallelism with special modules —
ColumnParallel/RowParallel linears from an external megatron submodule —
registered as distinct model names (fairseq/model_parallel/models/
transformer.py:40 ``model_parallel_transformer``, transformer_lm.py:28
``model_parallel_transformer_lm`` with ``transformer_lm_megatron``/``_11b``
presets at :71-91).

In this framework tensor parallelism is a MESH AXIS, not a model variant:
every registered model becomes TP-sharded by annotating its parameters with
TP_RULES over the 'model' axis (parallel/mesh.py) and letting GSPMD insert
the collectives — including the vocab-parallel cross-entropy
(parallel/vocab_parallel.py). These registered names therefore exist purely
so reference command lines (``--arch transformer_lm_megatron`` etc.) resolve
unmodified; the classes are the standard models and inherit mesh-axis
sharding like everything else.
"""

from __future__ import annotations

from ..registry import register_model, register_model_architecture
from .transformer import TransformerModel, base_architecture
from .transformer_lm import TransformerLanguageModel, base_lm_architecture


@register_model("model_parallel_transformer")
class ModelParallelTransformerModel(TransformerModel):
    """Alias of ``transformer``: TP comes from the mesh, not the model."""


@register_model_architecture(
    "model_parallel_transformer", "model_parallel_transformer"
)
def model_parallel_transformer_architecture(args):
    base_architecture(args)


@register_model("model_parallel_transformer_lm")
class ModelParallelTransformerLanguageModel(TransformerLanguageModel):
    """Alias of ``transformer_lm``: TP comes from the mesh, not the model."""


@register_model_architecture(
    "model_parallel_transformer_lm", "model_parallel_transformer_lm"
)
def model_parallel_lm_architecture(args):
    base_lm_architecture(args)


@register_model_architecture(
    "model_parallel_transformer_lm", "transformer_lm_megatron"
)
def transformer_lm_megatron(args):
    """Reference model_parallel/models/transformer_lm.py:71-80
    (8.3B: 3072/12288/72 layers/32 heads, gelu)."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 3072)
    args.decoder_ffn_embed_dim = getattr(
        args, "decoder_ffn_embed_dim", 3072 * 4
    )
    args.decoder_layers = getattr(args, "decoder_layers", 72)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 32)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    base_lm_architecture(args)


@register_model_architecture(
    "model_parallel_transformer_lm", "transformer_lm_megatron_11b"
)
def transformer_lm_megatron_11b(args):
    """Reference model_parallel/models/transformer_lm.py:83-91
    (11B: ffn 3072*6)."""
    args.decoder_embed_dim = getattr(args, "decoder_embed_dim", 3072)
    args.decoder_ffn_embed_dim = getattr(
        args, "decoder_ffn_embed_dim", 3072 * 6
    )
    args.decoder_layers = getattr(args, "decoder_layers", 72)
    args.decoder_attention_heads = getattr(args, "decoder_attention_heads", 32)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    base_lm_architecture(args)
