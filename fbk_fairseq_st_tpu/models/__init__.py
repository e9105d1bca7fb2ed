"""Model registry package. Models/architectures are registered on import."""

from .base import EncoderOut, Model, reorder_encoder_out  # noqa: F401
from .transformer_decoder import (  # noqa: F401
    TransformerDecoder,
    TransformerDecoderConfig,
    TriangleTransformerDecoder,
)
from . import (  # noqa: F401
    bart,
    conv_transformer,
    conv_transformer_context,
    fconv,
    fconv_self_att,
    lightconv,
    lm_variants,
    lstm,
    masked_lm,
    multi_task,
    roberta,
    multilingual_conv_transformer,
    multilingual_transformer,
    multitask_conv_transformer,
    model_parallel,
    nat,
    gru_transformer,
    transformer,
    huggingface_gpt2,
    transformer_align,
    transformer_monotonic,
    w2l_conv_glu,
    transformer_from_pretrained_xlm,
    transformer_lm,
    wav2vec,
    vggtransformer,
)
