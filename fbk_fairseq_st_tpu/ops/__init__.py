from .core import (  # noqa: F401
    ACTIVATIONS,
    NEG_INF,
    RngStream,
    batch_norm,
    dropout,
    embedding,
    get_activation,
    init_batch_norm,
    init_batch_norm_state,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    lengths_to_padding_mask,
    linear,
    normal_init,
    xavier_uniform,
)
from .attention import (  # noqa: F401
    MHAConfig,
    causal_mask,
    init_cache,
    init_mha,
    mha,
    precompute_cross_cache,
)
from .transformer_layer import (  # noqa: F401
    TransformerLayerConfig,
    decoder_layer,
    encoder_layer,
    init_decoder_layer,
    init_decoder_layer_cache,
    init_encoder_layer,
)
from .positional import PositionalEmbedding, make_positions, sinusoidal_table  # noqa: F401
from .conv_frontend import (  # noqa: F401
    ConvFrontendConfig,
    conv_attention_2d,
    conv_frontend,
    init_conv_attention_2d,
    init_conv_frontend,
)
from .ctc import ctc_compress, ctc_greedy_decode, ctc_loss, ctc_segments  # noqa: F401
