"""Model quantization: scalar int8 emulation, iterative product
quantization, and quant-noise training (reference
fairseq/modules/quantization/{scalar,pq} + modules/quant_noise.py)."""

from .scalar import emulate_int, fake_quantize_params, quantize  # noqa: F401
from .pq import PQ, quantize_params_pq  # noqa: F401
from .quant_noise import quant_noise  # noqa: F401
from .weight_only import (  # noqa: F401
    dequantize_linear_weights,
    maybe_quantize_ensemble,
    quantize_linear_weights,
)
