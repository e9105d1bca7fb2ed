"""Weight-only int8 quantization for inference/serving.

The reference's scalar quantization (fairseq/modules/quantization/scalar)
emulates int8 in fp32 for QAT — it never actually shrinks anything at
inference. This module targets the TPU serving path instead: linear-layer
weights are stored as int8 with a per-output-channel fp32 scale, and the
dequant (convert + scale) happens at the matmul use site
(`ops/core.weight_of`), where XLA fuses it into the matmul operand read.
The win is serving DENSITY: 4× smaller per-model weight memory
(conv_transformer_big 128 → 32 MB) at neutral decode latency — the FBK
decode step is per-op-overhead-bound, not weight-bandwidth-bound, so
halving weight traffic does not change RTF (full measurements incl. the
barrier that keeps it from regressing: PERF.md §6).

Applied post-training to any checkpoint (`--quantize-weights int8` on the
generate/infer CLIs); quantization error is the usual per-channel
round-to-nearest (max-abs calibration), which preserves beam decodes at
test scale (tests/test_weight_only_quant.py).

Only leaves following the `ops/core.linear` contract are touched: dicts of
exactly {"w"} or {"w","b"} with a 2-D weight of at least ``min_size``
elements. Embedding tables and adaptive input/softmax trees (whose weights
are gathered or transposed, not matmul'd through `linear`) are excluded by
path, conv kernels by rank, and small projections by size.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# Parameter sub-trees whose "w" leaves are NOT plain linear matmul weights.
SKIP_PATH_PATTERNS: Tuple[str, ...] = ("embed", "adaptive")

# Below this many elements the dequant bookkeeping outweighs the traffic
# saved (biases and tiny projections stay fp32).
MIN_SIZE = 4096


def _is_linear_leaf(tree, min_size: int) -> bool:
    if not isinstance(tree, dict) or set(tree) - {"w", "b"}:
        return False
    w = tree.get("w")
    return (
        w is not None
        and getattr(w, "ndim", 0) == 2
        and w.size >= min_size
    )


def quantize_weight(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-output-channel symmetric int8: scale_j = max_i |w_ij| / 127."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0, keepdims=True) / 127.0
    scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {"w_q": q, "w_scale": scale}


def quantize_linear_weights(params, min_size: int = MIN_SIZE):
    """Return a new param tree with eligible linear weights in int8.

    The returned tree is what the models consume directly — `linear`
    (ops/core.py) dispatches on the presence of ``w_q``.
    """
    stats = {"quantized": 0, "bytes_before": 0, "bytes_after": 0}

    def rec(tree, path: str):
        if _is_linear_leaf(tree, min_size) and not any(
            s in path for s in SKIP_PATH_PATTERNS
        ):
            out = quantize_weight(tree["w"])
            if "b" in tree:
                out["b"] = tree["b"]
            stats["quantized"] += 1
            stats["bytes_before"] += int(np.asarray(tree["w"]).nbytes)
            stats["bytes_after"] += (
                out["w_q"].nbytes + out["w_scale"].nbytes
            )
            return out
        if isinstance(tree, dict):
            return {k: rec(v, f"{path}/{k}") for k, v in tree.items()}
        if isinstance(tree, list):
            return [rec(v, path) for v in tree]
        return tree

    out = rec(params, "")
    return out, stats


def dequantize_linear_weights(params):
    """Inverse transform (fp32 weights), for inspection/round-trips."""

    def rec(tree):
        if isinstance(tree, dict):
            if "w_q" in tree:
                out = {
                    "w": np.asarray(tree["w_q"], np.float32)
                    * np.asarray(tree["w_scale"], np.float32)
                }
                if "b" in tree:
                    out["b"] = tree["b"]
                return out
            return {k: rec(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rec(v) for v in tree]
        return tree

    return rec(params)


def maybe_quantize_ensemble(models, args, logger=None):
    """Apply --quantize-weights to a loaded (model, variables) ensemble."""
    mode = getattr(args, "quantize_weights", None)
    if not mode or mode == "none":
        return models
    if mode != "int8":
        raise ValueError(f"unsupported --quantize-weights {mode!r}")
    out = []
    for model, variables in models:
        qparams, stats = quantize_linear_weights(variables["params"])
        if logger is not None:
            logger.info(
                "weight-only int8: %d linears, %.1f MB -> %.1f MB",
                stats["quantized"],
                stats["bytes_before"] / 1e6,
                stats["bytes_after"] / 1e6,
            )
        out.append((model, {**variables, "params": qparams}))
    return out
