"""In-training iterative product quantization (--quantization-config-path).

Counterpart of fairseq/quantization_utils.py:22-142 + the PQ module swaps of
fairseq/modules/quantization/pq: training runs in stages; at each stage
boundary the next group of layers (a regex over param paths from the config's
``layers_to_quantize``) is product-quantized — their weights are replaced in
the param tree by ``w_codes`` (frozen block->centroid assignments, float32
holding exact ints so the tree stays uniformly differentiable) plus
``w_centroids`` (trainable). The use sites reconstruct the weight in-graph
(ops/core.py weight_of / embedding_table), so gradients aggregate per
centroid through the gather — the same "finetune centroids under fixed
assignments" semantics the reference gets from its PQLinear/PQEmbedding
modules — and the trainer reinitializes its optimizer state over the new
tree (reference trainer.reinitialize, quantization_utils.py:101).

Config schema = the reference YAML
(tests/transformer_quantization_config.yaml): ``n_centroids`` /
``block_sizes`` keyed per layer kind with (key, value-dict) selectors, and
``layers_to_quantize`` as an ordered list of layer-group regexes, one group
per training stage.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, List, Optional

import numpy as np

from .pq import PQ

logger = logging.getLogger(__name__)

_DEFAULT_CONFIG = {
    "n_centroids": {
        "Linear": ("in_features", {"*": 256}),
        "Embedding": ("embedding_dim", {"*": 256}),
    },
    "block_sizes": {
        "Linear": ("fuzzy_name", {"fc": 8, "attn": 4, "emb": 4}),
        "Embedding": ("fuzzy_name", {"emb": 8}),
    },
    "layers_to_quantize": [
        r"decoder\.layers\.\d+\.fc[12]",
        r"decoder\.embed_tokens",
        r"decoder\.layers\.\d+\.self_attn\.(k|v|q|out)",
    ],
}


def parse_config_yaml(data: Optional[dict]) -> dict:
    """Reference quantization_options.parse_config_yaml: fall back to the
    defaults per missing section; {key, value} dicts become (key, value)."""
    data = data or {}
    config = {k: v for k, v in _DEFAULT_CONFIG.items()}
    for section in ("n_centroids", "block_sizes"):
        if section in data:
            config[section] = {
                kind: (spec["key"], spec["value"])
                for kind, spec in data[section].items()
            }
    if "layers_to_quantize" in data:
        # the reference's shipped configs escape dots as '\\.' (YAML plain
        # scalars keep backslashes literal) — normalize so both that
        # convention and plain '\.'-style regexes work
        config["layers_to_quantize"] = [
            r.replace("\\\\", "\\") for r in data["layers_to_quantize"]
        ]
    return config


def load_config(path: Optional[str]) -> dict:
    if not path:
        return parse_config_yaml({})
    import yaml

    with open(path) as f:
        return parse_config_yaml(yaml.safe_load(f))


def _layer_kind(path: str) -> str:
    return "Embedding" if "embed" in path.split(".")[-1] else "Linear"


# reference module names for the same layers, so the fork's shipped config
# files (e.g. self_attn.(k_proj|v_proj|q_proj|out_proj)) match our paths
_ALIAS_MAP = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "out": "out_proj"}


def _alias(path: str) -> str:
    return ".".join(_ALIAS_MAP.get(c, c) for c in path.split("."))


def _select(spec, path: str, size: int, what: str) -> int:
    """Resolve a (key, value-dict) selector: fuzzy_name matches a substring
    of the layer path; size keys match the relevant dimension; '*' is the
    wildcard (reference pq/utils.py get_param)."""
    key, values = spec
    if key == "fuzzy_name":
        for name, v in values.items():
            if name != "*" and name in path:
                return int(v)
        if "*" in values:
            return int(values["*"])
        raise ValueError(
            f"no {what} rule matches layer '{path}' (rules: {list(values)})"
        )
    for k, v in values.items():
        if k != "*" and int(k) == size:
            return int(v)
    return int(values.get("*", 256))


class Quantizer:
    """Stage-scheduled iPQ driver (reference quantization_utils.Quantizer).

    One stage per entry of ``layers_to_quantize``; stages advance at epoch
    boundaries (--max-epoch evenly divided) or update boundaries
    (--max-update evenly divided), exactly one of which must be set."""

    def __init__(self, config_path: Optional[str], max_epoch: int,
                 max_update: int):
        config = load_config(config_path)
        self.n_centroids_config = config["n_centroids"]
        self.block_sizes_config = config["block_sizes"]
        self.layers_to_quantize: List[str] = config["layers_to_quantize"]

        num_iterations = len(self.layers_to_quantize)
        self.epoch_schedule = self.update_schedule = None
        if max_epoch > 0:
            assert max_epoch % num_iterations == 0, (
                f"for iterative PQ, --max-epoch (={max_epoch}) must be "
                f"evenly divisible by len(layers_to_quantize) "
                f"(={num_iterations})"
            )
            self.epoch_schedule = max_epoch // num_iterations
        if max_update > 0:
            assert max_update % num_iterations == 0, (
                f"for iterative PQ, --max-update (={max_update}) must be "
                f"evenly divisible by len(layers_to_quantize) "
                f"(={num_iterations})"
            )
            self.update_schedule = max_update // num_iterations
        assert (self.epoch_schedule is not None) ^ (
            self.update_schedule is not None
        ), "for iterative PQ, specify exactly one of --max-epoch/--max-update"

        self.quantization_step = 0
        self.trainer = None

    # -- wiring ---------------------------------------------------------------

    def set_trainer(self, trainer) -> None:
        self.trainer = trainer
        # resuming a checkpoint whose params already carry w_codes: skip
        # the stages that are already applied (the reference restores this
        # from its state_dict; here the param tree itself records it)
        import jax

        paths = {
            ".".join(str(getattr(p, "key", p)) for p in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(
                trainer.params
            )[0]
        }
        while self.quantization_step < len(self.layers_to_quantize):
            regex = re.compile(self.layers_to_quantize[self.quantization_step])
            if any(
                p.endswith("w_codes")
                and (
                    regex.search(p.rsplit(".", 1)[0])
                    or regex.search(_alias(p.rsplit(".", 1)[0]))
                )
                for p in paths
            ):
                self.quantization_step += 1
            else:
                break

    # -- schedule (reference :103-125) -----------------------------------------

    def begin_epoch(self, epoch: int) -> None:
        if (
            self.epoch_schedule is not None
            and epoch > 0
            and (epoch - 1) % self.epoch_schedule == 0
        ) or self.quantization_step == 0:
            self.step()

    def step_update(self, num_updates: int) -> None:
        if (
            self.update_schedule is not None
            and num_updates > 0
            and num_updates % self.update_schedule == 0
        ):
            self.step()

    # -- the quantization pass --------------------------------------------------

    def step(self) -> List[str]:
        if self.quantization_step >= len(self.layers_to_quantize):
            return []
        regex = re.compile(self.layers_to_quantize[self.quantization_step])
        logger.info(
            "quantizing model (step=%d; layers_to_quantize[step]=%s)",
            self.quantization_step,
            self.layers_to_quantize[self.quantization_step],
        )
        import jax

        params = jax.device_get(self.trainer.params)
        quantized = quantize_param_tree(
            params, regex, self.block_sizes_config, self.n_centroids_config
        )
        logger.info("quantized layers: %s", quantized)
        self.quantization_step += 1
        if quantized:
            # param tree changed structurally: fresh optimizer state,
            # recomputed shardings (reference trainer.reinitialize)
            self.trainer.reinitialize(params)
        return quantized

    # -- checkpoint round-trip (reference :127-142) -----------------------------

    def state_dict(self) -> Dict:
        return {
            "n_centroids_config": self.n_centroids_config,
            "block_sizes_config": self.block_sizes_config,
            "layers_to_quantize": self.layers_to_quantize,
            "epoch_schedule": self.epoch_schedule,
            "update_schedule": self.update_schedule,
            "quantization_step": self.quantization_step,
        }

    def load_state_dict(self, state_dict: Dict) -> None:
        for k, v in state_dict.items():
            setattr(self, k, v)


def quantize_param_tree(params, regex, block_sizes_config,
                        n_centroids_config) -> List[str]:
    """Replace the 'w' of every layer dict whose path matches ``regex``
    with (w_codes, w_centroids). Mutates ``params`` in place; returns the
    quantized layer paths."""
    quantized: List[str] = []

    def walk(node, path):
        if isinstance(node, (list, tuple)):
            items = list(enumerate(node))
        elif isinstance(node, dict):
            items = list(node.items())
        else:
            return
        for k, v in items:
            sub = f"{path}.{k}" if path else str(k)
            if isinstance(v, (list, tuple)):
                walk(v, sub)
            elif isinstance(v, dict):
                if (
                    (regex.search(sub) or regex.search(_alias(sub)))
                    and "w" in v
                    and not isinstance(v["w"], dict)
                    and getattr(v["w"], "ndim", 0) == 2
                ):
                    _quantize_layer(v, sub, block_sizes_config,
                                    n_centroids_config)
                    quantized.append(sub)
                else:
                    walk(v, sub)

    walk(params, "")
    return quantized


def _quantize_layer(leaf: dict, path: str, block_sizes_config,
                    n_centroids_config) -> None:
    W = np.asarray(leaf["w"], np.float32)
    kind = _layer_kind(path)
    # linear storage is (in, out) -> PQ blocks the input dim, so hand PQ
    # the reference's (out, in) orientation; embedding tables are
    # (num_embeddings, dim) and block the dim (reference qemb.py)
    W2 = W.T if kind == "Linear" else W
    size = W2.shape[1]  # in_features / embedding_dim
    block_size = _select(block_sizes_config[kind], path, size, "block size")
    n_centroids = _select(
        n_centroids_config[kind], path, size, "n_centroids"
    )
    if W2.shape[1] % block_size != 0:
        raise ValueError(
            f"layer '{path}': dim {W2.shape[1]} not divisible by block "
            f"size {block_size}"
        )
    n_cols = W2.shape[0] * (W2.shape[1] // block_size)
    if n_centroids > n_cols // 2:
        # tiny layers cannot fill the codebook; shrink it (the reference
        # asserts inside EM instead — a hard failure on toy configs)
        logger.info(
            "layer '%s': shrinking n_centroids %d -> %d (only %d blocks)",
            path, n_centroids, max(n_cols // 2, 1), n_cols,
        )
        n_centroids = max(n_cols // 2, 1)
    pq = PQ(W2, block_size, n_centroids=n_centroids, n_iter=15)
    pq.encode()
    out_features = W2.shape[0]
    codes = pq.assignments.reshape(-1, out_features)  # (n_blocks, out)
    del leaf["w"]
    leaf["w_codes"] = codes.astype(np.float32)
    leaf["w_centroids"] = pq.centroids.astype(np.float32)
