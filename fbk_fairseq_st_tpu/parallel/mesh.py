"""Device mesh and sharding rules.

The reference's distributed stack (NCCL process groups, DDP wrappers,
bucketed all-reduce — fairseq/distributed_utils.py,
legacy_distributed_data_parallel.py) collapses into one
``jax.sharding.Mesh`` with axes:

  * ``data``  — data parallelism over ICI/DCN: the batch dimension is
    sharded here; gradient all-reduce is inserted by GSPMD because the loss
    reduces over the sharded batch while params are replicated (or sharded
    on ``model``).
  * ``model`` — tensor parallelism (the Megatron-style mesh axis of
    fairseq/model_parallel/): attention heads / FFN hidden / vocab logits
    shard here via param rules.

No explicit collective code: psum/all-gather placement is the compiler's
job; this module only declares placements.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"data*model must equal device count ({n})"
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over 'data'.

    Arrays already committed with the target sharding pass through
    untouched — re-issuing device_put for staged buffers costs a device
    round-trip per leaf (very expensive over a tunneled TPU) and the
    prefetch pipeline stages batches ahead of the step."""
    sharding = batch_sharding(mesh)
    repl = replicated(mesh)

    def put(x):
        want = sharding if (hasattr(x, "ndim") and x.ndim >= 1) else repl
        if isinstance(x, jax.Array) and x.sharding == want:
            return x
        return jax.device_put(x, want)

    return jax.tree_util.tree_map(put, batch)


# Tensor-parallel placement rules: (param path regex) -> PartitionSpec.
# Megatron layout (reference fairseq/model_parallel/modules/
# multihead_attention.py:78-81, transformer_layer.py:23-66): q/k/v and fc1
# are column-parallel (shard output dim), out-proj and fc2 row-parallel
# (shard input dim), embeddings/logits shard the vocab dim.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(self_attn|encoder_attn)/(q|k|v)/w$", P(None, "model")),
    (r".*(self_attn|encoder_attn)/(q|k|v)/b$", P("model")),
    (r".*(self_attn|encoder_attn)/out/w$", P("model", None)),
    (r".*fc1/w$", P(None, "model")),
    (r".*fc1/b$", P("model")),
    (r".*fc2/w$", P("model", None)),
    (r".*embed_tokens/w$", P("model", None)),
    (r".*embed_out$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding(mesh: Mesh, params, use_tp: bool = False):
    """A NamedSharding tree for a param pytree: replicated by default, TP
    rules applied on the 'model' axis when use_tp."""

    def spec_for(path, leaf):
        if use_tp and mesh.shape.get("model", 1) > 1:
            s = _path_str(path)
            for pattern, spec in TP_RULES:
                if re.match(pattern, s):
                    # only shard if divisible
                    dims = [d for d in spec]
                    ok = True
                    for axis_idx, d in enumerate(dims):
                        if d == "model" and leaf.shape[axis_idx] % mesh.shape["model"] != 0:
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
