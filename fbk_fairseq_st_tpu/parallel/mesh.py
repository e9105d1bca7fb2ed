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
    dcn: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With ``dcn > 1`` (multi-slice pods) the mesh gains an OUTER 'dcn' axis
    of that size — ('dcn', 'data', 'model') — grouping devices by TPU slice
    (``device.slice_index`` when the platform exposes it, contiguous chunks
    otherwise). The batch shards over ('dcn', 'data') jointly, so gradient
    all-reduce decomposes hierarchically: reduce inside each slice over ICI,
    then once across slices over DCN. FSDP/TP param shardings stay on the
    intra-slice axes ('data'/'model') — parameters are REPLICATED across
    'dcn', keeping the per-step all-gather/reduce-scatter traffic of ZeRO-3
    and Megatron-TP off the (order-of-magnitude slower) cross-slice link;
    the only DCN traffic is the once-per-step gradient reduction. This is
    the standard multi-slice recipe; the reference's multi-node story
    (NCCL over IB for everything, distributed_utils.py:30-77) has no
    equivalent hierarchy."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dcn = int(dcn or 1)
    if dcn > 1:
        assert n % dcn == 0, f"{n} devices not divisible by dcn={dcn}"
        if all(
            getattr(d, "slice_index", None) is not None for d in devices
        ):
            devices.sort(key=lambda d: (d.slice_index, d.id))
        per_slice = n // dcn
        if data is None:
            assert per_slice % model == 0, (
                f"{per_slice} devices/slice not divisible by model={model}"
            )
            data = per_slice // model
        assert dcn * data * model == n, (
            f"dcn*data*model must equal device count ({n})"
        )
        dev_array = np.array(devices).reshape(dcn, data, model)
        return Mesh(dev_array, ("dcn", "data", "model"))
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"data*model must equal device count ({n})"
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over (joint outer 'dcn'
    axis on multi-slice meshes)."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data' (jointly over ('dcn', 'data') on
    multi-slice meshes)."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one process (a
    multi-host launch via jax.distributed.initialize)."""
    return jax.process_count() > 1 and any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat
    )


def local_row_range(sharding: NamedSharding, global_shape) -> Tuple[int, int]:
    """[lo, hi) rows of the GLOBAL batch owned by this process's devices.

    Multi-host batch formation contract: every process runs the IDENTICAL
    epoch iterator (same seed, same bucketing over the whole dataset) and
    collates the same host-global batch; each process then transfers only
    its own contiguous row slice. Shapes therefore agree across processes
    by construction — the failure mode where per-process bucketing picks
    different padded shapes for the same step cannot occur.
    """
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    lo, hi = None, None
    spans = set()
    for idx in idx_map.values():
        s = idx[0] if len(idx) > 0 else slice(None)
        start = 0 if s.start is None else int(s.start)
        stop = global_shape[0] if s.stop is None else int(s.stop)
        spans.add((start, stop))
        lo = start if lo is None else min(lo, start)
        hi = stop if hi is None else max(hi, stop)
    if lo is None:
        return 0, global_shape[0]
    # make_array_from_process_local_data assumes the local chunk is ONE
    # contiguous row range; reject exotic device orders loudly instead of
    # feeding rows to the wrong devices
    covered = sorted(spans)
    pos = lo
    for start, stop in covered:
        if start > pos:
            raise ValueError(
                f"process-local rows are not contiguous: hole at {pos}.."
                f"{start} (device order vs 'data'-axis layout mismatch)"
            )
        pos = max(pos, stop)
    return lo, hi


def place_global_array(mesh: Mesh, x, want: NamedSharding):
    """Place a HOST-GLOBAL array onto the mesh with sharding *want*.

    Single-process: plain device_put. Multi-process: slice this process's
    rows out of the global host array and assemble the jax.Array with
    ``make_array_from_process_local_data`` — the reference's per-rank
    ``_prepare_sample`` + DDP scatter (distributed_utils.py) becomes
    process-local row transfer + a GSPMD global array."""
    if not is_multiprocess(mesh):
        return jax.device_put(x, want)
    x = np.asarray(x)
    if x.ndim == 0 or want.spec == P():
        return jax.make_array_from_process_local_data(want, x, x.shape)
    lo, hi = local_row_range(want, x.shape)
    return jax.make_array_from_process_local_data(want, x[lo:hi], x.shape)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the batch axis sharded over 'data'.

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
        return place_global_array(mesh, x, want)

    return jax.tree_util.tree_map(put, batch)


# ---------------------------------------------------------------------------
# Sequence parallelism (Megatron-SP, the GSPMD formulation)
# ---------------------------------------------------------------------------
#
# Under tensor parallelism the activations BETWEEN attention/FFN regions
# (LayerNorm, dropout, residuals) are replicated across the 'model' axis —
# each TP rank holds the full (B, T, D) tensor and burns the memory for it.
# Megatron-LM's sequence parallelism (Korthikanti et al. 2022,
# arXiv:2205.05198) shards those segments over the TIME axis instead,
# turning the TP all-reduce at each region boundary into a reduce-scatter +
# all-gather pair of the same total volume, while inter-layer activations
# (and everything the backward saves for LN/dropout/residual) shrink by the
# TP degree. The reference fork has no counterpart (its Megatron layer is
# replicated-activations only).
#
# On TPU this is NOT hand-written collectives: one sharding constraint at
# each transformer-layer boundary declares the time-sharded layout and
# GSPMD derives the reduce-scatter/all-gather placement. The scope is
# process-global state set by the Trainer while it traces its train step
# (the same pattern as ops.attention.set_flash_attention) so the model
# layer needs no mesh plumbing.
_SEQ_PARALLEL_MESH: Optional[Mesh] = None


def set_sequence_parallel(mesh: Optional[Mesh]) -> None:
    """Enable (pass the mesh) / disable (None) time-axis activation
    sharding inside transformer layers. Only meaningful when the mesh has
    a 'model' axis > 1; a data-only mesh makes this a no-op."""
    global _SEQ_PARALLEL_MESH
    if mesh is not None and mesh.shape.get("model", 1) <= 1:
        mesh = None
    _SEQ_PARALLEL_MESH = mesh


def constrain_seq_parallel(x):
    """Constrain a (B, T, ...) activation to P('data', 'model') when a
    sequence-parallel scope is active (trace-time check: the flag is read
    while the Trainer traces its jitted step, so generation and plain
    training never pay it). Skipped for rank<2 tensors and decode-step
    tensors with T == 1, where a time shard is meaningless."""
    mesh = _SEQ_PARALLEL_MESH
    if mesh is None or getattr(x, "ndim", 0) < 3 or x.shape[1] < 2:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(batch_axes(mesh), "model"))
    )


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


# Below this many elements a parameter is cheaper to replicate than to
# all-gather every step (biases, LayerNorm scales, BatchNorm stats).
FSDP_MIN_SIZE = 4096


def _fsdp_spec(spec_dims, shape, data_size: int) -> Optional[P]:
    """Extend a PartitionSpec with 'data' on the largest free divisible dim.

    ZeRO-3 placement: weights live sharded; GSPMD all-gathers them at use
    and reduce-scatters their gradients, so per-device parameter +
    optimizer memory shrinks by the 'data'-axis size (Rajbhandari et al.
    2020, arXiv:1910.02054 — expressed here purely as sharding annotations,
    the TPU/GSPMD formulation, vs the reference fork which has no
    equivalent; its FSDP landed in later fairseq)."""
    dims = list(spec_dims) + [None] * (len(shape) - len(spec_dims))
    free = [
        (shape[i], i)
        for i, d in enumerate(dims)
        if d is None and shape[i] % data_size == 0
    ]
    if not free:
        return None
    dims[max(free)[1]] = "data"
    return P(*dims)


def param_sharding(
    mesh: Mesh,
    params,
    use_tp: bool = False,
    use_fsdp: bool = False,
    fsdp_min_size: Optional[int] = None,
):
    """A NamedSharding tree for a param pytree: replicated by default, TP
    rules applied on the 'model' axis when use_tp, and remaining large
    dims sharded over 'data' when use_fsdp (ZeRO-3; composes with TP into
    a 2-D weight layout)."""
    data_size = mesh.shape.get("data", 1)
    if fsdp_min_size is None:
        fsdp_min_size = FSDP_MIN_SIZE

    def spec_for(path, leaf):
        spec_dims: Tuple = ()
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
                        spec_dims = tuple(dims)
                    break
        if use_fsdp and data_size > 1 and leaf.size >= fsdp_min_size:
            fs = _fsdp_spec(spec_dims, leaf.shape, data_size)
            if fs is not None:
                return NamedSharding(mesh, fs)
        return NamedSharding(mesh, P(*spec_dims))

    return jax.tree_util.tree_map_with_path(spec_for, params)
