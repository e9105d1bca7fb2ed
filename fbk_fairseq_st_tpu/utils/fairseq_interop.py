"""Interop with fork (pytorch/fairseq-style) checkpoints.

The north-star capability (BASELINE.md): take a checkpoint trained with the
reference fork (reference checkpoint layout: torch.save dict with ``args``,
``model`` state_dict, ``optimizer_history``, ``extra_state`` —
checkpoint_utils.py:166-214) and decode BLEU-identical output through this
framework. This module reads such a ``.pt`` with torch (optional dep,
CPU-only is enough), migrates legacy layouts (``raw_state_dict_upgrade``,
conv_transformer.py:105-112), and ports the torch parameter names/layouts
into this framework's param/state trees.

Porting is structure-driven: we walk OUR tree (the authoritative shape
contract, produced by ``model.init``) and translate each leaf's path into
the fork's parameter name, then convert the array layout:

  * ``nn.Linear`` stores ``(out, in)`` — ours is ``(in, out)`` — transpose;
  * embeddings / output projections are ``(V, D)`` on both sides — copy;
  * ``nn.Conv2d`` stores OIHW — ours is HWIO — ``transpose(2, 3, 1, 0)``;
  * LayerNorm/BatchNorm ``weight``→``scale``; BN running stats live in our
    mutable ``state`` tree.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# torch checkpoint reading
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a fork checkpoint and numpy-ify every tensor.

    Returns the fork dict layout with ``model`` / ``criterion`` values as
    numpy arrays and ``args`` as an argparse.Namespace.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(d):
        if d is None:
            return None
        return {
            k: (v.detach().cpu().numpy() if torch.is_tensor(v) else v)
            for k, v in d.items()
        }

    state["model"] = to_np(state.get("model"))
    if "criterion" in state:
        state["criterion"] = to_np(state["criterion"])
    # very old fork layouts kept the criterion inside last_optimizer_state;
    # we only need model params + criterion for the port
    return state


def upgrade_fork_state(state: Dict[str, Any]) -> Dict[str, Any]:
    """The subset of the fork's ``_upgrade_state_dict``
    (checkpoint_utils.py:288-364) + ``raw_state_dict_upgrade``
    (conv_transformer.py:105-112) needed to rebuild a model:

      * normalize legacy arg names (max_positions split, raw_text/lazy_load
        → dataset_impl, task default);
      * migrate a CTC head trained under the pre-refactor criterion
        (``ctc_aware_model.fc_out``) into ``encoder.ctc_fc``.
    """
    args = state.get("args")
    if args is None:
        raise ValueError("checkpoint has no args; cannot rebuild the model")

    if hasattr(args, "max_positions") and not hasattr(
        args, "max_source_positions"
    ):
        args.max_source_positions = args.max_positions
        args.max_target_positions = args.max_positions
    if not hasattr(args, "task"):
        args.task = "translation"
    if getattr(args, "raw_text", False):
        args.dataset_impl = "raw"
    elif getattr(args, "lazy_load", False):
        args.dataset_impl = "lazy"

    model_sd = state["model"]
    crit_sd = state.get("criterion") or {}
    if (
        getattr(args, "ctc_compress_out", False)
        and "encoder.ctc_fc.weight" not in model_sd
        and "ctc_aware_model.fc_out.weight" in crit_sd
    ):
        model_sd["encoder.ctc_fc.weight"] = crit_sd[
            "ctc_aware_model.fc_out.weight"
        ]
        model_sd["encoder.ctc_fc.bias"] = crit_sd["ctc_aware_model.fc_out.bias"]
    return state


# ---------------------------------------------------------------------------
# name translation: our tree path -> fork parameter name
# ---------------------------------------------------------------------------

# simple component renames (ours -> fork)
_COMPONENT_MAP = {
    "convs": "convolutions",
    "bns": "bn",
    "self_attn_ln": "self_attn_layer_norm",
    "encoder_attn_ln": "encoder_attn_layer_norm",
    "aux_attn_ln": "aux_attn_layer_norm",
    "context_attn_ln": "context_attn_layer_norm",
}
# components that exist only in our tree (structural grouping)
_TRANSPARENT = {"frontend"}
# attention projection names (inside an attention block)
_ATTN_PROJ = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "out": "out_proj"}
_ATTN_BLOCKS = {
    "self_attn", "encoder_attn", "aux_attn", "context_attn", "attn",
}
# leaves copied verbatim: (V, D) / (T, D) tables on both sides
_NO_TRANSPOSE_SUFFIX = (
    "embed_tokens.weight",
    "embed_positions.weight",
    "output_projection.weight",
    "embed_out",
)


def _is_index(part: str) -> bool:
    return part.isdigit()


def translate_path(parts: List[str]) -> Optional[str]:
    """Our tree path components -> the fork's dotted parameter name, or
    None when the leaf has no fork counterpart."""
    out: List[str] = []
    for i, part in enumerate(parts):
        prev = parts[i - 1] if i > 0 else ""
        is_leaf = i == len(parts) - 1
        if part in _TRANSPARENT:
            continue
        if part in _COMPONENT_MAP:
            out.append(_COMPONENT_MAP[part])
            continue
        if part in _ATTN_PROJ and prev in _ATTN_BLOCKS:
            out.append(_ATTN_PROJ[part])
            continue
        if part == "final_ln":
            # per-layer -> final_layer_norm; top-of-stack -> layer_norm
            out.append(
                "final_layer_norm" if _is_index(prev) else "layer_norm"
            )
            continue
        if is_leaf:
            if part == "w":
                out.append("weight")
            elif part == "b":
                out.append("bias")
            elif part == "scale":
                out.append("weight")
            elif part == "mean":
                out.append("running_mean")
            elif part == "var":
                out.append("running_var")
            elif part == "embed_out":
                # fork name depends on vintage; resolved by the caller
                out.append("embed_out")
            elif part == "in_proj_w":
                out.append("in_proj_weight")
            elif part == "in_proj_b":
                out.append("in_proj_bias")
            elif part == "out_proj_w":
                out.append("out_proj.weight")
            elif part == "out_proj_b":
                out.append("out_proj.bias")
            else:
                out.append(part)
        else:
            out.append(part)
    return ".".join(out)


def _convert(name: str, torch_arr: np.ndarray, want_shape: Tuple[int, ...]):
    """Fork array layout -> ours, validated against the target shape."""
    arr = np.asarray(torch_arr)
    if name.endswith(_NO_TRANSPOSE_SUFFIX):
        converted = arr
    elif arr.ndim == 2 and name.endswith("weight"):
        converted = arr.T  # nn.Linear (out, in) -> (in, out)
    elif arr.ndim == 4:
        converted = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    else:
        converted = arr
    if tuple(converted.shape) != tuple(want_shape):
        raise ValueError(
            f"{name}: converted shape {converted.shape} != expected "
            f"{want_shape} (raw {arr.shape})"
        )
    return converted


def port_parameters(
    variables: Dict[str, Any],
    torch_sd: Dict[str, np.ndarray],
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Fill ``variables`` (params + state trees from ``model.init``) from a
    fork state_dict. Returns (variables, report) where report lists
    ``missing`` (our leaves with no fork tensor) and ``unused`` (fork
    tensors never consumed). strict=True raises on missing leaves."""
    import jax
    import jax.numpy as jnp

    consumed = set()
    missing: List[str] = []

    def resolve(name: str) -> Optional[str]:
        if name in torch_sd:
            return name
        # output projection naming varies by vintage / share flags
        if name.endswith("embed_out"):
            base = name[: -len("embed_out")]
            for cand in (
                base + "output_projection.weight",
                base + "embed_out",
                base + "embed_tokens.weight",  # shared in/out embeddings
            ):
                if cand in torch_sd:
                    return cand
        return None

    def fill(path, leaf):
        from ..parallel.mesh import _path_str

        path_str = _path_str(path)
        name = translate_path(path_str.split("/"))
        src = resolve(name) if name else None
        if src is None:
            missing.append(path_str + f" (wanted {name})")
            return leaf
        consumed.add(src)
        return jnp.asarray(
            _convert(src, torch_sd[src], leaf.shape), dtype=leaf.dtype
        )

    new_vars = {
        "params": jax.tree_util.tree_map_with_path(
            fill, variables["params"]
        ),
        "state": jax.tree_util.tree_map_with_path(fill, variables["state"]),
    }
    # fork bookkeeping buffers with no counterpart here
    ignorable = ("version", "_float_tensor", "num_batches_tracked")
    unused = [
        k
        for k in torch_sd
        if k not in consumed and not k.endswith(ignorable)
    ]
    report = {"missing": missing, "unused": unused}
    if strict and missing:
        raise ValueError(
            "unported parameters (pass strict=False to keep their random "
            "init): " + "; ".join(missing[:10])
        )
    if unused:
        logger.warning("fork tensors not consumed: %s", unused[:10])
    return new_vars, report


# ---------------------------------------------------------------------------
# end-to-end import
# ---------------------------------------------------------------------------


def _dummy_dictionary(vocab_size: int):
    from ..data.dictionary import Dictionary

    d = Dictionary()
    for i in range(vocab_size - d.nspecial):
        d.add_symbol(f"w{i}")
    return d


def _setup_task(args, model_sd):
    """Task for model building: real setup when the data dir is readable,
    else a shape-compatible stand-in with dictionaries sized from the
    checkpoint's embedding tables."""
    from ..registry import TASKS

    try:
        return TASKS[args.task].setup_task(args)
    except (OSError, KeyError, ValueError) as e:
        logger.info(
            "task setup from args.data failed (%s); synthesizing "
            "dictionaries from checkpoint shapes", e
        )
    tgt_vocab = None
    for key in ("decoder.embed_tokens.weight", "decoder.embed_out",
                "decoder.output_projection.weight"):
        if key in model_sd:
            tgt_vocab = model_sd[key].shape[0]
            break
    if tgt_vocab is None:
        raise ValueError("cannot infer target vocab from checkpoint")
    tgt_dict = _dummy_dictionary(tgt_vocab)
    src_dict = None
    if "encoder.ctc_fc.weight" in model_sd:
        src_dict = _dummy_dictionary(model_sd["encoder.ctc_fc.weight"].shape[0])
    elif "auxiliary_decoder.embed_tokens.weight" in model_sd:
        src_dict = _dummy_dictionary(
            model_sd["auxiliary_decoder.embed_tokens.weight"].shape[0]
        )

    class _StandInTask:
        target_dictionary = tgt_dict
        source_dictionary = src_dict

    return _StandInTask()


def import_fairseq_checkpoint(
    input_path: str,
    output_path: str,
    arg_overrides: Optional[Dict[str, Any]] = None,
    strict: bool = True,
) -> Dict[str, List[str]]:
    """Convert a fork ``.pt`` into a framework checkpoint readable by
    ``train/checkpoint.load_model_ensemble`` (and thus cli/generate).
    Returns the port report."""
    import jax

    from .. import registry
    from ..train.checkpoint import save_state

    state = load_torch_checkpoint(input_path)
    state = upgrade_fork_state(state)
    args = state["args"]
    for k, v in (arg_overrides or {}).items():
        setattr(args, k, v)

    task = _setup_task(args, state["model"])
    registry.apply_architecture(args)
    model = registry.build_model(args, task)
    variables = model.init(jax.random.PRNGKey(0))
    variables, report = port_parameters(
        variables, state["model"], strict=strict
    )

    extra = state.get("extra_state") or {}
    out = {
        "args": vars(args),
        "model": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "model_state": jax.tree_util.tree_map(np.asarray, variables["state"]),
        "opt_state": None,
        "lr_scheduler": None,
        "num_updates": 0,
        "extra_state": {
            "imported_from": input_path,
            "val_loss": extra.get("val_loss"),
        },
    }
    save_state(output_path, out)
    logger.info(
        "imported %s -> %s (%d fork tensors, %d unused, %d missing)",
        input_path, output_path, len(state["model"]),
        len(report["unused"]), len(report["missing"]),
    )
    return report


# ---------------------------------------------------------------------------
# export: framework checkpoint -> fork torch layout
# ---------------------------------------------------------------------------


def _invert(name: str, arr: np.ndarray) -> np.ndarray:
    """Our array layout -> the fork's (inverse of ``_convert``)."""
    arr = np.asarray(arr)
    if name.endswith(_NO_TRANSPOSE_SUFFIX):
        return arr
    if arr.ndim == 2 and name.endswith("weight"):
        return arr.T  # (in, out) -> nn.Linear (out, in)
    if arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    return arr


def export_parameters(variables) -> Dict[str, np.ndarray]:
    """Flatten params + mutable state into a fork-named state_dict."""
    import jax

    out: Dict[str, np.ndarray] = {}
    for tree in (variables.get("params"), variables.get("state")):
        if tree is None:
            continue
        from ..parallel.mesh import _path_str

        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = translate_path(_path_str(path).split("/"))
            if name is None:
                continue
            if name.endswith("embed_out"):
                # canonical fork name for a separate output projection
                name = name[: -len("embed_out")] + "output_projection.weight"
            out[name] = _invert(name, np.asarray(jax.device_get(leaf)))
    return out


def export_fairseq_checkpoint(input_path: str, output_path: str) -> int:
    """Convert a framework checkpoint into a fork-layout torch ``.pt``
    (inverse of import_fairseq_checkpoint). Returns the tensor count.

    The fork's own bookkeeping buffers (``*.version``,
    ``embed_positions._float_tensor``, BN ``num_batches_tracked``) are not
    emitted — load on the fork side with strict=False, as the fork itself
    does for cross-vintage checkpoints.
    """
    import argparse

    import torch

    from ..train.checkpoint import load_checkpoint_to_cpu

    state = load_checkpoint_to_cpu(input_path)
    variables = {
        "params": state["model"],
        "state": state.get("model_state") or {},
    }
    model_sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_parameters(variables).items()
    }
    args = state.get("args") or {}
    torch.save(
        {
            "args": argparse.Namespace(**args)
            if isinstance(args, dict)
            else args,
            "model": model_sd,
            "optimizer_history": [],
            "extra_state": dict(state.get("extra_state") or {}),
        },
        output_path,
    )
    logger.info(
        "exported %s -> %s (%d tensors)", input_path, output_path,
        len(model_sd),
    )
    return len(model_sd)
