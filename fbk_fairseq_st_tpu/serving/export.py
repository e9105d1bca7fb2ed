"""Export a checkpointed model ensemble as a self-contained serving artifact.

Counterpart (in role, not mechanism) of the reference's serving exports —
fairseq's TorchScript scripting of SequenceGenerator and the
examples/speech_recognition ONNX path. The TPU-native mechanism is
``jax.export``: the WHOLE decode — conv/transformer encoder, incrementally
cached decoder, beam search while_loop, length normalization — is one
jitted program, lowered to StableHLO per static shape bucket and
serialized. Weights ride beside the program (not baked into it) so the
same artifact updates weights without re-export and int8-quantized
ensembles export transparently.

Artifact layout (directory):

    meta.json                  format, bucket table, vocab ids, provenance
    dict.tgt.txt               target dictionary (fairseq text format)
    dict.src.txt               source dictionary (text tasks only)
    weights/model{i}.npz       flattened '/'-joined param paths per model
    programs/b{B}_s{S}.jexp    serialized jax.export program per bucket

Static shape buckets are the TPU-idiomatic serving contract: every
program is compiled ahead of time for its (batch, src_len) and the
runtime pads requests up to the smallest fitting bucket — no on-line
recompilation, ever.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT_NAME = "fbk-fairseq-st-tpu-serving"
FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# variables <-> flat npz
# ---------------------------------------------------------------------------

def flatten_variables(variables) -> Tuple[Dict[str, np.ndarray], dict]:
    """Nested dict/list pytree -> ({'a/layers/0/w': array}, structure).

    ``structure`` records everything npz cannot: interior LIST/TUPLE nodes
    (per-layer parameter stacks — 'layers/0' keys alone can't distinguish
    a list from a dict with digit keys, and the exported program's treedef
    must match exactly), empty interior dicts (a stateless model's
    ``"state": {}`` carries no leaves but is part of the treedef), and
    dtypes numpy can't round-trip (bfloat16 & friends from ml_dtypes,
    stored widened and restored on load).
    """
    flat: Dict[str, np.ndarray] = {}
    structure = {"empty_nodes": [], "list_nodes": {}, "cast_keys": {}}

    def walk(node, prefix):
        key = "/".join(prefix)
        if isinstance(node, dict):
            if not node and prefix:
                structure["empty_nodes"].append(key)
                return
            for k, v in node.items():
                k = str(k)
                assert "/" not in k, f"param path component {k!r} contains '/'"
                walk(v, prefix + (k,))
        elif isinstance(node, (list, tuple)):
            structure["list_nodes"][key] = {
                "len": len(node),
                "kind": "tuple" if isinstance(node, tuple) else "list",
            }
            for i, v in enumerate(node):
                walk(v, prefix + (str(i),))
        else:
            arr = np.asarray(node)
            if arr.dtype.kind == "V" or arr.dtype.name in (
                "bfloat16", "float8_e4m3fn", "float8_e5m2"
            ):
                structure["cast_keys"][key] = arr.dtype.name
                arr = arr.astype(np.float32)
            flat[key] = arr

    walk(variables, ())
    return flat, structure


def unflatten_variables(
    flat: Dict[str, np.ndarray], structure: Optional[dict] = None
) -> dict:
    import ml_dtypes

    structure = structure or {}
    cast_keys = structure.get("cast_keys") or {}
    list_nodes = structure.get("list_nodes") or {}

    nested: dict = {}

    def insert(path, value):
        parts = path.split("/")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for path, value in flat.items():
        if path in cast_keys:
            value = value.astype(np.dtype(getattr(ml_dtypes, cast_keys[path])))
        insert(path, value)
    for path in structure.get("empty_nodes") or []:
        insert(path, {})

    # convert recorded list nodes (built as digit-keyed dicts above) back
    # into lists/tuples, deepest paths first so nested lists resolve
    for path in sorted(list_nodes, key=lambda p: -p.count("/")):
        info = list_nodes[path]
        parts = path.split("/")
        node = nested
        for p in parts[:-1]:
            node = node[p]
        as_dict = node[parts[-1]] if parts[-1] else node
        seq = [as_dict[str(i)] for i in range(info["len"])]
        node[parts[-1]] = tuple(seq) if info["kind"] == "tuple" else seq
    return nested


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _compute_max_len(generator, models, src_len: int) -> int:
    """The generator's own target-length policy for a source of src_len
    (sequence_generator.py generate(): a*src_len + b, model cap)."""
    model_cap = min(m.max_target_positions for m, _ in models) - 1
    if generator.match_source_len:
        max_len = src_len
    else:
        max_len = min(
            int(generator.max_len_a * src_len + generator.max_len_b),
            model_cap,
        )
    return max(max_len, generator.min_len)


def _bucket_name(batch: int, src_len: int) -> str:
    return f"b{batch}_s{src_len}"


def export_artifact(
    models: List[Tuple[object, dict]],
    generator,
    buckets: Sequence[Tuple[int, int]],
    out_dir: str,
    *,
    tgt_dict,
    src_dict=None,
    src_spec: Optional[dict] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    bos_token: Optional[int] = None,
    remove_bpe: Optional[str] = None,
    provenance: Optional[dict] = None,
) -> dict:
    """Lower + serialize the generator's decode program for each bucket.

    models: list of (model, variables) as produced by
        checkpoint.load_model_ensemble (optionally already quantized by
        quantization.weight_only.maybe_quantize_ensemble — the dequant ops
        trace into the program and the int8 payloads land in the npz).
    generator: a plain SequenceGenerator (subclasses with extra host-side
        phases — two-phase, context — are not exportable as one program).
    buckets: (batch, src_len) pairs; src_len is frames for audio input,
        tokens for text input.
    src_spec: {"kind": "audio", "suffix": [feat_dim], "dtype": "float32"}
        or {"kind": "tokens", "dtype": "int32"} (default: tokens).

    Returns the meta dict (also written to meta.json).
    """
    from ..generation.sequence_generator import (
        EnsembleModel,
        SequenceGenerator,
    )

    if type(generator) is not SequenceGenerator:
        raise ValueError(
            "serving export supports the single-program SequenceGenerator; "
            f"got {type(generator).__name__} (two-phase/context generators "
            "drive multiple programs from the host and cannot be exported "
            "as one artifact)"
        )
    if src_spec is None:
        src_spec = {"kind": "tokens", "dtype": "int32"}

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "programs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "weights"), exist_ok=True)

    models_static = [m for m, _ in models]
    variables_list = [v for _, v in models]

    program_rows = []
    for batch, src_len in buckets:
        max_len = _compute_max_len(generator, models, src_len)

        def decode(vlist, src_tokens, src_lengths, _max_len=max_len):
            ens = EnsembleModel(list(zip(models_static, vlist)))
            return generator._generate_impl(
                ens,
                {"src_tokens": src_tokens, "src_lengths": src_lengths},
                _max_len,
                None,
                bos_token=bos_token,
            )

        suffix = tuple(src_spec.get("suffix", ()))
        src_sds = jax.ShapeDtypeStruct(
            (batch, src_len) + suffix, jnp.dtype(src_spec["dtype"])
        )
        len_sds = jax.ShapeDtypeStruct((batch,), jnp.int32)
        exported = jax_export.export(
            jax.jit(decode), platforms=tuple(platforms)
        )(variables_list, src_sds, len_sds)

        name = _bucket_name(batch, src_len)
        with open(
            os.path.join(out_dir, "programs", name + ".jexp"), "wb"
        ) as f:
            f.write(exported.serialize())
        program_rows.append(
            {
                "name": name,
                "batch": batch,
                "src_len": src_len,
                "max_len": max_len,
                "file": f"programs/{name}.jexp",
            }
        )

    weight_rows = []
    for i, variables in enumerate(variables_list):
        flat, structure = flatten_variables(variables)
        np.savez(
            os.path.join(out_dir, "weights", f"model{i}.npz"), **flat
        )
        weight_rows.append(
            {"file": f"weights/model{i}.npz", "structure": structure}
        )

    def dict_row(d, name):
        """Dictionary.save writes only symbols[nspecial:]; the special rows
        (incl. subclass extras like MaskedLMDictionary's '<mask>') must be
        recorded in meta or every id >= 4 would shift on reload — silently
        desynchronizing ids from the embedding matrix baked into the
        program. 'size' lets the loader hard-fail instead."""
        d.save(os.path.join(out_dir, f"dict.{name}.txt"))
        return {
            "file": f"dict.{name}.txt",
            "bos": d.symbols[d.bos_index] if hasattr(d, "bos_index") else "<s>",
            "pad": d.symbols[d.pad_index],
            "eos": d.symbols[d.eos_index],
            "unk": d.symbols[d.unk_index],
            "extra_specials": list(d.symbols[4:d.nspecial]),
            "size": len(d),
        }

    dict_rows = {"tgt": dict_row(tgt_dict, "tgt")}
    if src_dict is not None:
        dict_rows["src"] = dict_row(src_dict, "src")

    meta = {
        "format": FORMAT_NAME,
        "format_version": FORMAT_VERSION,
        "platforms": list(platforms),
        "num_models": len(models),
        "weights": weight_rows,
        "dicts": dict_rows,
        "beam_size": generator.beam_size,
        "pad": generator.pad,
        "eos": generator.eos,
        "unk": generator.unk,
        "bos_token": bos_token,
        "src": dict(src_spec),
        "programs": sorted(
            program_rows, key=lambda r: (r["batch"], r["src_len"])
        ),
        "remove_bpe": remove_bpe,
        "generator": {
            "normalize_scores": generator.normalize_scores,
            "len_penalty": generator.len_penalty,
            "unk_penalty": generator.unk_penalty,
            "max_len_a": generator.max_len_a,
            "max_len_b": generator.max_len_b,
            "min_len": generator.min_len,
            "temperature": generator.temperature,
            "no_repeat_ngram_size": generator.no_repeat_ngram_size,
        },
        "provenance": provenance or {},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return meta
