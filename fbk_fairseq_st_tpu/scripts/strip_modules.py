"""Strip model parameters by prefix from a checkpoint (counterpart of the
fork's root-level strip_modules.py:1-47): the FBK encoder/decoder transplant
workflow saves e.g. an ASR encoder by stripping ``decoder`` before loading
it under --allow-partial-restore / --pretrained.

Works on both checkpoint families:
  * native pickle checkpoints (nested ``model`` param tree) — the prefix is
    matched against dotted tree paths;
  * fork torch ``.pt`` files (flat ``model`` state dict) — the prefix is
    matched against flat keys, byte-for-byte the reference behavior.

Usage:
    python -m fbk_fairseq_st_tpu.scripts.strip_modules \
        --model-path ckpt.pt --new-model-path encoder_only.pt \
        --strip-what decoder
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def _strip_nested(tree: dict, prefix: str, path: str = "") -> dict:
    """Drop every leaf/subtree whose dotted path starts with ``prefix``."""
    out = {}
    for key, value in tree.items():
        dotted = f"{path}.{key}" if path else key
        if dotted.startswith(prefix):
            continue
        if isinstance(value, dict):
            kept = _strip_nested(value, prefix, dotted)
            if kept:
                out[key] = kept
        else:
            out[key] = value
    return out


def strip_params(state: dict, strip_what: str) -> dict:
    """reference strip_modules.py:14-19 (_strip_params)."""
    model = state["model"]
    if any(isinstance(v, dict) for v in model.values()):
        state["model"] = _strip_nested(model, strip_what)
    else:  # flat fork state dict
        state["model"] = type(model)(
            (k, v) for k, v in model.items() if not k.startswith(strip_what)
        )
    return state


def _load(path: str):
    """Native pickle first; fall back to torch for fork .pt files."""
    import pickle

    try:
        with open(path, "rb") as f:
            return pickle.load(f), "native"
    except Exception:
        import torch

        return torch.load(path, map_location="cpu"), "torch"


def main(args=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--user-dir", default=None,
                        help="accepted for fork-command compatibility")
    parser.add_argument("--model-path", type=str, required=True,
                        help="the path to the model to strip")
    parser.add_argument("--new-model-path", type=str, required=True,
                        help="the name for the stripped model")
    parser.add_argument("--strip-what", type=str, default="decoder",
                        help="part of the network to strip away")
    args = parser.parse_args(args)

    state, fmt = _load(args.model_path)
    print("Loaded model {}".format(args.model_path))
    state = strip_params(state, args.strip_what)
    print("Stripped {}".format(args.strip_what))
    if fmt == "torch":
        import torch

        torch.save(state, args.new_model_path)
    else:
        from ..train.checkpoint import save_state

        save_state(args.new_model_path, state)
    print("Saved to {}".format(args.new_model_path))


if __name__ == "__main__":
    main()
