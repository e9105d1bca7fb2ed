"""Diff the arg namespaces of two checkpoints (reference
scripts/compare_namespaces.py, which eval()s pasted Namespace reprs; here
the namespaces are read straight from checkpoint files — both the
framework's pickle/sharded formats and fork torch checkpoints work).

    python -m fbk_fairseq_st_tpu.scripts.compare_namespaces A.pt B.pt
"""

from __future__ import annotations

import argparse


def _load_args(path: str) -> dict:
    try:
        from ..train.checkpoint import load_checkpoint_to_cpu

        state = load_checkpoint_to_cpu(path)
    except Exception:
        from ..utils.fairseq_interop import load_torch_checkpoint

        state = load_torch_checkpoint(path)
    args = state.get("args", {})
    return dict(args) if isinstance(args, dict) else vars(args)


def cli_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint_a")
    parser.add_argument("checkpoint_b")
    args = parser.parse_args(argv)

    a = _load_args(args.checkpoint_a)
    b = _load_args(args.checkpoint_b)
    ka, kb = set(a), set(b)

    print("Keys unique to namespace 1:")
    for k in sorted(ka - kb):
        print(f"{k}\t{a[k]}")
    print()
    print("Keys unique to namespace 2:")
    for k in sorted(kb - ka):
        print(f"{k}\t{b[k]}")
    print()
    print("Keys with different values:")
    for k in sorted(ka & kb):
        if a[k] != b[k]:
            print(f"{k}\t{a[k]}\t{b[k]}")


if __name__ == "__main__":
    cli_main()
