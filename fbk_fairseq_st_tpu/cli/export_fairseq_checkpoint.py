"""Export a framework checkpoint to the fork's torch.save layout (the
inverse of cli/import_fairseq_checkpoint): models trained here become
loadable by the reference fork (load with strict=False there — the fork's
bookkeeping buffers are not emitted).

Usage:
    python -m fbk_fairseq_st_tpu.cli.export_fairseq_checkpoint \
        /path/to/framework_checkpoint.pt /path/to/fork_checkpoint.pt
"""

from __future__ import annotations

import argparse
import logging


def cli_main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="Convert a framework checkpoint to the fork's format"
    )
    parser.add_argument("input", help="framework checkpoint (pickle/sharded)")
    parser.add_argument("output", help="output torch .pt path")
    args = parser.parse_args(argv)

    from ..utils.fairseq_interop import export_fairseq_checkpoint

    n = export_fairseq_checkpoint(args.input, args.output)
    print(f"| exported {args.input} -> {args.output} ({n} tensors)")


if __name__ == "__main__":
    cli_main()
