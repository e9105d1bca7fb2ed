"""Import a fork (pytorch/fairseq-style) checkpoint into this framework.

Usage:
    python -m fbk_fairseq_st_tpu.cli.import_fairseq_checkpoint \
        /path/to/fork_checkpoint.pt /path/to/out_checkpoint.pt \
        [--model-overrides '{"arch": "..."}'] [--non-strict]

Reads the fork's torch.save layout (reference checkpoint_utils.py:166-214,
incl. the raw_state_dict_upgrade CTC-head migration,
conv_transformer.py:105-112), rebuilds the equivalent framework model from
the checkpointed args, ports every parameter, and writes a framework
checkpoint usable by cli/generate, cli/train --restore-file, etc.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

logger = logging.getLogger(__name__)


def get_parser():
    parser = argparse.ArgumentParser(
        description="Convert a fork .pt checkpoint to this framework's format"
    )
    parser.add_argument("input", help="fork checkpoint (.pt, torch.save)")
    parser.add_argument("output", help="output framework checkpoint path")
    parser.add_argument(
        "--model-overrides",
        default="{}",
        help="JSON dict of args to override before rebuilding the model "
        "(reference --model-overrides semantics)",
    )
    parser.add_argument(
        "--non-strict",
        action="store_true",
        help="keep random init for parameters with no fork counterpart "
        "instead of erroring",
    )
    return parser


def main(args) -> None:
    from ..utils.fairseq_interop import import_fairseq_checkpoint

    report = import_fairseq_checkpoint(
        args.input,
        args.output,
        arg_overrides=json.loads(args.model_overrides),
        strict=not args.non_strict,
    )
    if report["missing"]:
        print(
            f"| WARNING: {len(report['missing'])} parameters kept their "
            "random initialization:", file=sys.stderr,
        )
        for name in report["missing"]:
            print(f"|   {name}", file=sys.stderr)
    print(f"| imported {args.input} -> {args.output}")


def cli_main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    main(get_parser().parse_args(argv))


if __name__ == "__main__":
    cli_main()
