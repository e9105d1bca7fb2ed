"""Back-translation data tools (reference examples/backtranslation/
extract_bt_data.py + deduplicate_lines.py), as one CLI:

    python -m fbk_fairseq_st_tpu.scripts.bt_tools extract \\
        --output PREFIX --srclang de --tgtlang en [--minlen N] [--maxlen N] \\
        [--ratio R] GEN_OUT [GEN_OUT ...]
    python -m fbk_fairseq_st_tpu.scripts.bt_tools dedup FILE [FILE ...]

``extract`` pulls (back-translated source, original target) pairs out of a
generate-CLI stdout: the hypothesis H- line becomes the new source, the S-
line the target; only the first hypothesis per sentence is kept, with
optional length/ratio filters. ``dedup`` streams unique lines (md5-hashed)
to stdout.
"""

from __future__ import annotations

import argparse
import fileinput
import hashlib
import sys


def _field(parts, index, default=""):
    return parts[index] if len(parts) > index else default


def cmd_extract(args) -> None:
    def keep(src: str, tgt: str) -> bool:
        srclen = len(src.split(" ")) if src else 0
        tgtlen = len(tgt.split(" ")) if tgt else 0
        if args.minlen is not None and min(srclen, tgtlen) < args.minlen:
            return False
        if args.maxlen is not None and max(srclen, tgtlen) > args.maxlen:
            return False
        if args.ratio is not None:
            lo = max(min(srclen, tgtlen), 1)
            if max(srclen, tgtlen) / float(lo) > args.ratio:
                return False
        return True

    tgt = None
    n = 0
    with open(f"{args.output}.{args.srclang}", "w") as src_h, open(
        f"{args.output}.{args.tgtlang}", "w"
    ) as tgt_h, fileinput.input(args.files) as lines:
        for line in lines:
            if line.startswith("S-"):
                tgt = _field(line.rstrip().split("\t"), 1)
            elif line.startswith("H-") and tgt is not None:
                src = _field(line.rstrip().split("\t"), 2)
                if keep(src, tgt):
                    print(src, file=src_h)
                    print(tgt, file=tgt_h)
                    n += 1
                tgt = None  # first hypothesis only
    print(f"extracted {n} pairs", file=sys.stderr)


def cmd_dedup(args) -> None:
    seen = set()
    kept = total = 0
    with fileinput.input(args.files, mode="rb") as lines:
        for raw in lines:
            total += 1
            digest = hashlib.md5(raw).hexdigest()
            if digest not in seen:
                seen.add(digest)
                sys.stdout.buffer.write(raw)
                kept += 1
    print(f"kept {kept}/{total} lines", file=sys.stderr)


def cli_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract")
    p.add_argument("--output", required=True, help="output prefix")
    p.add_argument("--srclang", required=True)
    p.add_argument("--tgtlang", required=True)
    p.add_argument("--minlen", type=int)
    p.add_argument("--maxlen", type=int)
    p.add_argument("--ratio", type=float)
    p.add_argument("files", nargs="*")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("dedup")
    p.add_argument("files", nargs="*")
    p.set_defaults(fn=cmd_dedup)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    cli_main()
