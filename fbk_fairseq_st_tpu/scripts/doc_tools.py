"""Document-corpus utilities (reference scripts/count_docs.py,
shard_docs.py, split_train_valid_docs.py): operate on text files where an
empty line separates documents (the LM/BERT pretraining corpus format).

One CLI with subcommands instead of three scripts:

    python -m fbk_fairseq_st_tpu.scripts.doc_tools count INPUT [--gzip]
    python -m fbk_fairseq_st_tpu.scripts.doc_tools shard INPUT --num-shards N
    python -m fbk_fairseq_st_tpu.scripts.doc_tools split INPUT TRAIN_OUT \\
        VALID_OUT -k K [--lines] [--seed N]
"""

from __future__ import annotations

import argparse
import contextlib
import gzip
import random
import sys
from typing import Iterator, List


def iter_docs(path: str, gzipped: bool = False) -> Iterator[List[str]]:
    """Yield documents (lists of lines, newline included) from *path*."""
    opener = (lambda: gzip.open(path, "rt")) if gzipped else (
        lambda: open(path, "r", encoding="utf-8")
    )
    with opener() as h:
        doc: List[str] = []
        for line in h:
            if line.strip() == "":
                yield doc
                doc = []
            else:
                doc.append(line)
        if doc:
            yield doc


def write_docs(path: str, docs, line_mode: bool = False) -> None:
    with open(path, "w", encoding="utf-8") as out:
        first = True
        for doc in docs:
            if not first and not line_mode:
                out.write("\n")
            first = False
            out.writelines(doc)


def cmd_count(args) -> None:
    n_docs = 0
    total_lines = 0
    total_toks = 0
    for doc in iter_docs(args.input, args.gzip):
        n_docs += 1
        total_lines += len(doc)
        total_toks += sum(len(line.split()) for line in doc)
    print(f"found {n_docs} docs")
    if n_docs:
        print(f"average num lines per doc: {total_lines / n_docs}")
        print(f"average num toks per doc: {total_toks / n_docs}")


def cmd_shard(args) -> None:
    assert args.num_shards > 1
    with contextlib.ExitStack() as stack:
        outputs = [
            stack.enter_context(
                open(f"{args.input}.shard{i}", "w", encoding="utf-8")
            )
            for i in range(args.num_shards)
        ]
        first = [True] * args.num_shards
        for n, doc in enumerate(iter_docs(args.input)):
            i = n % args.num_shards
            if not first[i]:
                outputs[i].write("\n")
            first[i] = False
            outputs[i].writelines(doc)


def cmd_split(args) -> None:
    """Reservoir-sample K docs (or lines) into TRAIN_OUT, rest to
    VALID_OUT — the reference's in-memory reservoir algorithm."""
    rng = random.Random(args.seed)
    sample: List[List[str]] = []
    remainder: List[List[str]] = []

    units: Iterator[List[str]]
    if args.lines:
        units = (
            [line]
            for doc in iter_docs(args.input)
            for line in doc
        )
    else:
        units = iter_docs(args.input)

    for n, unit in enumerate(units):
        if len(sample) < args.k:
            sample.append(unit)
        else:
            j = rng.randrange(n + 1)
            if j < args.k:
                remainder.append(sample[j])
                sample[j] = unit
            else:
                remainder.append(unit)
    if len(sample) != args.k:
        print(
            f"warning: only {len(sample)} units available for a sample "
            f"of {args.k}", file=sys.stderr,
        )
    write_docs(args.sample_output, sample, args.lines)
    write_docs(args.remainder_output, remainder, args.lines)


def cli_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("count")
    p.add_argument("input")
    p.add_argument("--gzip", action="store_true")
    p.set_defaults(fn=cmd_count)

    p = sub.add_parser("shard")
    p.add_argument("input")
    p.add_argument("--num-shards", type=int, required=True)
    p.set_defaults(fn=cmd_shard)

    p = sub.add_parser("split")
    p.add_argument("input")
    p.add_argument("sample_output")
    p.add_argument("remainder_output")
    p.add_argument("-k", type=int, required=True)
    p.add_argument("--lines", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_split)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    cli_main()
