"""Checkpoint-directory garbage collection (reference scripts/rm_pt.py):
walk a tree of training runs and delete checkpoint files, keeping
checkpoint_last/best (unless told otherwise), the newest N, and every Nth.

Differences from the reference tool: ``--yes`` replaces the interactive
Y/N prompt for scripted use (without it the plan is printed and nothing is
deleted — a dry run by default instead of a blocking prompt), and sharded
checkpoint DIRECTORIES (train/sharded_checkpoint.py) are handled alongside
single files.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
from typing import List, Tuple

PT_ANY = re.compile(r"checkpoint(\d+|_\d+_\d+|_[a-z]+)\.pt")
PT_EPOCH = re.compile(r"checkpoint(\d+)\.pt")
PT_UPDATE = re.compile(r"checkpoint_\d+_(\d+)\.pt")


def numbered_checkpoints(files) -> List[Tuple[int, str]]:
    out = []
    for f in files:
        m = PT_EPOCH.fullmatch(f) or PT_UPDATE.fullmatch(f)
        if m is not None:
            out.append((int(m.group(1)), m.group(0)))
    return out


def last_n(files, n: int) -> List[str]:
    return [f for _, f in sorted(numbered_checkpoints(files), reverse=True)[:n]]


def every_n(files, n: int) -> List[str]:
    return [f for num, f in numbered_checkpoints(files) if num % n == 0]


def plan(root_dir: str, args):
    keep, delete = [], []
    for root, _subdirs, files in os.walk(root_dir):
        entries = set(files)
        # sharded checkpoints are directories named like the files
        for d in _subdirs:
            if PT_ANY.fullmatch(d):
                entries.add(d)
        names = sorted(entries)
        to_save = set()
        if args.save_last > 0:
            to_save.update(last_n(names, args.save_last))
        if args.save_every > 0:
            to_save.update(every_n(names, args.save_every))
        for name in names:
            if not PT_ANY.fullmatch(name):
                continue
            path = os.path.join(root, name)
            preserved = (
                not os.path.basename(root).startswith("test_")
                or args.preserve_test
            ) and (
                (name == "checkpoint_last.pt" and not args.delete_last)
                or (name == "checkpoint_best.pt" and not args.delete_best)
                or name in to_save
            )
            (keep if preserved else delete).append(path)
    return sorted(keep), sorted(delete)


def cli_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("roots", nargs="+", help="run directories to walk")
    parser.add_argument("--save-last", type=int, default=0,
                        help="keep the newest N numbered checkpoints")
    parser.add_argument("--save-every", type=int, default=0,
                        help="keep every checkpoint whose number %% N == 0")
    parser.add_argument("--delete-last", action="store_true")
    parser.add_argument("--delete-best", action="store_true")
    parser.add_argument("--preserve-test", action="store_true",
                        help="also keep checkpoints under test_* dirs")
    parser.add_argument("--yes", action="store_true",
                        help="actually delete (default: print the plan)")
    args = parser.parse_args(argv)

    all_keep, all_delete = [], []
    for root in args.roots:
        k, d = plan(root, args)
        all_keep += k
        all_delete += d

    if not all_delete:
        print("Nothing to do.")
        return
    for f in all_keep:
        print("keep:   " + f)
    for f in all_delete:
        print("delete: " + f)
    if not args.yes:
        print("(dry run — pass --yes to delete)", file=sys.stderr)
        return
    for f in all_delete:
        if os.path.isdir(f):
            shutil.rmtree(f)
        else:
            os.remove(f)
    print(f"deleted {len(all_delete)} checkpoints")


if __name__ == "__main__":
    cli_main()
