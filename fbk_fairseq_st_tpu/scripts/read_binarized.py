#!/usr/bin/python3
"""Dump a binarized dataset back to text (reference scripts/read_binarized.py)."""

from __future__ import annotations

import argparse

from ..data.dictionary import Dictionary
from ..data.indexed_dataset import infer_dataset_impl, make_dataset


def cli_main(input_args=None):
    parser = argparse.ArgumentParser(
        description="writes text from binarized data like train.bin/idx"
    )
    parser.add_argument("--dataset-impl",
                        choices=["raw", "lazy", "cached", "mmap"], default=None)
    parser.add_argument("--dict", metavar="FP", help="dictionary path",
                        default=None)
    parser.add_argument("--input", metavar="FP", required=True,
                        help="binarized file prefix to read")
    args = parser.parse_args(input_args)

    dictionary = Dictionary.load(args.dict) if args.dict is not None else None
    impl = args.dataset_impl or infer_dataset_impl(args.input) or "cached"
    dataset = make_dataset(
        args.input, impl, fix_lua_indexing=True, dictionary=dictionary
    )
    for i in range(len(dataset)):
        if dictionary is None:
            print(" ".join(map(str, dataset[i])))
        else:
            print(dictionary.string(dataset[i]))


if __name__ == "__main__":
    cli_main()
