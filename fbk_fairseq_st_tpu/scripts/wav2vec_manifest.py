"""Build train/valid TSV manifests for raw-audio pretraining (reference
examples/wav2vec/wav2vec_manifest.py): first line is the root dir, then
``relative/path.wav<TAB>num_frames`` rows, randomly split by
``--valid-percent``. Reads frame counts with the in-repo wav reader (the
reference needs soundfile).

    python -m fbk_fairseq_st_tpu.scripts.wav2vec_manifest ROOT \\
        --dest DIR [--ext wav] [--valid-percent 0.01] [--seed 42] \\
        [--path-must-contain FRAG]
"""

from __future__ import annotations

import argparse
import glob
import os
import random


def _num_frames(path: str) -> int:
    try:
        import soundfile

        return int(soundfile.info(path).frames)
    except ImportError:
        from ..data.audio import read_wav

        samples, _rate = read_wav(path)
        return int(len(samples))


def cli_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("root", metavar="DIR")
    parser.add_argument("--valid-percent", default=0.01, type=float)
    parser.add_argument("--dest", default=".", metavar="DIR")
    parser.add_argument("--ext", default="wav")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--path-must-contain", default=None)
    args = parser.parse_args(argv)
    assert 0 <= args.valid_percent <= 1

    root = os.path.realpath(args.root)
    rng = random.Random(args.seed)
    os.makedirs(args.dest, exist_ok=True)
    with open(os.path.join(args.dest, "train.tsv"), "w") as train_f, open(
        os.path.join(args.dest, "valid.tsv"), "w"
    ) as valid_f:
        print(root, file=train_f)
        print(root, file=valid_f)
        pattern = os.path.join(root, "**/*." + args.ext)
        for fname in sorted(glob.iglob(pattern, recursive=True)):
            path = os.path.realpath(fname)
            if args.path_must_contain and args.path_must_contain not in path:
                continue
            frames = _num_frames(path)
            dest = train_f if rng.random() > args.valid_percent else valid_f
            print(
                "{}\t{}".format(os.path.relpath(path, root), frames),
                file=dest,
            )


if __name__ == "__main__":
    cli_main()
