"""Build symmetrized word alignments for a parallel corpus.

Counterpart of reference scripts/build_sym_alignment.py. The reference
shells out to TWO external toolchains: fast_align for the directional
alignments and mosesdecoder (symal + a perl driver) for symmetrization.
Here only fast_align remains external (it is the statistical aligner
itself); the symmetrization heuristics — grow-diag-final-and and friends —
are implemented natively below, removing the mosesdecoder dependency
entirely. Alternatively, precomputed directional alignment files can be
passed with --forward/--backward, in which case no external binary is
needed at all.

Outputs under --output_dir (same names as the reference):
    text.joined            source ||| target, one pair per line
    align.forward          fast_align forward pass (or copy of --forward)
    align.backward         fast_align reverse pass (or copy of --backward)
    aligned.sym_heuristic  symmetrized alignment, 'i-j' pairs per line
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from itertools import zip_longest


def parse_alignment(line: str):
    pairs = set()
    for tok in line.split():
        i, j = tok.split("-")
        pairs.add((int(i), int(j)))
    return pairs


def _neighbors(diag: bool):
    if diag:
        return [(-1, 0), (0, -1), (1, 0), (0, 1),
                (-1, -1), (-1, 1), (1, -1), (1, 1)]
    return [(-1, 0), (0, -1), (1, 0), (0, 1)]


def symmetrize(fwd, bwd, src_len: int, tgt_len: int,
               heuristic: str = "grow-diag-final-and"):
    """Symmetrize forward (src->tgt) and backward (also expressed as
    src-tgt pairs) alignments.

    Implements the Koehn et al. heuristics natively (the reference defers
    to mosesdecoder's symal): 'intersect', 'union', 'grow', 'grow-diag',
    'grow-final', 'grow-diag-final', 'grow-diag-final-and'.
    """
    if heuristic == "union":
        return fwd | bwd
    inter = fwd & bwd
    if heuristic == "intersect":
        return inter

    grow_diag = "diag" in heuristic
    final = "final" in heuristic
    final_and = heuristic.endswith("final-and")

    aligned = set(inter)
    union = fwd | bwd
    src_cov = {i for i, _ in aligned}
    tgt_cov = {j for _, j in aligned}

    # grow(-diag): repeatedly adopt union points neighboring the current
    # alignment when they cover a new source or target word
    changed = True
    while changed:
        changed = False
        for (i, j) in sorted(aligned):
            for di, dj in _neighbors(grow_diag):
                ni, nj = i + di, j + dj
                if (ni, nj) not in union or (ni, nj) in aligned:
                    continue
                if ni not in src_cov or nj not in tgt_cov:
                    aligned.add((ni, nj))
                    src_cov.add(ni)
                    tgt_cov.add(nj)
                    changed = True

    if final:
        for directional in (fwd, bwd):
            for (i, j) in sorted(directional):
                if (i, j) in aligned:
                    continue
                if final_and:
                    ok = i not in src_cov and j not in tgt_cov
                else:
                    ok = i not in src_cov or j not in tgt_cov
                if ok:
                    aligned.add((i, j))
                    src_cov.add(i)
                    tgt_cov.add(j)
    return aligned


def main():
    parser = argparse.ArgumentParser(
        description="symmetric alignment builder"
    )
    parser.add_argument("--fast_align_dir",
                        help="path to a fast_align build directory "
                        "(omit when passing --forward/--backward)")
    parser.add_argument("--sym_heuristic", default="grow-diag-final-and",
                        choices=["intersect", "union", "grow", "grow-diag",
                                 "grow-final", "grow-diag-final",
                                 "grow-diag-final-and"])
    parser.add_argument("--source_file", required=True)
    parser.add_argument("--target_file", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--forward",
                        help="precomputed forward alignment file "
                        "(i-j pairs per line, src->tgt)")
    parser.add_argument("--backward",
                        help="precomputed backward alignment file")
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    joined_file = os.path.join(args.output_dir, "text.joined")
    src_lines = open(args.source_file, encoding="utf-8").read().splitlines()
    tgt_lines = open(args.target_file, encoding="utf-8").read().splitlines()
    with open(joined_file, "w", encoding="utf-8") as joined:
        for s, t in zip_longest(src_lines, tgt_lines, fillvalue=""):
            print("{} ||| {}".format(s.strip(), t.strip()), file=joined)

    fwd_file = os.path.join(args.output_dir, "align.forward")
    bwd_file = os.path.join(args.output_dir, "align.backward")
    if args.forward and args.backward:
        shutil.copyfile(args.forward, fwd_file)
        shutil.copyfile(args.backward, bwd_file)
    else:
        if not args.fast_align_dir:
            parser.error(
                "need --fast_align_dir, or both --forward and --backward"
            )
        fast_align = os.path.join(args.fast_align_dir, "fast_align")
        with open(fwd_file, "w") as out:
            subprocess.run(
                [fast_align, "-i", joined_file, "-d", "-o", "-v"],
                stdout=out, check=True,
            )
        with open(bwd_file, "w") as out:
            subprocess.run(
                [fast_align, "-i", joined_file, "-d", "-o", "-v", "-r"],
                stdout=out, check=True,
            )

    out_file = os.path.join(args.output_dir, "aligned.sym_heuristic")
    with open(fwd_file) as ff, open(bwd_file) as bf, open(
        out_file, "w"
    ) as out:
        for fwd_line, bwd_line, s, t in zip_longest(
            ff, bf, src_lines, tgt_lines, fillvalue=""
        ):
            fwd = parse_alignment(fwd_line)
            bwd = parse_alignment(bwd_line)
            sym = symmetrize(
                fwd, bwd, len(s.split()), len(t.split()),
                args.sym_heuristic,
            )
            print(" ".join(f"{i}-{j}" for i, j in sorted(sym)), file=out)
    print(f"| wrote {out_file}")


if __name__ == "__main__":
    main()
