#!/usr/bin/python3
"""Re-align MuST-C targets to an automatic audio segmentation
(INTERSPEECH 2020 data prep).

Counterpart of examples/speech_recognition/scripts/resegment_data_mustc.py:
the original corpus has (audio segment, transcript, translation) triples;
an automatic segmenter produces different audio boundaries. For each new
segment, the overlapping original segments are found and the target text is
cut proportionally to the time overlap — a word-timing interpolation that
assumes words are uniformly distributed over their segment (the reference
additionally uses fast_align word alignments to snap cut points; this
implementation interpolates on both source and target sides and documents
that simplification).

Inputs: original segments yaml (list of {offset, duration, wav}), original
transcripts/translations (one per segment), new segments yaml. Outputs the
resegmented transcripts/translations (one per new segment).
"""

from __future__ import annotations

import argparse


def _load_yaml(path):
    try:
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    except ImportError:
        # minimal parser for the MuST-C '- {duration: d, offset: o, wav: w}'
        segs = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("- {"):
                    continue
                d = {}
                for kv in line[3:-1].split(","):
                    k, v = kv.split(":", 1)
                    d[k.strip()] = v.strip()
                segs.append(
                    {
                        "offset": float(d["offset"]),
                        "duration": float(d["duration"]),
                        "wav": d.get("wav", ""),
                    }
                )
        return segs


def _interval(seg):
    return float(seg["offset"]), float(seg["offset"]) + float(seg["duration"])


def _cut_words(words, start_frac: float, end_frac: float):
    n = len(words)
    lo = int(round(start_frac * n))
    hi = int(round(end_frac * n))
    return words[lo:hi]


def resegment(orig_segments, texts, new_segments):
    """For each new segment, concatenate the proportional cuts of every
    overlapping original segment's text."""
    out = []
    for new in new_segments:
        ns, ne = _interval(new)
        pieces = []
        for seg, text in zip(orig_segments, texts):
            if seg.get("wav") != new.get("wav"):
                continue
            os_, oe = _interval(seg)
            lo = max(ns, os_)
            hi = min(ne, oe)
            if hi <= lo:
                continue
            dur = max(oe - os_, 1e-6)
            words = text.split()
            pieces.extend(
                _cut_words(words, (lo - os_) / dur, (hi - os_) / dur)
            )
        out.append(" ".join(pieces))
    return out


def cli_main(input_args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--orig-yaml", required=True,
                        help="original segments yaml")
    parser.add_argument("--orig-text", required=True, nargs="+",
                        help="original text file(s) aligned with --orig-yaml "
                        "(e.g. transcripts and translations)")
    parser.add_argument("--new-yaml", required=True,
                        help="automatic segmentation yaml")
    parser.add_argument("--output", required=True, nargs="+",
                        help="output file(s), one per --orig-text")
    args = parser.parse_args(input_args)
    assert len(args.orig_text) == len(args.output)

    orig_segments = _load_yaml(args.orig_yaml)
    new_segments = _load_yaml(args.new_yaml)
    for text_path, out_path in zip(args.orig_text, args.output):
        with open(text_path, encoding="utf-8") as f:
            texts = [line.rstrip("\n") for line in f]
        assert len(texts) == len(orig_segments), (
            f"{text_path}: {len(texts)} lines vs {len(orig_segments)} segments"
        )
        resegmented = resegment(orig_segments, texts, new_segments)
        with open(out_path, "w", encoding="utf-8") as f:
            f.write("\n".join(resegmented) + "\n")


if __name__ == "__main__":
    cli_main()
