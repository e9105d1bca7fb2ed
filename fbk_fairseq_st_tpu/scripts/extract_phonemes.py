"""Phoneme-target extraction for MuST-C-style corpora (reference
scripts/extract_phonemes.py): combine a word->phoneme dictionary
(position-suffixed _B/_I/_E/_S), Gentle forced-alignment JSONs
(one ``<talk>.json`` per talk with per-word phone timings), and the
corpus YAML segment definitions into per-sentence phoneme strings plus
end-offset timings.

Outputs ``<prefix>.ph`` (space-separated phonemes per sentence) and
``<prefix>.ph_times`` (space-separated end offsets; unaligned words get
``last/next`` interval strings, as in the reference).

    python -m fbk_fairseq_st_tpu.scripts.extract_phonemes \\
        PHONEME_DICT SEGMENTS_YAML GENTLE_JSON_DIR OUTPUT_PREFIX
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

UNK_PHONEME = "oov"


def load_phoneme_dict(path: str) -> Dict[str, List[str]]:
    """CMU-style lexicon: WORD <id?> PH PH ...; phones get _S (singleton)
    or _B/_I/_E position suffixes."""
    table: Dict[str, List[str]] = {}
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            tokens = line.split()
            if len(tokens) < 3:
                continue
            phones = tokens[2:]
            if len(phones) == 1:
                phones = [phones[0] + "_S"]
            else:
                phones = [
                    ph + ("_B" if i == 0 else
                          "_E" if i == len(phones) - 1 else "_I")
                    for i, ph in enumerate(phones)
                ]
            table[tokens[0]] = phones
    return table


class GentleWords:
    """Per-talk word alignments, one JSON kept in memory at a time (the
    corpus is sorted by talk, so an LRU of one suffices)."""

    def __init__(self, json_dir: str):
        self.json_dir = json_dir
        self._talk = None
        self._words = None

    def get(self, talk_id: str):
        if talk_id != self._talk:
            with open(os.path.join(self.json_dir, talk_id + ".json")) as f:
                self._words = json.load(f)["words"]
            self._talk = talk_id
        return self._words


def _aligned_word_phonemes(word, sentence_start: float):
    out = []
    t = round(word["start"], 2) - sentence_start
    for ph in word["phones"]:
        t += round(ph["duration"], 2)
        out.append({"phoneme": ph["phone"], "end_offset": t})
    return out


def extract_sentence(words, sent, lexicon) -> List[dict]:
    start = round(sent["offset"], 2)
    end = start + round(sent["duration"], 2)
    phones: List[dict] = []
    in_sentence = False
    for i, w in enumerate(words):
        if w["case"] == "success":
            if round(w["start"], 2) < start:
                continue
            if round(w["start"], 2) >= end:
                break
            in_sentence = True
            phones.extend(_aligned_word_phonemes(w, start))
            # clamp overruns to the segment duration (reference behavior)
            duration = round(sent["duration"], 2)
            if round(float(phones[-1]["end_offset"]), 2) > duration:
                for ph in phones:
                    if (
                        isinstance(ph["end_offset"], float)
                        and ph["end_offset"] > duration
                    ):
                        ph["end_offset"] = duration
        else:
            if not in_sentence:
                continue
            # unaligned word: spread its lexicon phones over the gap to the
            # next aligned word, recorded as a "last/next" interval string
            last_known = (
                phones[-1]["end_offset"] if phones else start
            )
            next_known = None
            for nxt in words[i + 1:]:
                if nxt["case"] == "success":
                    next_known = nxt["start"]
                    break
            if next_known is None or next_known > end:
                next_known = end
            for ph in lexicon.get(w["word"].upper(), [UNK_PHONEME]):
                phones.append(
                    {
                        "phoneme": ph,
                        "end_offset": f"{last_known}/{next_known - start}",
                    }
                )
    return phones


def cli_main(argv=None) -> None:
    import yaml

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("phoneme_dict")
    parser.add_argument("segments_yaml")
    parser.add_argument("json_dir")
    parser.add_argument("output_prefix")
    args = parser.parse_args(argv)

    lexicon = load_phoneme_dict(args.phoneme_dict)
    with open(args.segments_yaml) as f:
        sentences = yaml.safe_load(f)
    talks = GentleWords(args.json_dir)

    results = []
    for n, sent in enumerate(sentences):
        words = talks.get(sent["wav"].split(".")[0])
        results.append(extract_sentence(words, sent, lexicon))
        if (n + 1) % 1000 == 0:
            print(f"Processed {n + 1}/{len(sentences)} sentences", flush=True)

    with open(args.output_prefix + ".ph", "w") as f:
        for phones in results:
            f.write(" ".join(ph["phoneme"] for ph in phones) + "\n")
    with open(args.output_prefix + ".ph_times", "w") as f:
        for phones in results:
            f.write(
                " ".join(str(ph["end_offset"]) for ph in phones) + "\n"
            )


if __name__ == "__main__":
    cli_main()
