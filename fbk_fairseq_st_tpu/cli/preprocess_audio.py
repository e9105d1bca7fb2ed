"""Audio preprocessing: pack precomputed fbank tensors into indexed datasets.

Counterpart of examples/speech_recognition/preprocess_audio.py:61-121: reads
.npz streams (shape header then one array per utterance) or .h5 files and
writes ``<split>.npz.{bin,idx}`` float32 TNT datasets via
AudioIndexedDatasetBuilder. Fbank extraction itself is out of scope here as
in the reference (external torchaudio/kaldi pipelines).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

from ..data.indexed_dataset import AudioIndexedDatasetBuilder

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.preprocess_audio")


def reader_npz(path):
    """Stream reader for the reference .npz format
    (preprocess_audio.py:30-36): a shape array then shape[0] arrays."""
    with open(path, "rb") as f:
        shape = np.load(f)
        for _ in range(int(shape[0])):
            yield np.load(f)


def reader_h5(path):
    import h5py

    with h5py.File(path, "r") as file:
        key_list = sorted(file.keys(), key=lambda x: int(x))
        for key in key_list:
            yield file[str(key)][()]


SUPPORTED_TYPES = {"h5": reader_h5, "npz": reader_npz}


def main(args):
    reader = SUPPORTED_TYPES[args.format]
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".", exist_ok=True)
    builder = AudioIndexedDatasetBuilder(args.output + ".bin")
    n = 0
    for tensor in reader(args.audio_features):
        builder.add_item(np.asarray(tensor, dtype=np.float32))
        n += 1
    builder.finalize(args.output + ".idx")
    logger.info(f"Wrote {n} utterances to {args.output}.{{bin,idx}}")


def cli_main(input_args=None):
    parser = argparse.ArgumentParser(
        description="Pack precomputed audio features into indexed datasets"
    )
    parser.add_argument("--audio-features", required=True,
                        help="input .npz/.h5 file with the fbank tensors")
    parser.add_argument("--format", default="npz", choices=sorted(SUPPORTED_TYPES))
    parser.add_argument("--output", required=True,
                        help="output prefix (writes <output>.bin/.idx), e.g. "
                        "data-bin/train.npz")
    args = parser.parse_args(input_args)
    main(args)


if __name__ == "__main__":
    cli_main()
