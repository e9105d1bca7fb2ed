"""Decode benchmark: batched beam search RTF on the flagship conv_transformer.

Prints one JSON line {"metric": "decode_rtf", ...}: real-time factor =
decode wall time / audio duration (frames are 10ms hops as in MuST-C
fbanks). The BASELINE.json north star is RTF <= 0.05 at BLEU parity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 32
FRAMES = 512
N_MELS = 80
VOCAB = 8000
BEAM = 5
MAX_LEN_B = 100
FRAME_SECONDS = 0.01  # 10ms hop
REPEATS = 5


def main() -> None:
    import argparse

    import jax
    import numpy as np

    from fbk_fairseq_st_tpu.options import enable_compilation_cache

    # persistent XLA cache, opt-in via env (see bench.py note)
    enable_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR"))

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    d = Dictionary()
    for i in range(VOCAB - 4):
        d.add_symbol(f"tok{i}")
    d.finalize(padding_factor=8)

    class T:
        target_dictionary = d
        source_dictionary = None

    args = argparse.Namespace(arch="conv_transformer", criterion="label_smoothed_cross_entropy")
    args.input_feat_per_channel = N_MELS
    args.max_source_positions = 2048
    args.max_target_positions = 512
    registry.apply_architecture(args)
    model = registry.build_model(args, T())
    variables = model.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    lengths = rng.randint(int(FRAMES * 0.8), FRAMES + 1, size=BATCH).astype(np.int64)
    lengths[0] = FRAMES
    sample = {
        "net_input": {
            # staged once: steady-state serving overlaps input transfer
            "src_tokens": jax.device_put(
                rng.randn(BATCH, FRAMES, N_MELS).astype(np.float32)
            ),
            "src_lengths": jax.device_put(lengths),
        },
        "target": None,
        "id": np.arange(BATCH),
    }
    gen = SequenceGenerator(d, beam_size=BEAM, max_len_b=MAX_LEN_B)

    gen.generate([(model, variables)], sample)  # compile
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        hypos = gen.generate([(model, variables)], sample)
    dt = (time.perf_counter() - t0) / REPEATS

    audio_seconds = float(lengths.sum()) * FRAME_SECONDS
    rtf = dt / audio_seconds
    print(
        json.dumps(
            {
                "metric": "decode_rtf",
                "value": round(rtf, 5),
                "unit": "s_decode/s_audio",
                "vs_baseline": round(0.05 / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
