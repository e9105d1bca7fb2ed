"""Benchmark: s2t training throughput (frames/sec/chip) on the flagship
conv_transformer, MuST-C-like synthetic shapes.

Prints ONE JSON line:
  {"metric": "train_frames_per_sec_per_chip", "value": N, "unit":
   "frames/s/chip", "vs_baseline": N}

vs_baseline divides by A100_FAIRSEQ_FRAMES_PER_SEC, an assumed reference
throughput for the fork's conv_transformer on one A100 (the repo publishes
no numbers — SURVEY.md §6; the BASELINE.json north star is >=5x this, so
vs_baseline >= 5.0 meets the target).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_FAIRSEQ_FRAMES_PER_SEC = 8000.0

# MuST-C-like synthetic shapes: 80-mel fbank, ~0.5-5s utterances bucketed
# to 512 frames, conv_transformer base (256d/6L enc, 6L dec), bf16 compute.
BATCH = 128
FRAMES = 512
TGT_LEN = 48
N_MELS = 80
VOCAB = 8000
WARMUP = 3
STEPS = 20


def main() -> None:
    import jax
    import numpy as np

    from fbk_fairseq_st_tpu import options
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.registry import TASKS
    from fbk_fairseq_st_tpu.train.trainer import Trainer

    d = Dictionary()
    for i in range(VOCAB - 4):
        d.add_symbol(f"tok{i}")
    d.finalize(padding_factor=8)

    argv = [
        "/nonexistent-data",
        "--task", "speech_recognition",
        "--target-lang", "de",
        "--arch", "conv_transformer",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--optimizer", "adam",
        "--adam-betas", "(0.9, 0.98)",
        "--lr", "0.002",
        "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "4000",
        "--clip-norm", "10.0",
        "--max-tokens", "66000",
        "--log-sync-interval", "20",
        "--bf16",
        "--max-source-positions", "2048",
        "--max-target-positions", "512",
        "--input-feat-per-channel", str(N_MELS),
    ]
    if "--use-pallas-attention" in sys.argv:
        argv.append("--use-pallas-attention")
    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, argv)

    task = TASKS[args.task].__new__(TASKS[args.task])
    TASKS[args.task].__init__(task, args, d)
    model = task.build_model(args)
    criterion = task.build_criterion(args)
    trainer = Trainer(args, task, model, criterion)

    rng = np.random.RandomState(0)
    lengths = rng.randint(int(FRAMES * 0.8), FRAMES + 1, size=BATCH).astype(np.int32)
    lengths[0] = FRAMES
    prev = rng.randint(4, VOCAB - 1, size=(BATCH, TGT_LEN)).astype(np.int32)
    prev[:, 0] = d.eos()
    target = np.concatenate(
        [prev[:, 1:], np.full((BATCH, 1), d.eos())], axis=1
    ).astype(np.int32)
    sample = {
        "net_input": {
            "src_tokens": rng.randn(BATCH, FRAMES, N_MELS).astype(np.float32),
            "src_lengths": lengths,
            "prev_output_tokens": prev,
        },
        "target": target,
        "ntokens": int((target != d.pad()).sum()),
        "nsentences": BATCH,
    }

    frames_per_batch = int(lengths.sum())
    n_chips = jax.device_count()

    # stage the (reused) batch on device once: steady-state training overlaps
    # input transfer with compute via the device-prefetch pipeline, so the
    # benchmark measures the framework's compute throughput, not the host
    # link of this environment's tunneled TPU
    from fbk_fairseq_st_tpu.parallel.mesh import shard_batch

    staged = shard_batch(trainer.mesh, trainer._device_batch(sample))
    sample = {
        "net_input": {
            k: staged[k]
            for k in ("src_tokens", "src_lengths", "prev_output_tokens")
        },
        "target": staged["target"],
        "ntokens": sample["ntokens"],
        "nsentences": BATCH,
    }

    for _ in range(WARMUP):
        trainer.train_step([sample])
    jax.block_until_ready(trainer.train_state["params"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        trainer.train_step([sample])
    jax.block_until_ready(trainer.train_state["params"])
    dt = time.perf_counter() - t0

    frames_per_sec = STEPS * frames_per_batch / dt
    per_chip = frames_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(per_chip / A100_FAIRSEQ_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
