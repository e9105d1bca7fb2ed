"""Capture a jax.profiler trace of a bench train step and print the
HLO-category time/MXU breakdown (the table in PERF.md).

    python -m fbk_fairseq_st_tpu.scripts.profile_breakdown \
        --arch conv_transformer_big --steps 5 [--peak-tflops 197]

The reference has no profiler integration (SURVEY §5: meters only); this
is the TPU-native observability counterpart — one command turns "MFU is
0.31" into "21.9 ms matmuls at 60% MXU, 4.7 ms bandwidth-bound
elementwise, 4.7 ms layout copies, ...".
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile


def capture_trace(arch: str, steps: int, trace_dir: str,
                  batch: int = None, frames: int = None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import bench as B
    import jax
    import numpy as np

    batch = batch or B.BATCH
    frames = frames or B.FRAMES
    extra = (["--max-source-positions", str(frames)]
             if frames > 2048 else [])
    trainer, d = B._build(arch, extra)
    host = B._host_sample(d, np.random.RandomState(0), batch=batch,
                          frames=frames)
    staged = trainer.stage_sample(host)
    for _ in range(3):
        trainer.train_step([staged])
    jax.block_until_ready(trainer.train_state["params"])
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        trainer.train_step([staged])
    jax.block_until_ready(trainer.train_state["params"])
    jax.profiler.stop_trace()


def summarize(trace_dir: str, steps: int, peak_tflops: float,
              top_n: int = 10) -> dict:
    path = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.json.gz"))
    )[-1]
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
    cat = collections.defaultdict(float)
    flops = collections.defaultdict(float)
    top = collections.defaultdict(float)
    names = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        c = a.get("hlo_category", "?")
        d = e.get("dur", 0)
        cat[c] += d
        total += d
        flops[c] += float(a.get("model_flops", 0) or 0)
        top[(c, e["name"])] += d
        names[e["name"]] = a.get("long_name", "")[:140]
    rows = []
    for c, d in sorted(cat.items(), key=lambda kv: -kv[1]):
        mxu = (
            flops[c] / (d * 1e-6) / (peak_tflops * 1e12) * 100 if d else 0
        )
        rows.append(
            {
                "category": c,
                "ms_per_step": round(d / steps / 1000, 2),
                "pct": round(100 * d / max(total, 1), 1),
                "mxu_pct": round(mxu, 1),
            }
        )
    top_ops = [
        {
            "ms_per_step": round(d / steps / 1000, 2),
            "category": c,
            "op": names[n],
        }
        for (c, n), d in sorted(top.items(), key=lambda kv: -kv[1])[:top_n]
    ]
    return {
        "device_ms_per_step": round(total / steps / 1000, 1),
        "categories": rows,
        "top_ops": top_ops,
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="conv_transformer_big")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch", type=int, default=None,
                        help="override bench batch (e.g. 8 for the "
                             "flash_longcontext_train config)")
    parser.add_argument("--frames", type=int, default=None,
                        help="override bench input frames (e.g. 8192)")
    parser.add_argument("--peak-tflops", type=float, default=197.0,
                        help="chip peak bf16 TFLOP/s (v5e: 197)")
    parser.add_argument("--trace-dir", default=None,
                        help="reuse an existing trace instead of capturing")
    parser.add_argument("--json", action="store_true",
                        help="print machine-readable JSON")
    args = parser.parse_args(argv)

    trace_dir = args.trace_dir
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix="profile_breakdown_")
        capture_trace(args.arch, args.steps, trace_dir,
                      batch=args.batch, frames=args.frames)
    summary = summarize(trace_dir, args.steps, args.peak_tflops)
    if args.json:
        print(json.dumps(summary))
        return
    print(f"device time: {summary['device_ms_per_step']} ms/step")
    print(f"{'category':<28}{'ms/step':>9}{'%':>7}{'MXU%':>7}")
    for r in summary["categories"]:
        print(
            f"{r['category']:<28}{r['ms_per_step']:>9.2f}"
            f"{r['pct']:>6.1f}%{r['mxu_pct']:>6.1f}%"
        )
    print("\ntop ops:")
    for t in summary["top_ops"]:
        print(f"  {t['ms_per_step']:6.2f} ms [{t['category']}] "
              f"{t['op'][:100]}")


if __name__ == "__main__":
    main()
