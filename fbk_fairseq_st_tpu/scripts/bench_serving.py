"""Measure the serving-export path against the live generator.

    python -m fbk_fairseq_st_tpu.scripts.bench_serving \
        --arch conv_transformer_big [--batch 32 --frames 512 --beam 5]

Builds the arch with random weights (weights don't change decode cost),
exports a (batch, frames) serving artifact next to a temp dir, loads it
through the model-code-free runtime, and times steady-state batched
decode for BOTH paths on identical inputs. Prints one JSON line:
export_s, artifact_mb, load_s, warmup_s, serving decode latency + RTF,
live-generator RTF, and their ratio. RTF convention matches bench.py
(wall seconds / audio seconds at a 10 ms hop).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arch", default="conv_transformer_big")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--frames", type=int, default=512)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--max-len-b", type=int, default=100)
    parser.add_argument("--vocab", type=int, default=8000)
    parser.add_argument("--feat-dim", type=int, default=40)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--concurrency", type=int, default=0, metavar="N",
                        help="also measure N concurrent single-utterance "
                             "clients, sequential vs dynamic batching "
                             "(--batch-window-ms equivalent)")
    parser.add_argument("--out", default=None,
                        help="artifact dir (default: fresh temp dir)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    sys.path.insert(0, os.getcwd())
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.generation import SequenceGenerator
    from fbk_fairseq_st_tpu.serving import ServingModel, export_artifact

    d = Dictionary()
    for i in range(args.vocab - 4):
        d.add_symbol(f"tok{i}")
    d.finalize(padding_factor=8)

    class T:
        target_dictionary = d
        source_dictionary = None

    margs = argparse.Namespace(
        arch=args.arch, criterion="label_smoothed_cross_entropy",
        input_feat_per_channel=args.feat_dim,
        max_source_positions=2048, max_target_positions=512,
    )
    registry.apply_architecture(margs)
    model = registry.build_model(margs, T())
    variables = model.init(jax.random.PRNGKey(0))
    gen = SequenceGenerator(d, beam_size=args.beam, max_len_b=args.max_len_b)

    out_dir = args.out or tempfile.mkdtemp(prefix="serving_bench_")
    platform = jax.default_backend()
    t0 = time.perf_counter()
    export_artifact(
        [(model, variables)], gen, [(args.batch, args.frames)], out_dir,
        tgt_dict=d,
        src_spec={"kind": "audio", "dtype": "float32",
                  "suffix": [args.feat_dim]},
        platforms=(platform,),
    )
    export_s = time.perf_counter() - t0
    artifact_mb = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(out_dir) for f in files
    ) / 1e6

    t0 = time.perf_counter()
    sm = ServingModel.load(out_dir)
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sm.warmup()
    warmup_s = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    lengths = rng.randint(
        int(args.frames * 0.8), args.frames + 1, size=args.batch
    )
    lengths[0] = args.frames
    feats = [
        rng.randn(int(L), args.feat_dim).astype(np.float32) for L in lengths
    ]
    audio_seconds = float(lengths.sum()) * 0.01  # 10 ms hop

    sm.translate(feats, nbest=1, detokenize=False)  # steady-state entry
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        sm.translate(feats, nbest=1, detokenize=False)
    serving_s = (time.perf_counter() - t0) / args.repeats

    # live path on identical inputs, padded to the same bucket shape
    src = np.zeros((args.batch, args.frames, args.feat_dim), np.float32)
    for i, f in enumerate(feats):
        src[i, : f.shape[0]] = f
    sample = {
        "net_input": {
            "src_tokens": jax.device_put(src),
            "src_lengths": jax.device_put(lengths.astype(np.int64)),
        },
        "target": None,
        "id": np.arange(args.batch),
    }
    gen.generate([(model, variables)], sample)  # compile
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        gen.generate([(model, variables)], sample)
    live_s = (time.perf_counter() - t0) / args.repeats

    concurrency = None
    if args.concurrency:
        # N concurrent single-utterance clients: every request dispatched
        # alone (the serve CLI without --batch-window-ms) vs coalesced by
        # the DynamicBatcher. Total wall time for all N requests.
        import threading

        from fbk_fairseq_st_tpu.serving.batcher import DynamicBatcher

        n = args.concurrency
        singles = feats[:1] * n if len(feats) == 1 else (feats * n)[:n]

        def run_clients(fn):
            errs = []

            def client(i):
                try:
                    fn(singles[i])
                except Exception as e:  # pragma: no cover
                    errs.append(e)

            threads = [
                threading.Thread(target=client, args=(i,)) for i in range(n)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            assert not errs, errs[0]
            return wall

        # unbatched: concurrent threads each call translate() directly
        run_clients(lambda x: sm.translate([x], nbest=1, detokenize=False))
        seq_wall = min(
            run_clients(
                lambda x: sm.translate([x], nbest=1, detokenize=False)
            )
            for _ in range(3)
        )
        batcher = DynamicBatcher(sm, window_ms=10.0)
        try:
            run_clients(
                lambda x: batcher.submit_many([x], nbest=1)
            )
            bat_wall = min(
                run_clients(lambda x: batcher.submit_many([x], nbest=1))
                for _ in range(3)
            )
            dispatches = batcher.batches_dispatched
        finally:
            batcher.close()
        concurrency = {
            "clients": n,
            "unbatched_wall_s": round(seq_wall, 4),
            "batched_wall_s": round(bat_wall, 4),
            "speedup": round(seq_wall / bat_wall, 2),
            "dispatches_batched": dispatches,
        }

    print(json.dumps({
        "arch": args.arch,
        "platform": platform,
        "bucket": [args.batch, args.frames],
        "beam": args.beam,
        "export_s": round(export_s, 2),
        "artifact_mb": round(artifact_mb, 1),
        "load_s": round(load_s, 2),
        "warmup_s": round(warmup_s, 2),
        "serving_batch_latency_s": round(serving_s, 4),
        "serving_rtf": round(serving_s / audio_seconds, 5),
        "live_rtf": round(live_s / audio_seconds, 5),
        "serving_vs_live": round(serving_s / live_s, 3),
        "concurrency": concurrency,
        "artifact_dir": out_dir,
    }))


if __name__ == "__main__":
    main()
