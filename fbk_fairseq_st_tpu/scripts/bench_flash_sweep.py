"""Flash-kernel sweep at the longcontext-train shapes (PERF.md r5).

Measures, on the live chip, the three levers for the S>=2048 regime
where the flash path is the only runnable attention:

  * split vs FUSED backward (_bwd_impl vs _bwd_fused_impl);
  * (t_block, s_block) tile shapes including full-S kv tiles
    (s_block = S -> single-pass softmax, no online rescale);
  * the real dispatch shapes: bh=32 non-causal (the 8x8192-frame
    longcontext train config's encoder self-attention) plus bh=64
    causal for continuity with the PERF.md round-4 tables.

Run:  python -m fbk_fairseq_st_tpu.scripts.bench_flash_sweep
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu.ops.pallas import attention_kernel as K


def _fwd_single_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref, *,
                       causal, scale):
    """Candidate: whole-S kv tile (n_j == 1) -> plain softmax, no online
    rescale, no m/l scratch round-trips, accumulator written straight to
    the output block."""
    import jax.lax as lax
    from fbk_fairseq_st_tpu.ops.pallas.attention_kernel import (
        NEG_INF,
        _dot,
    )

    i = K.pl.program_id(1)
    t_block = q_ref.shape[1]
    q0 = i * t_block
    q = q_ref[0]
    kk = k_ref[0]
    bias = bias_ref[0, 0].astype(jnp.float32)
    scores = _dot(q, kk, ((1,), (1,))) * scale + bias[None, :]
    if causal:
        rows = q0 + lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(cols <= rows, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    out_ref[0] = _dot(
        (p / jnp.maximum(l, 1e-30)).astype(v_ref.dtype), v_ref[0],
        ((1,), (0,)),
    ).astype(out_ref.dtype)
    lse_ref[0, 0] = m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30))


def fwd_single(q, k, v, bias, *, causal, scale, t_block):
    import functools as ft

    bh, t, d = q.shape
    s = k.shape[1]
    pl = K.pl
    pltpu = K.pltpu
    return pl.pallas_call(
        ft.partial(_fwd_single_kernel, causal=causal, scale=scale),
        grid=(bh, t // t_block),
        in_specs=[
            pl.BlockSpec((1, t_block, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t_block, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, t_block), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(q, k, v, bias[:, None, :])


def _mk(bh, s, d, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, s, d).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32)).astype(dtype)
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32)).astype(dtype)
    bias = jnp.zeros((bh, s), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    return q, k, v, bias, seed


def _time(fn, iters=20, reps=3):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def measure(bh, s, d, causal, t_block, s_block, fused):
    q, k, v, bias, seed = _mk(bh, s, d)
    scale = d ** -0.5

    fwd = jax.jit(functools.partial(
        K._fwd_impl, causal=causal, scale=scale, rate=0.0,
        t_block=t_block, s_block=s_block, interpret=False,
    ))
    out, lse = fwd(q, k, v, bias, seed)
    g = jnp.ones_like(out)
    bwd_impl = K._bwd_fused_impl if fused else K._bwd_impl
    bwd = jax.jit(functools.partial(
        bwd_impl, causal=causal, scale=scale, rate=0.0,
        t_block=t_block, s_block=s_block, interpret=False,
    ))
    t_fwd = _time(lambda: fwd(q, k, v, bias, seed)[0])
    t_bwd = _time(lambda: bwd(q, k, v, bias, seed, out, lse, g)[0])
    return t_fwd, t_bwd


def measure_fwd_single(bh, s, d, causal, t_block):
    q, k, v, bias, _ = _mk(bh, s, d)
    scale = d ** -0.5
    fn = jax.jit(functools.partial(
        fwd_single, causal=causal, scale=scale, t_block=t_block,
    ))
    # correctness vs the production forward before timing
    ref_out, ref_lse = jax.jit(functools.partial(
        K._fwd_impl, causal=causal, scale=scale, rate=0.0,
        t_block=min(1024, s), s_block=min(1024, s), interpret=False,
    ))(q, k, v, bias, jnp.zeros((1,), jnp.int32))
    out, lse = fn(q, k, v, bias)
    err = float(jnp.abs(out.astype(jnp.float32)
                        - ref_out.astype(jnp.float32)).max())
    assert err < 2e-2, f"single-pass fwd mismatch: {err}"
    return _time(lambda: fn(q, k, v, bias)[0])


def main():
    d = 64
    print(f"{'shape':<26}{'tiles':<14}{'bwd':<7}"
          f"{'fwd ms':>8}{'bwd ms':>8}{'tot ms':>8}")
    for bh, s, causal in ((32, 2048, False), (64, 2048, True)):
        for t_block in (256, 512, 1024):
            try:
                t_f = measure_fwd_single(bh, s, d, causal, t_block)
                print(f"bh={bh} S={s} causal={int(causal)} "
                      f"  single-pass fwd t_block={t_block:>4}: "
                      f"{t_f:8.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"bh={bh} S={s} single-pass t_block={t_block}: "
                      f"{type(e).__name__}: {str(e)[:120]}")
        for t_block, s_block in (
            (1024, 1024), (512, 1024), (256, 1024),
            (1024, 2048), (512, 2048), (256, 2048),
        ):
            for fused in (False, True):
                try:
                    t_fwd, t_bwd = measure(
                        bh, s, d, causal, t_block, s_block, fused
                    )
                except Exception as e:  # noqa: BLE001 - sweep survives OOM
                    print(f"bh={bh} S={s} causal={causal}  "
                          f"({t_block},{s_block}) fused={fused}: "
                          f"{type(e).__name__}")
                    continue
                print(
                    f"bh={bh} S={s} causal={int(causal)} "
                    f"  ({t_block:>4},{s_block:>4})  "
                    f"{'fused' if fused else 'split':<7}"
                    f"{t_fwd:8.2f}{t_bwd:8.2f}{t_fwd + t_bwd:8.2f}"
                )


if __name__ == "__main__":
    main()
