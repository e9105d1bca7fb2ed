"""Experiment (PERF.md §4, attack #3 on the base-config conv frontend):
space-to-depth reformulation of the frontend's FIRST conv.

The base config's conv1 is a stride-2 3x3 conv over (B, T, 80, 1) — a
9-deep contraction, inherently MXU-hostile (the systolic array contracts
128 lanes; depth 9 uses <10% of them). Packing 2x2 input cells into 4
channels ("space-to-depth") turns it into a stride-1 2x2 conv over
(B, T/2, 40, 4) — a 16-deep contraction over a quarter-resolution grid,
mathematically identical with rearranged weights (9 of the 16 taps carry
the original kernel, 7 are zero; the packed window covers a 4x4 input
region of which the original 3x3 window is a subset).

Run:  python -m fbk_fairseq_st_tpu.scripts.bench_conv_s2d

Measures fwd+bwd of both formulations at the bench base shapes and
checks numerical equivalence. Ship-or-reject evidence for PERF.md.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv_orig(w, x):
    """x: (B, T, F, 1), w: (3, 3, 1, 64); stride 2, symmetric pad 1."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=DIMNUMS,
    )


def space_to_depth(x):
    """(B, T, F, 1) -> (B, T/2, F/2, 4), cell channel = (t%2)*2 + f%2."""
    b, t, f, _ = x.shape
    x = x.reshape(b, t // 2, 2, f // 2, 2)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, t // 2, f // 2, 4)


def pack_weights(w):
    """(3, 3, 1, 64) -> (2, 2, 4, 64) packed-layout kernel.

    Output (i, j) of the original conv reads input (2i+dt, 2j+df),
    dt/df in {-1, 0, 1}. In the packed grid, a 2x2 window anchored at
    (i-1, j-1) holds input rows 2i-2..2i+1 / cols 2j-2..2j+1: packed tap
    (pi, ri) addresses input offset dt = 2*pi + ri - 2, so
    dt=-1 -> (0,1), dt=0 -> (1,0), dt=1 -> (1,1) ((0,0) is the unused
    dt=-2 corner, left zero). Same map on the freq axis.
    """
    w2 = np.zeros((2, 2, 4, w.shape[-1]), np.float32)
    tap = {-1: (0, 1), 0: (1, 0), 1: (1, 1)}
    for dt in (-1, 0, 1):
        for df in (-1, 0, 1):
            pi, ri = tap[dt]
            pj, rj = tap[df]
            w2[pi, pj, ri * 2 + rj] = np.asarray(w)[dt + 1, df + 1, 0]
    return jnp.asarray(w2)


def conv_s2d(w2, xp):
    """xp: (B, T/2, F/2, 4) packed input; stride-1 2x2 conv, pad 1 on the
    leading side only (the window anchors one packed cell up-left)."""
    return jax.lax.conv_general_dilated(
        xp, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=DIMNUMS,
    )


def _time(fn, *args, iters=20, reps=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    B, T, F, C = 128, 512, 80, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F, 1).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, C) * 0.1).astype(np.float32))

    # --- equivalence (fp32) ---
    ref = conv_orig(w, x)
    got = conv_s2d(pack_weights(w), space_to_depth(x))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"equivalence max|diff| = {err:.2e} (shapes {ref.shape} vs {got.shape})")
    assert err < 1e-4, "packed conv does not match the original"

    # --- timing, bf16, fwd and fwd+bwd (dW + dX like training) ---
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fwd_o = jax.jit(conv_orig)
    fwd_s = jax.jit(lambda w2, xp: conv_s2d(w2, xp))

    def loss_o(w, x):
        return conv_orig(w, x).astype(jnp.float32).sum()

    def loss_s(w2, xp):
        return conv_s2d(w2, xp).astype(jnp.float32).sum()

    bwd_o = jax.jit(jax.grad(loss_o, argnums=(0, 1)))
    bwd_s = jax.jit(jax.grad(loss_s, argnums=(0, 1)))

    w2b = pack_weights(w).astype(jnp.bfloat16)
    xpb = space_to_depth(xb)

    t_fwd_o = _time(fwd_o, wb, xb)
    t_fwd_s = _time(fwd_s, w2b, xpb)
    t_bwd_o = _time(bwd_o, wb, xb)
    t_bwd_s = _time(bwd_s, w2b, xpb)
    # end-to-end packed variant including the space_to_depth reshape of
    # the raw input (what the real frontend would have to pay)
    s2d_full_f = jax.jit(lambda w2, x: conv_s2d(w2, space_to_depth(x)))
    s2d_full_b = jax.jit(jax.grad(
        lambda w2, x: conv_s2d(w2, space_to_depth(x)).astype(jnp.float32).sum(),
        argnums=(0, 1)))
    t_fwd_s_full = _time(s2d_full_f, w2b, xb)
    t_bwd_s_full = _time(s2d_full_b, w2b, xb)

    print(f"fwd : orig {t_fwd_o:7.3f} ms | s2d {t_fwd_s:7.3f} ms "
          f"| s2d+reshape {t_fwd_s_full:7.3f} ms")
    print(f"grad: orig {t_bwd_o:7.3f} ms | s2d {t_bwd_s:7.3f} ms "
          f"| s2d+reshape {t_bwd_s_full:7.3f} ms")


if __name__ == "__main__":
    main()
