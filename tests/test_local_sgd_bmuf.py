"""Local-SGD BMUF schedule on the virtual 8-device mesh (the analog of
reference tests/test_bmuf.py, which spawns 2 Gloo ranks): unsynced local
steps, parameter sync at block boundaries, block-momentum filter math, and
the zero-communication property of the compiled local step."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fbk_fairseq_st_tpu.optim.local_sgd import LocalSGDBMUF
from fbk_fairseq_st_tpu.parallel.mesh import make_mesh


def _loss_fn(params, batch):
    pred = batch["x"] @ params["w"] + params["b"]
    return jnp.mean((pred - batch["y"]) ** 2)


def _args(**kw):
    base = dict(
        block_lr=1.0, block_momentum=0.875, global_sync_iter=50,
        warmup_iterations=500, use_nbm=False, average_sync=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _batches(rng, R, n=4, d=3):
    return {
        "x": jnp.asarray(rng.randn(R, n, d).astype(np.float32)),
        "y": jnp.asarray(rng.randn(R, n).astype(np.float32)),
    }


def _setup(args, seed=0):
    mesh = make_mesh(model=1)
    R = mesh.shape["data"]
    rng = np.random.RandomState(seed)
    params = {
        "w": jnp.asarray(rng.randn(3).astype(np.float32)),
        "b": jnp.float32(0.0),
    }
    runner = LocalSGDBMUF(mesh, optax.sgd(0.1), _loss_fn, params, args)
    return runner, R, rng


def test_local_steps_diverge_then_sync_averages():
    """Distinct data -> replicas diverge with NO communication; the warmup
    sync adopts the plain replica average (reference test_bmuf warmup
    sync assertion)."""
    runner, R, rng = _setup(_args(warmup_iterations=3, global_sync_iter=100))
    for _ in range(2):
        runner.local_step(_batches(rng, R))
    w = np.asarray(jax.device_get(runner.params_r["w"]))
    # replicas saw different data and must differ pre-sync
    assert np.ptp(w, axis=0).max() > 1e-4

    pre_avg = w.mean(axis=0)
    runner.local_step(_batches(rng, R))  # 3rd step triggers the warmup sync
    w_after = np.asarray(jax.device_get(runner.params_r["w"]))
    # all replicas identical after sync
    assert np.ptp(w_after, axis=0).max() < 1e-6
    # note: the sync averages the POST-step params, not pre_avg
    assert not np.allclose(w_after[0], pre_avg)


def test_block_momentum_filter_math():
    """Hand-computed block filter: second sync must equal
    global - (bm * s_prev + lr * (global - avg))."""
    bm, lr = 0.5, 1.0
    runner, R, rng = _setup(
        _args(block_momentum=bm, block_lr=lr, warmup_iterations=2,
              global_sync_iter=2)
    )
    # steps 1,2 -> warmup sync at 2 (adopt average; global := average)
    runner.local_step(_batches(rng, R))
    runner.local_step(_batches(rng, R))
    g0 = np.asarray(jax.device_get(runner.replica_params(0)["w"]))

    # steps 3,4 -> block sync at 4
    runner.local_step(_batches(rng, R))
    w_pre = np.asarray(jax.device_get(runner.params_r["w"]))
    batch = _batches(rng, R)
    # emulate the 4th local step per replica to get the pre-sync average
    expected_avg = []
    for i in range(R):
        p = {"w": jnp.asarray(w_pre[i]),
             "b": runner.replica_params(i)["b"]}
        grads = jax.grad(_loss_fn)(
            p, {"x": batch["x"][i], "y": batch["y"][i]}
        )
        expected_avg.append(np.asarray(p["w"] - 0.1 * grads["w"]))
    avg = np.mean(expected_avg, axis=0)

    runner.local_step(batch)  # 4th step + sync
    w_after = np.asarray(jax.device_get(runner.replica_params(0)["w"]))

    g = g0 - avg                      # block "gradient"
    s = bm * 0.0 + lr * g             # smoothed (s_prev = 0 at first block)
    expected = g0 - s
    np.testing.assert_allclose(w_after, expected, rtol=1e-5, atol=1e-6)


def test_identical_data_matches_solo_run():
    """With every replica fed the SAME batch, local steps stay in lockstep
    with a single-process optax run (sanity for the vmapped step)."""
    runner, R, rng = _setup(_args(warmup_iterations=1000))
    params = jax.device_get(runner.replica_params(0))
    tx = optax.sgd(0.1)
    opt = tx.init(params)
    for _ in range(3):
        b = _batches(rng, 1)
        rep = {
            "x": jnp.broadcast_to(b["x"][0], (R,) + b["x"][0].shape),
            "y": jnp.broadcast_to(b["y"][0], (R,) + b["y"][0].shape),
        }
        runner.local_step(rep)
        grads = jax.grad(_loss_fn)(
            params, {"x": b["x"][0], "y": b["y"][0]}
        )
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
    for i in range(R):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(runner.replica_params(i)["w"])),
            np.asarray(params["w"]), rtol=1e-5, atol=1e-6,
        )


def test_local_step_compiles_without_collectives():
    """The communication-saving claim, verified on the compiled program:
    the local step's HLO contains no cross-replica collectives."""
    runner, R, rng = _setup(_args())
    batch = _batches(rng, R)
    lowered = runner._local_step.lower(runner.params_r, runner.opt_r, batch)
    hlo = lowered.compile().as_text().lower()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter"):
        assert op not in hlo, f"unexpected collective {op} in local step"


def test_average_sync_averages_optimizer_state():
    runner, R, rng = _setup(
        _args(warmup_iterations=1, global_sync_iter=100, average_sync=True,
              block_momentum=0.0)
    )
    runner.local_step(_batches(rng, R))  # triggers warmup sync
    mu = jax.device_get(runner.opt_r)
    leaves = jax.tree_util.tree_leaves(mu)
    for leaf in leaves:
        arr = np.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] == R:
            assert np.ptp(arr, axis=0).max() < 1e-7
