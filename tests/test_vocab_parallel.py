"""Vocab-parallel cross entropy: GSPMD and explicit shard_map formulations
match dense CE exactly on the 8-device CPU mesh (reference
model_parallel/criterions/vocab_parallel_cross_entropy.py role)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fbk_fairseq_st_tpu.parallel.mesh import make_mesh
from fbk_fairseq_st_tpu.parallel.vocab_parallel import (
    vocab_parallel_cross_entropy,
    vocab_parallel_cross_entropy_shardmap,
)


def dense_ce(logits, target):
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]


def make_inputs(b=4, t=6, v=32, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32) * 3)
    target = jnp.asarray(rng.randint(0, v, size=(b, t)))
    return logits, target


def test_gspmd_formulation_matches_dense():
    logits, target = make_inputs()
    np.testing.assert_allclose(
        np.asarray(vocab_parallel_cross_entropy(logits, target)),
        np.asarray(dense_ce(logits, target)),
        rtol=1e-6, atol=1e-6,
    )


def test_shardmap_matches_dense_on_mesh():
    mesh = make_mesh(model=4)  # 2x4 mesh from the 8 virtual CPU devices
    logits, target = make_inputs(v=32)
    got = vocab_parallel_cross_entropy_shardmap(logits, target, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dense_ce(logits, target)),
        rtol=1e-5, atol=1e-5,
    )


def test_shardmap_under_jit_with_sharded_logits():
    mesh = make_mesh(model=8)
    logits, target = make_inputs(v=64, seed=1)
    logits = jax.device_put(logits, NamedSharding(mesh, P(None, None, "model")))

    @jax.jit
    def f(lg, tg):
        return vocab_parallel_cross_entropy_shardmap(lg, tg, mesh).sum()

    got = float(f(logits, target))
    want = float(dense_ce(jax.device_get(logits), target).sum())
    assert abs(got - want) < 1e-3


def test_gspmd_grad_with_vocab_sharded_projection():
    """End-to-end TP shape: hidden @ W (W vocab-sharded) -> CE -> grad.
    GSPMD must compile and the grads must match the replicated run."""
    mesh = make_mesh(model=8)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(4, 6, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 64).astype(np.float32) * 0.1)
    target = jnp.asarray(rng.randint(0, 64, size=(4, 6)))

    def loss_fn(w, h, target):
        logits = h @ w
        return vocab_parallel_cross_entropy(logits, target).sum()

    g_rep = jax.grad(loss_fn)(w, h, target)

    w_sh = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    g_tp = jax.jit(jax.grad(loss_fn))(w_sh, h, target)
    np.testing.assert_allclose(
        np.asarray(g_tp), np.asarray(g_rep), rtol=1e-5, atol=1e-5
    )


def test_criterion_smoke():
    import argparse

    from fbk_fairseq_st_tpu.registry import CRITERIONS

    from .utils import DummyTask

    task = DummyTask()
    d = task.target_dictionary
    v = len(d)
    args = argparse.Namespace(sentence_avg=False)
    crit = CRITERIONS["vocab_parallel_cross_entropy"](task, args)

    class M:
        def forward(self, variables, batch, rng=None, training=False):
            rng_np = np.random.RandomState(0)
            logits = jnp.asarray(
                rng_np.randn(2, 5, v).astype(np.float32)
            )
            return (logits, {}), None

    target = jnp.asarray(np.random.RandomState(1).randint(4, v, size=(2, 5)))
    batch = {"net_input": {}, "target": target}
    loss, sample_size, logs, _ = crit(M(), {}, batch)
    assert float(loss) > 0
    assert int(sample_size) == 10
    assert set(logs) >= {"loss", "ntokens", "nsentences", "sample_size"}
