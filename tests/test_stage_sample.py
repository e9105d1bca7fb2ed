"""Prefetch staging (trainer.stage_sample): pre-staged batches must train
bit-identically to host batches, including the host-side bf16 feature cast
under --bf16 (numerically identical because the traced step casts the same
keys), and non-feature float payloads must keep their dtype."""

import copy

import jax
import numpy as np
import pytest

from .test_tensor_parallel_step import _build, _sample


def test_staged_equals_unstaged_training():
    a = _build(1)
    b = _build(1)
    s = _sample()
    a.train_step([copy.deepcopy(s)])
    b.train_step([b.stage_sample(copy.deepcopy(s))])
    fa = jax.tree_util.tree_leaves_with_path(a.train_state["params"])
    fb = dict(jax.tree_util.tree_leaves_with_path(b.train_state["params"]))
    for path, leaf in fa:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(fb[path])),
            err_msg=jax.tree_util.keystr(path),
        )


def test_stage_sample_bf16_casts_features_only():
    import jax.numpy as jnp

    trainer = _build(1)
    trainer.compute_dtype = jnp.bfloat16  # as if --bf16
    s = _sample()
    s["teacher_output"] = np.random.RandomState(0).rand(8, 5, 4).astype(
        np.float32
    )
    staged = trainer.stage_sample(s)
    assert staged["net_input"]["src_tokens"].dtype == jnp.bfloat16
    # non-feature float payloads keep full precision
    assert staged["teacher_output"].dtype == jnp.float32
    # int fields stay integral (jax x64-off narrows int64 -> int32)
    assert np.issubdtype(staged["net_input"]["src_lengths"].dtype, np.integer)
