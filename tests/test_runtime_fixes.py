"""Regression tests for runtime-core review findings: prefetch-aware
mid-epoch resume accounting, frozen-parameter weight-decay isolation,
deferred-log step semantics, and per-batch length-constrained search."""

import copy
import time

import jax
import numpy as np
import pytest

from .test_tensor_parallel_step import _build, _sample


def test_prefetch_does_not_inflate_resume_position():
    """iterations_in_epoch must count CONSUMED batches, not batches the
    prefetch worker has staged ahead — otherwise every mid-epoch resume
    silently skips the prefetched-but-untrained batches."""
    from fbk_fairseq_st_tpu.data.iterators import (
        DevicePrefetchIterator,
        EpochBatchIterator,
    )

    class _Ds:
        def __getitem__(self, i):
            return i

        def collater(self, samples, **kw):
            return {"ids": list(samples)}

    batches = [[i] for i in range(10)]
    epoch_itr = EpochBatchIterator(_Ds(), batches, seed=1)
    itr = epoch_itr.next_epoch_itr(shuffle=False)
    wrapped = DevicePrefetchIterator(itr, stage_fn=lambda x: x, lookahead=3)
    # consume 2 batches; give the worker time to stage well ahead
    next(wrapped)
    next(wrapped)
    time.sleep(0.2)
    assert epoch_itr.iterations_in_epoch == 2
    assert not epoch_itr.end_of_epoch()
    state = epoch_itr.state_dict()
    assert state["iterations_in_epoch"] == 2

    # resume skips exactly the consumed batches
    fresh = EpochBatchIterator(_Ds(), batches, seed=1)
    fresh.load_state_dict(state)
    resumed = fresh.next_epoch_itr(shuffle=False)
    first = next(resumed)
    assert first["ids"] == [2]

    # draining the wrapper reaches end_of_epoch exactly
    for _ in range(8):
        next(wrapped)
    assert epoch_itr.end_of_epoch()


def test_frozen_params_survive_weight_decay():
    """A frozen parameter must not move even when the optimizer chain adds
    decayed weights to the update stream."""
    trainer = _build(1)
    trainer.args.weight_decay = 0.1
    # rebuild optimizer with weight decay + a mask freezing the encoder fc3
    from fbk_fairseq_st_tpu.registry import OPTIMIZERS

    trainer.tx = OPTIMIZERS["adam"].build_optimizer(trainer.args)
    trainer.train_state["opt_state"] = trainer.tx.init(
        trainer.train_state["params"]
    )
    import jax.numpy as jnp

    mask = jax.tree_util.tree_map(
        jnp.ones_like, trainer.train_state["params"]
    )
    mask["encoder"]["fc3"]["w"] = jnp.zeros_like(mask["encoder"]["fc3"]["w"])
    trainer._grad_mask = mask
    trainer._fused_step = jax.jit(
        trainer._fused_step_impl, donate_argnums=(0,)
    )

    before = np.asarray(
        jax.device_get(trainer.train_state["params"]["encoder"]["fc3"]["w"])
    ).copy()
    moved_before = np.asarray(
        jax.device_get(
            trainer.train_state["params"]["decoder"]["embed_tokens"]["w"]
        )
    ).copy()
    trainer.train_step([_sample()])
    after = np.asarray(
        jax.device_get(trainer.train_state["params"]["encoder"]["fc3"]["w"])
    )
    moved_after = np.asarray(
        jax.device_get(
            trainer.train_state["params"]["decoder"]["embed_tokens"]["w"]
        )
    )
    np.testing.assert_array_equal(before, after)
    assert np.abs(moved_before - moved_after).max() > 0  # others train


def test_deferred_log_steps_are_not_skipped_steps():
    """With log_sync_interval > 1, non-boundary updates return {} (update
    applied, logs deferred) — None remains reserved for 'no update', so
    the train loop still runs its save/validate/max-update checks."""
    trainer = _build(1)
    trainer.log_sync_interval = 4
    out1 = trainer.train_step([_sample(seed=0)])
    assert out1 == {}  # deferred, but an update happened
    assert trainer.get_num_updates() == 1
    # empty sample -> genuinely no update -> None
    assert trainer.train_step([{}]) is None
    # boundary flushes and returns real logs
    for seed in (1, 2):
        trainer.train_step([_sample(seed=seed)])
    out4 = trainer.train_step([_sample(seed=3)])
    assert out4 is not None and "loss" in out4


def test_length_constrained_search_uses_per_batch_lengths():
    """--match-source-len style decoding across batches with different
    sizes/lengths must constrain each batch by ITS OWN source lengths."""
    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.generation import SequenceGenerator
    from fbk_fairseq_st_tpu.generation.search import (
        LengthConstrainedBeamSearch,
    )

    from .utils import DummyTask, dummy_dictionary, model_args

    d = dummy_dictionary(20)
    task = DummyTask(d)
    args = model_args(
        "conv_transformer",
        input_feat_per_channel=8,
        encoder_convolutions="[(4,3,3)]*2",
        encoder_layers=1, decoder_layers=1,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=64, max_target_positions=32,
    )
    registry.apply_architecture(args)
    model = registry.build_model(args, task)
    variables = model.init(jax.random.PRNGKey(0))

    search = LengthConstrainedBeamSearch(
        d, min_len_a=0, min_len_b=2, max_len_a=0, max_len_b=4
    )
    gen = SequenceGenerator(d, beam_size=2, max_len_b=8, search_strategy=search)

    rng = np.random.RandomState(0)

    def decode(b, t):
        batch = {
            "net_input": {
                "src_tokens": rng.randn(b, t, 8).astype(np.float32),
                "src_lengths": np.full((b,), t, np.int64),
            },
            "id": np.arange(b),
        }
        return gen.generate([(model, variables)], batch)

    # different batch sizes AND source lengths across calls: the second
    # call must neither crash nor reuse the first batch's lengths
    h1 = decode(3, 20)
    h2 = decode(5, 12)
    for hypos in (h1, h2):
        for sent in hypos:
            n = len(sent[0]["tokens"])
            assert 2 <= n  # min_len_b respected
