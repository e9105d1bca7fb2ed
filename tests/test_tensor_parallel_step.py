"""Tensor-parallel correctness: one full train step (fwd + bwd + Adam) with
Megatron-style TP param sharding on a multi-device mesh produces the same
updated parameters as the unsharded step. This validates TP_RULES end to end
— GSPMD must insert exactly the collectives that make the sharded program
numerically equal to the dense one (reference fairseq/model_parallel/*
semantics, minus explicit comm code)."""

import copy

import jax
import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.parallel.mesh import make_mesh
from fbk_fairseq_st_tpu.train.trainer import Trainer

from .utils import DummyTask, dummy_dictionary, model_args


def _sample(seed=0, b=8, t=20, feats=8, tgt=5, vocab=24):
    rng = np.random.RandomState(seed)
    lengths = np.full((b,), t, np.int64)
    lengths[1:] = rng.randint(t // 2, t, size=b - 1)
    prev = rng.randint(4, vocab, size=(b, tgt)).astype(np.int64)
    prev[:, 0] = 2
    target = np.roll(prev, -1, axis=1).astype(np.int64)
    target[:, -1] = 2
    return {
        "net_input": {
            "src_tokens": rng.randn(b, t, feats).astype(np.float32),
            "src_lengths": lengths,
            "prev_output_tokens": prev,
        },
        "target": target,
        "ntokens": int(target.size),
        "nsentences": b,
    }


def _build(model_parallel):
    task = DummyTask(dummy_dictionary(20))
    args = model_args(
        "conv_transformer",
        input_feat_per_channel=8,
        encoder_convolutions="[(4,3,3)]*2",
        encoder_layers=2,
        decoder_layers=2,
        encoder_embed_dim=16,
        decoder_embed_dim=16,
        encoder_ffn_embed_dim=32,
        decoder_ffn_embed_dim=32,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        max_source_positions=64,
        max_target_positions=32,
        criterion="label_smoothed_cross_entropy",
        label_smoothing=0.1,
        optimizer="adam",
        lr=[0.01],
        lr_scheduler="fixed",
        seed=3,
        dropout=0.0,
        attention_dropout=0.0,
        model_parallel_size=model_parallel,
    )
    registry.apply_architecture(args)
    args.dropout = 0.0
    model = registry.build_model(args, task)
    criterion = registry.CRITERIONS[args.criterion].build_criterion(args, task)
    mesh = make_mesh(model=model_parallel)
    return Trainer(args, task, model, criterion, mesh=mesh)


def _grad_magnitudes(trainer, sample):
    """Per-leaf max |grad| for the given sample (used to skip parameters
    with mathematically zero gradients — e.g. attention K biases, where the
    softmax is shift-invariant, or projections feeding BatchNorm — whose
    Adam step-1 sign normalization amplifies reduction-order fp noise to
    +-lr)."""
    from fbk_fairseq_st_tpu.parallel.mesh import shard_batch

    b = trainer._device_batch(copy.deepcopy(sample))
    b = shard_batch(trainer.mesh, b)
    _, grads = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        trainer.train_state["params"],
        trainer.train_state["model_state"],
        b,
        trainer._step_rng(),
        None,
    )
    return {
        jax.tree_util.keystr(p): float(jnp_abs_max(x))
        for p, x in jax.tree_util.tree_leaves_with_path(grads)
    }


def jnp_abs_max(x):
    import jax.numpy as jnp

    return jnp.max(jnp.abs(x))


@pytest.mark.parametrize("model_parallel", [2, 4])
def test_tp_step_matches_unsharded(model_parallel):
    sample = _sample()
    base = _build(1)
    gmag = _grad_magnitudes(base, sample)
    base.train_step([copy.deepcopy(sample)])
    tp = _build(model_parallel)
    tp.train_step([copy.deepcopy(sample)])

    flat_base = jax.tree_util.tree_leaves_with_path(
        base.train_state["params"]
    )
    flat_tp = dict(
        jax.tree_util.tree_leaves_with_path(tp.train_state["params"])
    )
    checked = 0
    for path, leaf in flat_base:
        key = jax.tree_util.keystr(path)
        if gmag.get(key, 0.0) < 1e-4:
            continue  # zero-gradient parameter; see _grad_magnitudes
        other = flat_tp[path]
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(other)),
            rtol=2e-4, atol=2e-4,
            err_msg=key,
        )
        checked += 1
    assert checked > 20


def test_tp_resume_preserves_sharding_and_step_equivalence():
    """Checkpoint save -> fresh trainer -> load -> step under TP=2 must (a)
    keep the Megatron param/optimizer shardings (a resume must not silently
    fall back to replicated) and (b) produce the same params as the
    uninterrupted run."""
    sample = _sample()
    cont = _build(2)
    cont.train_step([copy.deepcopy(sample)])
    saved = cont.state_for_checkpoint()

    resumed = _build(2)
    resumed.load_trainer_state(saved)
    assert resumed.get_num_updates() == cont.get_num_updates()

    # (a) shardings preserved: every param/opt leaf sits where init put it
    for tree, shard_tree in (
        (resumed.train_state["params"], resumed._param_shard),
        (resumed.train_state["opt_state"], resumed._opt_shard),
    ):
        leaves = jax.tree_util.tree_leaves(tree)
        shards = jax.tree_util.tree_leaves(
            shard_tree, is_leaf=lambda x: hasattr(x, "spec")
        )
        assert len(leaves) == len(shards)
        n_tp_sharded = 0
        for leaf, want in zip(leaves, shards):
            assert leaf.sharding.is_equivalent_to(want, leaf.ndim)
            if any(d == "model" for d in want.spec):
                n_tp_sharded += 1
        if tree is resumed.train_state["params"]:
            assert n_tp_sharded > 5  # TP rules actually applied

    # (b) one more step on both: bit-for-bit state equivalence
    sample2 = _sample(seed=1)
    cont.train_step([copy.deepcopy(sample2)])
    resumed.train_step([copy.deepcopy(sample2)])
    flat_a = jax.tree_util.tree_leaves_with_path(cont.train_state["params"])
    flat_b = dict(
        jax.tree_util.tree_leaves_with_path(resumed.train_state["params"])
    )
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(flat_b[path])),
            err_msg=jax.tree_util.keystr(path),
        )
