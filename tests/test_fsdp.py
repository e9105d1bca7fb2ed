"""FSDP (ZeRO-3) correctness on the virtual 8-device mesh.

Params + optimizer moments shard over the 'data' axis purely via sharding
annotations (parallel/mesh.py param_sharding use_fsdp); GSPMD inserts the
per-use all-gathers and gradient reduce-scatters. The reference fork has no
counterpart (fairseq FSDP landed upstream later, as a torch wrapper); this
is the TPU-native formulation. Checks: (a) numerical equivalence of the
sharded step to the replicated step, (b) memory actually sharded (per-device
shard bytes), (c) TP+FSDP composition places both axes, (d) checkpoint
resume preserves the FSDP layout."""

import copy

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.parallel.mesh import make_mesh, param_sharding
from fbk_fairseq_st_tpu.train.trainer import Trainer

from .test_tensor_parallel_step import _grad_magnitudes, _sample
from .utils import DummyTask, dummy_dictionary, model_args


def _build(fsdp: bool, model_parallel: int = 1, optimizer: str = "adam"):
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
        optimizer=optimizer,
        lr=[0.01],
        lr_scheduler="fixed",
        seed=3,
        dropout=0.0,
        attention_dropout=0.0,
        model_parallel_size=model_parallel,
        fsdp=fsdp,
        fsdp_min_shard_size=1,  # tiny test model: shard everything divisible
    )
    registry.apply_architecture(args)
    args.dropout = 0.0
    model = registry.build_model(args, task)
    criterion = registry.CRITERIONS[args.criterion].build_criterion(args, task)
    mesh = make_mesh(model=model_parallel)
    return Trainer(args, task, model, criterion, mesh=mesh)


def test_fsdp_step_matches_replicated():
    sample = _sample()
    base = _build(fsdp=False)
    gmag = _grad_magnitudes(base, sample)
    base.train_step([copy.deepcopy(sample)])

    fsdp = _build(fsdp=True)
    # params must actually live sharded over 'data'
    n_sharded = sum(
        1
        for leaf in jax.tree_util.tree_leaves(fsdp.train_state["params"])
        if any(d == "data" for d in leaf.sharding.spec)
    )
    assert n_sharded > 10, n_sharded
    # per-device param memory strictly below the replicated footprint
    big = [
        leaf
        for leaf in jax.tree_util.tree_leaves(fsdp.train_state["params"])
        if any(d == "data" for d in leaf.sharding.spec)
    ]
    for leaf in big:
        assert leaf.addressable_shards[0].data.nbytes < leaf.nbytes

    fsdp.train_step([copy.deepcopy(sample)])
    flat_base = jax.tree_util.tree_leaves_with_path(base.train_state["params"])
    flat_fsdp = dict(
        jax.tree_util.tree_leaves_with_path(fsdp.train_state["params"])
    )
    checked = 0
    for path, leaf in flat_base:
        key = jax.tree_util.keystr(path)
        if gmag.get(key, 0.0) < 1e-4:
            continue  # zero-gradient params: Adam amplifies topology noise
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(flat_fsdp[path])),
            rtol=2e-4, atol=2e-4, err_msg=key,
        )
        checked += 1
    assert checked > 20

    # optimizer moments inherit the FSDP placement
    n_opt_sharded = sum(
        1
        for leaf in jax.tree_util.tree_leaves(fsdp.train_state["opt_state"])
        if hasattr(leaf, "sharding")
        and any(d == "data" for d in leaf.sharding.spec)
    )
    assert n_opt_sharded > 10, n_opt_sharded


def test_fsdp_composes_with_tp():
    """data=4 x model=2: TP rules place 'model', FSDP adds 'data' on a free
    dim -> 2-D sharded weights; the step still matches the dense run."""
    sample = _sample()
    base = _build(fsdp=False)
    gmag = _grad_magnitudes(base, sample)
    base.train_step([copy.deepcopy(sample)])

    both = _build(fsdp=True, model_parallel=2)
    two_d = [
        leaf
        for leaf in jax.tree_util.tree_leaves(both.train_state["params"])
        if set(d for d in leaf.sharding.spec if d) >= {"data", "model"}
    ]
    assert two_d, "no 2-D (data x model) sharded weight found"
    both.train_step([copy.deepcopy(sample)])

    flat_base = jax.tree_util.tree_leaves_with_path(base.train_state["params"])
    flat_both = dict(
        jax.tree_util.tree_leaves_with_path(both.train_state["params"])
    )
    for path, leaf in flat_base:
        key = jax.tree_util.keystr(path)
        if gmag.get(key, 0.0) < 1e-4:
            continue
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(flat_both[path])),
            rtol=2e-4, atol=2e-4, err_msg=key,
        )


def test_fsdp_resume_preserves_layout():
    sample = _sample()
    cont = _build(fsdp=True)
    cont.train_step([copy.deepcopy(sample)])
    saved = cont.state_for_checkpoint()

    resumed = _build(fsdp=True)
    resumed.load_trainer_state(saved)
    for leaf, want in zip(
        jax.tree_util.tree_leaves(resumed.train_state["params"]),
        jax.tree_util.tree_leaves(
            resumed._param_shard, is_leaf=lambda x: hasattr(x, "spec")
        ),
    ):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim)

    sample2 = _sample(seed=1)
    cont.train_step([copy.deepcopy(sample2)])
    resumed.train_step([copy.deepcopy(sample2)])
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(cont.train_state["params"]),
        jax.tree_util.tree_leaves(resumed.train_state["params"]),
    ):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)),
            np.asarray(jax.device_get(b)),
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.quick
def test_fsdp_spec_rules():
    """Placement policy unit checks on synthetic trees (no trainer)."""
    mesh = make_mesh()  # 8 virtual devices -> data=8
    import jax.numpy as jnp

    params = {
        "enc": {
            "fc1": {"w": jnp.zeros((16, 64)), "b": jnp.zeros((64,))},
            "ln": {"g": jnp.zeros((17,))},  # 17 % 8 != 0 on any dim
        }
    }
    tree = param_sharding(mesh, params, use_fsdp=True, fsdp_min_size=1)
    assert tree["enc"]["fc1"]["w"].spec == P(None, "data")  # largest dim
    assert tree["enc"]["fc1"]["b"].spec == P("data")
    assert tree["enc"]["ln"]["g"].spec == P()  # indivisible -> replicated
    # below the size threshold -> replicated
    tree = param_sharding(mesh, params, use_fsdp=True, fsdp_min_size=4096)
    assert tree["enc"]["fc1"]["w"].spec == P()
