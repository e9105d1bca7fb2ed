"""Multi-slice (DCN) hierarchical data parallelism.

``make_mesh(dcn=N)`` adds an outer 'dcn' mesh axis (one entry per TPU
slice): the batch shards jointly over ('dcn', 'data') so the gradient
all-reduce decomposes hierarchically (ICI within a slice, one DCN hop
across slices), while FSDP/TP param shardings stay intra-slice — params
are replicated across 'dcn', keeping ZeRO-3's per-use all-gathers off the
slow cross-slice link. The reference's multi-node path (NCCL over IB for
all traffic, /root/reference/fairseq/distributed_utils.py:30-77) has no
such hierarchy.

These tests run on the suite's 8 virtual CPU devices: a 2x2x2
(dcn, data, model) and a 2x4 (dcn, data) mesh must train to the same
parameters as the flat 8-way data-parallel mesh.
"""

import copy

import jax
import numpy as np
import pytest

from fbk_fairseq_st_tpu.parallel.mesh import (
    batch_axes,
    batch_sharding,
    make_mesh,
    param_sharding,
)
from fbk_fairseq_st_tpu.train.trainer import Trainer

from .test_tensor_parallel_step import _build as _build_tp
from .test_tensor_parallel_step import _grad_magnitudes, _sample
from .utils import DummyTask, dummy_dictionary, model_args


def _build(dcn=1, model_parallel=1, fsdp=False):
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
        dcn_data_parallel=dcn,
        fsdp=fsdp,
        fsdp_min_shard_size=1 if fsdp else None,
    )
    from fbk_fairseq_st_tpu import registry

    registry.apply_architecture(args)
    args.dropout = 0.0
    model = registry.build_model(args, task)
    criterion = registry.CRITERIONS[args.criterion].build_criterion(
        args, task
    )
    mesh = make_mesh(model=model_parallel, dcn=dcn)
    return Trainer(args, task, model, criterion, mesh=mesh)


def test_mesh_shape_and_batch_spec():
    mesh = make_mesh(dcn=2, model=2)
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    assert batch_axes(mesh) == ("dcn", "data")
    spec = batch_sharding(mesh).spec
    assert tuple(spec) == (("dcn", "data"),)
    # flat mesh unchanged
    flat = make_mesh()
    assert batch_axes(flat) == ("data",)


def test_fsdp_stays_intra_slice():
    """ZeRO-3 param shards must never touch the 'dcn' axis (replicated
    across slices by design — cross-slice per-use all-gathers would ride
    the slow DCN link every step)."""
    trainer = _build(dcn=2, fsdp=True)
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda s: tuple(
                str(d) for d in s.spec if d is not None
            ),
            trainer._param_shard,
            is_leaf=lambda s: hasattr(s, "spec"),
        )
    )
    assert any("data" in s for s in specs), "FSDP sharded nothing"
    assert all("dcn" not in s for s in specs)


@pytest.mark.slow
@pytest.mark.parametrize("model_parallel,fsdp", [(1, False), (2, True)])
def test_dcn_step_matches_flat_dp(model_parallel, fsdp):
    """3 updates on a (dcn=2, data, model) mesh == the flat ('data',
    'model') mesh: GSPMD's hierarchical decomposition must be numerically
    equivalent to the flat all-reduce (fp32 CPU, matmul precision pinned
    by conftest)."""
    ref = (
        _build_tp(model_parallel)
        if model_parallel > 1 and not fsdp
        else _build(dcn=1, model_parallel=model_parallel, fsdp=fsdp)
    )
    dcn = _build(dcn=2, model_parallel=model_parallel, fsdp=fsdp)
    # parameters with mathematically zero gradients (attention K biases,
    # pre-BatchNorm projections) get Adam step-1 sign normalization of
    # reduction-order fp noise (+-lr per step) — skip them, like the TP
    # equivalence test does (test_tensor_parallel_step._grad_magnitudes)
    mags = _grad_magnitudes(ref, _sample(seed=0))
    losses_ref, losses_dcn = [], []
    for step in range(3):
        s = _sample(seed=step)
        out_r = ref.train_step([copy.deepcopy(s)])
        out_d = dcn.train_step([copy.deepcopy(s)])
        losses_ref.append(out_r["loss"])
        losses_dcn.append(out_d["loss"])
    np.testing.assert_allclose(losses_ref, losses_dcn, rtol=1e-5)
    p_ref = jax.device_get(ref.train_state["params"])
    p_dcn = jax.device_get(dcn.train_state["params"])
    flat_r = jax.tree_util.tree_leaves_with_path(p_ref)
    flat_d = jax.tree_util.tree_leaves(p_dcn)
    compared = 0
    for (path, a), b in zip(flat_r, flat_d):
        if mags.get(jax.tree_util.keystr(path), 0.0) < 1e-4:
            continue
        compared += 1
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            atol=3e-4,
            rtol=3e-4,
            err_msg=jax.tree_util.keystr(path),
        )
    assert compared > 10, "grad-magnitude filter skipped almost everything"
