"""Sequence parallelism (Megatron-SP, arXiv:2205.05198 — the GSPMD
formulation in parallel/mesh.py): with --sequence-parallel on a TP mesh the
LayerNorm/dropout/residual segments run time-sharded over the 'model' axis.
The constraint must (a) actually materialize in the lowered program,
(b) leave one full train step numerically equal to the unconstrained TP
step (GSPMD inserts reduce-scatter/all-gather pairs of the same math), and
(c) never leak outside the trainer's trace scope."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.parallel import mesh as mesh_mod
from fbk_fairseq_st_tpu.parallel.mesh import (
    constrain_seq_parallel,
    make_mesh,
    set_sequence_parallel,
)
from fbk_fairseq_st_tpu.train.trainer import Trainer

from .test_tensor_parallel_step import _build, _grad_magnitudes, _sample
from .utils import DummyTask, dummy_dictionary, model_args


def test_constraint_materializes_in_lowered_program():
    mesh = make_mesh(model=2)
    f = jax.jit(lambda x: constrain_seq_parallel(x) * 2.0)
    sds = jax.ShapeDtypeStruct((4, 8, 16), jnp.float32)
    set_sequence_parallel(mesh)
    try:
        sharded_txt = f.lower(sds).as_text()
    finally:
        set_sequence_parallel(None)
    plain_txt = jax.jit(lambda x: constrain_seq_parallel(x) * 2.0).lower(
        sds
    ).as_text()
    # the scope adds a sharding constraint with the time axis split over
    # 'model' (dim 1 of a (B, T, D) tensor); shardy lowering emits
    # sdy.sharding_constraint, pre-shardy a "Sharding" custom call
    def n_constraints(txt):
        return txt.count("sdy.sharding_constraint") + txt.count(
            'custom_call_target = "Sharding"'
        )

    assert n_constraints(sharded_txt) > n_constraints(plain_txt)
    assert '[{"data"}, {"model"}, {}]' in sharded_txt or "model" in sharded_txt


def test_constraint_noops_without_scope_and_on_small_ranks():
    x2 = jnp.ones((4, 8))
    x3 = jnp.ones((4, 8, 16))
    step = jnp.ones((4, 1, 16))  # decode-step tensor: T == 1
    assert constrain_seq_parallel(x2) is x2
    assert constrain_seq_parallel(x3) is x3
    mesh = make_mesh(model=2)
    set_sequence_parallel(mesh)
    try:
        assert constrain_seq_parallel(x2) is x2
        assert constrain_seq_parallel(step) is step
        assert constrain_seq_parallel(x3) is not x3
    finally:
        set_sequence_parallel(None)


def test_data_only_mesh_disables_scope():
    set_sequence_parallel(make_mesh(model=1))
    try:
        assert mesh_mod._SEQ_PARALLEL_MESH is None
    finally:
        set_sequence_parallel(None)


def _build_sp(model_parallel):
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
        sequence_parallel=True,
    )
    registry.apply_architecture(args)
    args.dropout = 0.0
    model = registry.build_model(args, task)
    criterion = registry.CRITERIONS[args.criterion].build_criterion(args, task)
    mesh = make_mesh(model=model_parallel)
    return Trainer(args, task, model, criterion, mesh=mesh)


def test_sp_step_matches_unsharded_and_scope_is_restored():
    """One full train step (fwd + bwd + Adam) with sequence parallelism on
    the 2-way TP mesh equals the dense single-device step — and the
    process-global scope is cleanly unset afterwards (generation and other
    trainers in the same process must never inherit it)."""
    sample = _sample()
    base = _build(1)
    gmag = _grad_magnitudes(base, sample)
    base.train_step([copy.deepcopy(sample)])

    sp = _build_sp(2)
    assert sp._seq_parallel
    sp.train_step([copy.deepcopy(sample)])
    assert mesh_mod._SEQ_PARALLEL_MESH is None

    flat_base = jax.tree_util.tree_leaves_with_path(base.train_state["params"])
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(sp.train_state["params"]))
    checked = 0
    for path, leaf in flat_base:
        key = jax.tree_util.keystr(path)
        if gmag.get(key, 0.0) < 1e-4:
            continue  # zero-gradient params; see _grad_magnitudes
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(flat_sp[path])),
            rtol=2e-4, atol=2e-4, err_msg=key,
        )
        checked += 1
    assert checked > 20

    # valid_step runs under the scope too and must restore it
    sp.valid_step(copy.deepcopy(sample))
    assert mesh_mod._SEQ_PARALLEL_MESH is None
