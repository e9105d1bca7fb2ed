"""steps_per_execution: K fused optimizer updates per device dispatch.

trainer.train_step_multi scans over K stacked batches in ONE compiled
executable (lax.scan over the full fused-step math). The contract tested
here: identical trajectory to K individual fused-step dispatches — same
per-update lr schedule values, same per-update rng fold-in (dropout masks
included), same grad normalization/clipping — plus transparent fallback to
the per-step path for ragged groups (shape-mismatched batches, epoch-tail
groups shorter than K). Counterpart capability: the reference has none
(fairseq dispatches every update from Python); this is the TPU answer to
per-step host dispatch latency (PERF.md §1 wall-vs-device gap).
"""

import copy

import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.train.trainer import Trainer

from .utils import DummyTask, dummy_dictionary, model_args

VOCAB = 24


def _sample(seed, b=8, t=20, feats=8, tgt=5):
    rng = np.random.RandomState(seed)
    lengths = np.full((b,), t, np.int64)
    lengths[1:] = rng.randint(t // 2, t, size=b - 1)
    prev = rng.randint(4, VOCAB, size=(b, tgt)).astype(np.int64)
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


def _build(steps_per_execution=1, dropout=0.1, single_device=False):
    task = DummyTask(dummy_dictionary(VOCAB - 4))
    args = model_args(
        "conv_transformer",
        input_feat_per_channel=8,
        encoder_convolutions="[(4,3,3)]",
        encoder_layers=1,
        decoder_layers=1,
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
        optimizer="sgd",
        lr=[0.05],
        lr_scheduler="inverse_sqrt",
        warmup_updates=4,
        warmup_init_lr=0.01,
        seed=7,
        clip_norm=1.0,
        dropout=dropout,
        steps_per_execution=steps_per_execution,
    )
    registry.apply_architecture(args)
    args.dropout = dropout
    model = registry.build_model(args, task)
    criterion = registry.CRITERIONS[args.criterion].build_criterion(args, task)
    mesh = None
    if single_device:
        # fallback semantics don't depend on the mesh width; a 1-device
        # mesh skips the 8-way GSPMD compile and keeps the module cheap
        import jax

        from fbk_fairseq_st_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices=jax.devices()[:1])
    return Trainer(args, task, model, criterion, mesh=mesh)


def _params_np(trainer):
    import jax

    return {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            trainer.train_state["params"]
        )
    }


def _forbid_fallback(trainer, monkeypatch):
    def boom(samples):  # pragma: no cover - failure path
        raise AssertionError("scan path unexpectedly fell back to per-step")

    monkeypatch.setattr(trainer, "_train_steps_sequential", boom)


def test_scan_block_matches_sequential_steps(monkeypatch):
    K = 4
    samples = [_sample(i) for i in range(K)]

    multi = _build(steps_per_execution=K)
    _forbid_fallback(multi, monkeypatch)
    out_multi = multi.train_step_multi(copy.deepcopy(samples))

    seq = _build(steps_per_execution=1)
    out_seq = None
    for s in samples:
        out_seq = seq.train_step([copy.deepcopy(s)])

    assert multi.get_num_updates() == seq.get_num_updates() == K
    # warmup schedule advanced inside the block: lr after K updates matches
    assert multi.get_lr() == pytest.approx(seq.get_lr())

    pm, ps = _params_np(multi), _params_np(seq)
    assert pm.keys() == ps.keys()
    for k in pm:
        np.testing.assert_allclose(pm[k], ps[k], rtol=2e-6, atol=2e-7, err_msg=k)

    # the flushed logging output is the LAST update's, in both paths
    assert out_multi is not None and out_seq is not None
    assert out_multi["loss"] == pytest.approx(out_seq["loss"], rel=2e-5)
    assert out_multi["sample_size"] == out_seq["sample_size"]


def test_fallback_paths_and_log_sync():
    """Ragged shapes, short epoch-tail groups, and log_sync_interval
    blocks — one trainer pair so the compiled executables are shared."""
    multi = _build(steps_per_execution=3, single_device=True)

    # 1) shape-mismatched group -> per-step path (which IS train_step,
    # so result equality is structural; the spy proves the routing)
    samples = [_sample(0, t=20), _sample(1, t=28), _sample(2, t=20)]
    called = {"n": 0}
    orig = multi._train_steps_sequential

    def spy(ss):
        called["n"] += 1
        return orig(ss)

    multi._train_steps_sequential = spy
    out = multi.train_step_multi(copy.deepcopy(samples))
    assert called["n"] == 1, "shape-mismatched group must use per-step path"
    assert multi.get_num_updates() == 3 and out and "loss" in out

    # 2) epoch-tail group shorter than K -> per-step path, still updates
    before = multi.get_num_updates()
    out = multi.train_step_multi([_sample(3), _sample(4)])
    assert called["n"] == 2
    assert multi.get_num_updates() == before + 2
    assert out is not None

    # 3) deferred flush: a scanned block inside a log_sync_interval window
    multi.steps_per_execution = 2
    multi.log_sync_interval = multi.get_num_updates() + 4
    out = multi.train_step_multi([_sample(5), _sample(6)])
    assert out == {}  # no sync boundary crossed yet
    assert len(multi._pending_logs) == 1
    multi.log_sync_interval = 1
    out = multi.train_step_multi([_sample(7), _sample(8)])
    assert out and "loss" in out
    assert multi._pending_logs == []
