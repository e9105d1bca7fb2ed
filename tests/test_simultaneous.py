"""Simultaneous translation: monotonic-attention transformers
(transformer_monotonic / transformer_unidirectional), latency metrics and
the latency-augmented criterion, end-to-end through the train CLI."""

import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_translation import create_translation_data
from .utils import dummy_dictionary, model_args

SMALL = dict(
    encoder_layers=2,
    decoder_layers=2,
    encoder_embed_dim=16,
    decoder_embed_dim=16,
    encoder_ffn_embed_dim=32,
    decoder_ffn_embed_dim=32,
    encoder_attention_heads=2,
    decoder_attention_heads=2,
    max_source_positions=64,
    max_target_positions=64,
)


class _Task:
    def __init__(self):
        self.source_dictionary = dummy_dictionary(20)
        self.target_dictionary = dummy_dictionary(20)


@pytest.mark.parametrize(
    "simul_type", ["hard_aligned", "infinite_lookback", "waitk"]
)
def test_monotonic_forward_shapes(simul_type):
    import jax
    import jax.numpy as jnp

    task = _Task()
    args = model_args(
        "transformer_monotonic",
        simul_type=simul_type,
        waitk_lagging=3 if simul_type == "waitk" else 0,
        **SMALL,
    )
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "src_tokens": jnp.asarray(rng.randint(4, 20, size=(2, 9))),
        "src_lengths": jnp.array([9, 6]),
        "prev_output_tokens": jnp.asarray(rng.randint(4, 20, size=(2, 5))),
    }
    (logits, extra), _ = m.forward(v, batch)
    assert logits.shape == (2, 5, 24)
    assert len(extra["attn_list"]) == 2
    alpha = extra["attn_list"][0]["alpha"]
    assert alpha.shape == (2, 2, 5, 9)
    # alignments are normalized distributions over the source
    np.testing.assert_allclose(
        np.asarray(alpha).sum(-1), np.ones((2, 2, 5)), atol=1e-4
    )


def test_unidirectional_encoder_is_causal():
    """Changing a later source token must not affect earlier encoder
    states."""
    import jax
    import jax.numpy as jnp

    task = _Task()
    args = model_args("transformer_unidirectional", **SMALL)
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    src = np.full((1, 6), 5, np.int64)
    enc1, _ = m.encode(v, jnp.asarray(src), jnp.array([6]))
    src2 = src.copy()
    src2[0, -1] = 9
    enc2, _ = m.encode(v, jnp.asarray(src2), jnp.array([6]))
    np.testing.assert_allclose(
        np.asarray(enc1.encoder_out)[:, :5],
        np.asarray(enc2.encoder_out)[:, :5],
        atol=1e-6,
    )
    assert not np.allclose(
        np.asarray(enc1.encoder_out)[:, 5], np.asarray(enc2.encoder_out)[:, 5]
    )


def test_latency_metrics():
    """DAL/AL/AP against hand-computed values."""
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.latency import (
        average_lagging,
        average_proportion,
        differentiable_average_lagging,
    )

    # 1 sentence, delays already 1-based via start_from_zero
    delays = jnp.asarray([[0.0, 1.0, 2.0]])  # -> 1, 2, 3 after +1
    src_lens = jnp.asarray([[3.0]])
    ap = average_proportion(delays, src_lens)
    # sum(1,2,3) / (3*3) = 6/9
    np.testing.assert_allclose(float(ap[0, 0]), 6.0 / 9.0, rtol=1e-6)
    al = average_lagging(delays, src_lens)
    # gamma=1; lagging_i = d_i - (i)/1 = [1,1,1]; first d>=3 at i=2 ->
    # tau counts positions up to & incl. it -> mean = 1
    np.testing.assert_allclose(float(al[0, 0]), 1.0, rtol=1e-6)
    dal = differentiable_average_lagging(delays, src_lens)
    # d' = [1, 2, 3]; DAL_i = d'_i - i = [1,1,1] -> 1
    np.testing.assert_allclose(float(dal[0, 0]), 1.0, rtol=1e-6)


def test_monotonic_train_cli(tmp_path):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--arch", "transformer_monotonic",
            "--simul-type", "infinite_lookback",
            "--criterion", "latency_augmented_label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--latency-weight-avg", "0.1", "--latency-weight-var", "0.1",
            "--optimizer", "adam", "--lr", "0.001", "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "1", "--decoder-layers", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    import os

    assert "checkpoint_last.pt" in os.listdir(save_dir)


@pytest.mark.parametrize("simul_type", ["hard_aligned", "waitk"])
def test_greedy_simul_decode(simul_type):
    """The host-driven read/write agent produces a finite hypothesis with
    monotone non-decreasing delays and sane latency metrics."""
    import jax

    from fbk_fairseq_st_tpu.generation.simultaneous_decoder import (
        greedy_simul_decode,
    )

    task = _Task()
    args = model_args(
        "transformer_monotonic",
        simul_type=simul_type,
        waitk_lagging=2 if simul_type == "waitk" else 0,
        **SMALL,
    )
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    src = np.array([5, 6, 7, 8, 9, 2])
    out = greedy_simul_decode(
        m, v, src, eos=task.target_dictionary.eos(), max_len=8
    )
    assert 1 <= len(out["tokens"]) <= 9
    assert len(out["delays"]) == len(out["tokens"])
    d = out["delays"]
    assert all(d[i] <= d[i + 1] for i in range(len(d) - 1))
    assert all(1 <= x <= len(src) for x in d)
    if simul_type == "waitk":
        assert d[0] == 2  # wait-k lagging honored
    lat = out["latency"]
    assert 0 < lat["average_proportion"] <= 1.0
    assert np.isfinite(lat["average_lagging"])
    assert np.isfinite(lat["differentiable_average_lagging"])


def test_simul_eval_cli(tmp_path, capsys):
    """Native corpus-level simultaneous evaluation (the reference needs
    the external SimulEval harness here): train a tiny wait-k model, then
    decode the test set incrementally and report BLEU + AP/AL/DAL."""
    import os

    from fbk_fairseq_st_tpu.cli import simul_eval as simul_eval_cli

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir, n=12)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--arch", "transformer_monotonic",
            "--simul-type", "waitk", "--waitk-lagging", "2",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001", "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "1", "--decoder-layers", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    capsys.readouterr()
    scorer, latency = simul_eval_cli.cli_main(
        [
            data_dir, "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test", "--max-len-b", "12",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    for prefix in ("H-", "DEL-", "LAT-"):
        assert any(l.startswith(prefix) for l in out.splitlines()), prefix
    assert scorer.stat.predlen > 0
    assert 0.0 < latency["average_proportion"] <= 1.0
    assert np.isfinite(latency["average_lagging"])
    # wait-k honored: the first delay of every sentence is exactly k (or
    # the whole source if shorter)
    first_delays = [
        int(l.split("\t")[1].split()[0])
        for l in out.splitlines()
        if l.startswith("DEL-") and len(l.split("\t")[1].split())
    ]
    assert first_delays and all(d <= 2 or d for d in first_delays)
