"""fconv (ConvS2S): incremental equivalence + train/generate e2e."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu import registry

from .utils import dummy_dictionary, model_args


def test_fconv_incremental_matches_full():
    d = dummy_dictionary(20)

    class T:
        source_dictionary = d
        target_dictionary = d

    args = model_args(
        "fconv",
        encoder_embed_dim=16, decoder_embed_dim=16, decoder_out_embed_dim=16,
        encoder_layers="[(16, 3)] * 2", decoder_layers="[(16, 3)] * 2",
        max_source_positions=64, max_target_positions=64,
    )
    registry.apply_architecture(args)
    m = registry.build_model(args, T())
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(4, 20, size=(2, 6)))
    prev = jnp.asarray(rng.randint(4, 20, size=(2, 4))).at[:, 0].set(2)
    (full, _), _ = m.forward(
        v, {"src_tokens": src, "src_lengths": jnp.array([6, 6]),
            "prev_output_tokens": prev},
    )
    enc, _ = m.encode(v, src, jnp.array([6, 6]))
    cache = m.init_cache(v, 2, 4, enc)
    steps = []
    for i in range(4):
        lg, cache, _ = m.decode_step(v, prev[:, i: i + 1], cache, jnp.int32(i), enc)
        steps.append(lg)
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-4)


def test_fconv_train_generate(tmp_path):
    from fbk_fairseq_st_tpu.cli import generate as generate_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir, n=12)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--arch", "fconv_iwslt_de_en",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "nag", "--lr", "0.25", "--clip-norm", "0.1",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--decoder-out-embed-dim", "16",
            "--encoder-layers", "[(16, 3)] * 2",
            "--decoder-layers", "[(16, 3)] * 2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0


def test_fconv_self_att_train_and_generate(tmp_path, capsys):
    """fconv_self_att with gated, downsampled self-attention end-to-end."""
    import os

    from fbk_fairseq_st_tpu.cli import generate as generate_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--arch", "fconv_self_att_wp",
            "--criterion", "cross_entropy",
            "--optimizer", "nag", "--lr", "0.05", "--momentum", "0.99",
            "--clip-norm", "0.1",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "[(16, 3)] * 2",
            "--decoder-layers", "[(16, 4)] * 2",
            "--encoder-embed-dim", "16",
            "--decoder-embed-dim", "16",
            "--decoder-out-embed-dim", "16",
            "--self-attention", "True",
            "--multihead-self-attention-nheads", "2",
            "--encoder-attention", "True",
            "--encoder-attention-nheads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
    generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())


def test_fconv_self_att_incremental_equals_full():
    """decode_step (full-width re-decode) matches the training forward."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fbk_fairseq_st_tpu import registry

    from .utils import dummy_dictionary

    d = dummy_dictionary(20)

    class T:
        source_dictionary = d
        target_dictionary = d

    args = argparse.Namespace(
        arch="fconv_self_att_wp",
        encoder_layers="[(8, 3)] * 2", decoder_layers="[(8, 4)] * 2",
        encoder_embed_dim=8, decoder_embed_dim=8, decoder_out_embed_dim=8,
        self_attention="True", multihead_self_attention_nheads=2,
        max_source_positions=32, max_target_positions=32,
    )
    registry.apply_architecture(args)
    m = registry.MODELS["fconv_self_att"].build_model(args, T())
    v = m.init(jax.random.PRNGKey(0))

    src = jnp.array([[4, 5, 6, 2]])
    lengths = jnp.array([4])
    prev = jnp.array([[2, 7, 8, 9]])
    enc, _ = m.encode(v, src, lengths)
    (full_logits, _), _ = m.forward(
        v, {"src_tokens": src, "src_lengths": lengths,
            "prev_output_tokens": prev},
    )
    cache = m.init_cache(v, {}, 8, enc)
    for t in range(prev.shape[1]):
        step_logits, cache, _ = m.decode_step(
            v, prev[:, t: t + 1], cache, t, enc
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits[:, t]),
            rtol=2e-4, atol=2e-4,
        )


def test_fconv_self_att_fusion(tmp_path, capsys):
    """--pretrained fusion: frozen pretrained copy + gated joining."""
    import os

    from fbk_fairseq_st_tpu.cli import generate as generate_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    data_dir = str(tmp_path / "d")
    create_translation_data(data_dir)
    tiny = [
        "--task", "translation", "-s", "en", "-t", "de",
        "--criterion", "cross_entropy",
        "--optimizer", "nag", "--lr", "0.05", "--momentum", "0.99",
        "--clip-norm", "0.1", "--lr-scheduler", "fixed",
        "--max-tokens", "200", "--max-epoch", "1",
        "--encoder-layers", "[(16, 3)] * 2",
        "--decoder-layers", "[(16, 4)] * 2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--decoder-out-embed-dim", "16",
        "--self-attention", "True",
        "--multihead-self-attention-nheads", "2",
        "--max-source-positions", "64", "--max-target-positions", "64",
        "--log-format", "none",
    ]
    pre_dir = str(tmp_path / "pre")
    train_cli.cli_main(
        [data_dir, "--save-dir", pre_dir, "--arch", "fconv_self_att_wp"]
        + tiny
    )
    fuse_dir = str(tmp_path / "fuse")
    ckpt = os.path.join(pre_dir, "checkpoint_last.pt")
    train_cli.cli_main(
        [
            data_dir, "--save-dir", fuse_dir, "--arch", "fconv_self_att_wp",
            "--pretrained", "True", "--pretrained-checkpoint", ckpt,
        ] + tiny
    )
    assert "checkpoint_last.pt" in os.listdir(fuse_dir)
    generate_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(fuse_dir, "checkpoint_last.pt"),
            "--beam", "1", "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())
