"""VGG-Transformer ASR family: forward contracts, incremental decode
equivalence (conv buffers + KV cache), CTC encoder-only model, infer CLI
with sclite outputs (reference tests/speech_recognition/ harness role)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.cli import infer as infer_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_binaries import create_dummy_speech_data
from .utils import DummyTask, dummy_dictionary, model_args

SMALL = dict(
    input_feat_per_channel=8,
    vggblock_enc_config="[(4, 3, 2, 1, True)]",
    transformer_enc_config="((16, 2, 32, True, 0.1, 0.1, 0.1),) * 2",
    enc_output_dim=16,
    tgt_embed_dim=16,
    transformer_dec_config="((16, 2, 32, True, 0.1, 0.1, 0.1),) * 2",
    conv_dec_config="((16, 3, True),) * 2",
)


def test_vggtransformer_forward_and_incremental():
    task = DummyTask(dummy_dictionary(20))
    args = model_args("asr_vggtransformer", **SMALL)
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "src_tokens": jnp.asarray(rng.randn(2, 20, 8), jnp.float32),
        "src_lengths": jnp.array([20, 13]),
        "prev_output_tokens": jnp.array([[2, 5, 6, 7], [2, 8, 9, 1]]),
    }
    (logits, extra), _ = m.forward(v, batch)
    assert logits.shape == (2, 4, len(task.target_dictionary))
    enc = extra["encoder_out"]
    assert enc.encoder_out.shape[1] == 10  # pool k=2: ceil(20/2)

    # incremental == full
    enc_out, _ = m.encode(v, batch["src_tokens"], batch["src_lengths"])
    full, _ = m.decoder(
        v["params"]["decoder"],
        batch["prev_output_tokens"],
        encoder_out=enc_out.encoder_out,
        encoder_padding_mask=enc_out.encoder_padding_mask,
    )
    cache = m.init_cache(v, 2, 4, enc_out)
    steps = []
    for t in range(4):
        lg, cache, _ = m.decode_step(
            v, batch["prev_output_tokens"][:, t: t + 1], cache, jnp.int32(t), enc_out
        )
        steps.append(lg)
    inc = jnp.stack(steps, axis=1)
    # full-sequence masks pad keys in self-attention (fairseq parity); the
    # incremental path doesn't, so pad-input positions (whose logits a
    # generator never consumes) legitimately diverge -> compare valid ones
    valid = np.asarray(batch["prev_output_tokens"]) != task.target_dictionary.pad()
    np.testing.assert_allclose(
        np.asarray(full)[valid], np.asarray(inc)[valid], atol=2e-4
    )


def test_vggtransformer_context_and_sampling():
    task = DummyTask(dummy_dictionary(20))
    args = model_args(
        "asr_vggtransformer",
        transformer_context="(2, 1)",
        transformer_sampling="(1, 2)",
        **SMALL,
    )
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    enc, _ = m.encode(
        v,
        jnp.asarray(rng.randn(2, 20, 8), jnp.float32),
        jnp.array([20, 12]),
    )
    # pool /2 then layer-2 sampling /2
    assert enc.encoder_out.shape[1] == 5


def test_vggtransformer_encoder_only_ctc():
    d = dummy_dictionary(20)
    d.add_symbol("<ctc_blank>")
    task = DummyTask(d)
    args = model_args(
        "asr_vggtransformer_encoder",
        input_feat_per_channel=8,
        vggblock_enc_config="[(4, 3, 2, 1, True)]",
        transformer_enc_config="((16, 2, 32, True, 0.1, 0.1, 0.1),) * 2",
        enc_output_dim=16,
        criterion="ctc_loss",
    )
    registry.apply_architecture(args)
    m = registry.build_model(args, task)
    v = m.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    enc, _ = m.encode(
        v, jnp.asarray(rng.randn(2, 20, 8), jnp.float32), jnp.array([20, 10])
    )
    assert enc.ctc_out.shape[-1] == len(d)

    import argparse

    crit = registry.CRITERIONS["ctc_loss"].build_criterion(
        argparse.Namespace(sentence_avg=False, use_source_side_sample_size=False),
        task,
    )
    batch = {
        "src_tokens": jnp.asarray(rng.randn(2, 20, 8), jnp.float32),
        "src_lengths": jnp.array([20, 10]),
        "target": jnp.array([[4, 5, 2], [6, 2, 1]]),
        "target_lengths": jnp.array([3, 2]),
    }
    loss, ss, logging, _ = crit(m, v, batch)
    assert np.isfinite(float(loss))
    assert "errors" in logging and "total" in logging


def test_infer_cli_sclite_outputs(tmp_path):
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    results = str(tmp_path / "results")
    create_dummy_speech_data(data_dir, n=8)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition", "-t", "de",
            "--arch", "asr_vggtransformer",
            "--criterion", "cross_entropy_acc",
            "--optimizer", "adadelta", "--lr", "1.0",
            "--lr-scheduler", "fixed",
            "--max-tokens", "400", "--max-epoch", "1",
            "--input-feat-per-channel", "8",
            "--vggblock-enc-config", "[(4, 3, 2, 1, True)]",
            "--transformer-enc-config", "((16, 2, 32, True, 0.1, 0.1, 0.1),) * 2",
            "--enc-output-dim", "16",
            "--tgt-embed-dim", "16",
            "--transformer-dec-config", "((16, 2, 32, True, 0.1, 0.1, 0.1),) * 2",
            "--conv-dec-config", "((16, 3, True),) * 2",
            "--max-source-positions", "64", "--max-target-positions", "32",
            "--log-format", "none",
        ]
    )
    wer, uer = infer_cli.cli_main(
        [
            data_dir,
            "--task", "speech_recognition", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test",
            "--results-path", results,
            "--beam", "2", "--max-tokens", "400", "--max-len-b", "8",
            "--log-format", "none",
        ]
    )
    # native corpus WER/UER (the reference can only score offline via
    # external sclite)
    assert wer is not None and 0.0 <= wer
    assert uer is not None and 0.0 <= uer
    files = os.listdir(results)
    for prefix in ("hypo.word", "hypo.units", "ref.word", "ref.units"):
        match = [f for f in files if f.startswith(prefix)]
        assert match, f"missing {prefix} output"
        content = open(os.path.join(results, match[0])).read()
        assert "(" in content  # sclite trn format "(utt-utt)"


def test_infer_ctc_beam_decoding(tmp_path):
    """End-to-end --ctc-decoding {greedy,beam} through the infer CLI on a
    CTC encoder-only model, incl. a lexicon-constrained beam decode (native
    replacement for the reference's external w2l decoders)."""
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_dummy_speech_data(data_dir, n=8)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition", "-t", "de",
            "--arch", "asr_vggtransformer_encoder",
            "--criterion", "ctc_loss",
            "--optimizer", "adadelta", "--lr", "1.0",
            "--lr-scheduler", "fixed",
            "--max-tokens", "400", "--max-epoch", "1",
            "--input-feat-per-channel", "8",
            "--vggblock-enc-config", "[(4, 3, 2, 1, True)]",
            "--transformer-enc-config", "((16, 2, 32, True, 0.1, 0.1, 0.1),) * 2",
            "--enc-output-dim", "16",
            "--max-source-positions", "64", "--max-target-positions", "32",
            "--log-format", "none",
        ]
    )
    base_argv = [
        data_dir,
        "--task", "speech_recognition", "-t", "de",
        "--criterion", "ctc_loss",
        "--path", os.path.join(save_dir, "checkpoint_last.pt"),
        "--gen-subset", "test",
        "--max-tokens", "400",
        "--log-format", "none",
    ]
    for mode, extra in [
        ("greedy", []),
        ("beam", ["--ctc-beam-size", "8"]),
    ]:
        results = str(tmp_path / f"results_{mode}")
        infer_cli.cli_main(
            base_argv
            + ["--results-path", results, "--ctc-decoding", mode]
            + extra
        )
        files = os.listdir(results)
        assert any(f.startswith("hypo.units") for f in files), (mode, files)

    # lexicon-constrained beam: every hypothesis token path must follow the
    # lexicon trie (built over dictionary symbols)
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d = Dictionary.load(os.path.join(data_dir, "dict.de.txt"))
    syms = [d[i] for i in range(d.nspecial, min(len(d), d.nspecial + 4))]
    lexicon = str(tmp_path / "lexicon.txt")
    with open(lexicon, "w") as f:
        f.write(f"w1\t{syms[0]} {syms[1]}\n")
        f.write(f"w2\t{syms[2]}\n")
    results = str(tmp_path / "results_lex")
    infer_cli.cli_main(
        base_argv
        + [
            "--results-path", results,
            "--ctc-decoding", "beam",  # lexicon-only beam (no LM)
            "--lexicon", lexicon,
            "--ctc-beam-size", "8",
            "--word-boundary-unit", syms[3],
        ]
    )
    hypo_file = [
        f for f in os.listdir(results) if f.startswith("hypo.units")
    ][0]
    allowed = {syms[0], syms[1], syms[2], syms[3]}
    for line in open(os.path.join(results, hypo_file)):
        sent = line.rsplit("(", 1)[0].split()
        assert all(tok in allowed for tok in sent), (sent, allowed)

    # w2l-decoder kenlm with a native ARPA model: exercises the full
    # lexicon+LM fusion path through the CLI without the kenlm binding
    arpa = str(tmp_path / "words.arpa")
    with open(arpa, "w") as f:
        f.write(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n"
            "-99\t<s>\n-0.5\t</s>\n-0.3\tw1\n-0.6\tw2\n\n\\end\\\n"
        )
    results = str(tmp_path / "results_arpa")
    infer_cli.cli_main(
        base_argv
        + [
            "--results-path", results,
            "--w2l-decoder", "kenlm",
            "--kenlm-model", arpa,
            "--lexicon", lexicon,
            "--ctc-beam-size", "8",
            "--word-boundary-unit", syms[3],
            "--lm-weight", "1.0",
        ]
    )
    wrd_files = [f for f in os.listdir(results) if f.startswith("hypo.word-")]
    assert wrd_files, os.listdir(results)
    for line in open(os.path.join(results, wrd_files[0])):
        words = line.rsplit("(", 1)[0].split()
        assert all(w in {"w1", "w2"} for w in words), words
