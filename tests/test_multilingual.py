"""Multilingual ST: round-robin training over language pairs, langtok
merging (concat/sum), decoder langtok bos, inference for one pair."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_binaries import create_dummy_speech_data


def create_multilingual_data(data_dir, n=8, vocab=12, seed=0):
    # en-de data (audio + de text + dict.de)
    create_dummy_speech_data(data_dir, n=n, vocab=vocab, seed=seed)
    # add a second target language 'nl' over the same audio
    rng = np.random.RandomState(seed + 7)
    for split, count in [("train", n), ("valid", 4), ("test", 4)]:
        with open(os.path.join(data_dir, f"{split}_raw.nl"), "w") as f:
            for _ in range(count):
                length = rng.randint(2, 6)
                f.write(
                    " ".join(f"nl{rng.randint(vocab)}" for _ in range(length)) + "\n"
                )
    preprocess_cli.cli_main(
        [
            "--target-lang", "nl",
            "--trainpref", os.path.join(data_dir, "train_raw"),
            "--validpref", os.path.join(data_dir, "valid_raw"),
            "--testpref", os.path.join(data_dir, "test_raw"),
            "--destdir", data_dir,
            "--dataset-impl", "cached",
        ]
    )
    # audio 'source' dict for langtok purposes is not required (audio input)


ML_ARGS = [
    "--task", "multilingual_speech_translation",
    "--lang-pairs", "audio-de,audio-nl",
    "--arch", "multilingual_conv_transformer",
    "--criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1",
    "--encoder-langtok", "tgt",
    "--decoder-langtok",
    "--share-encoders",
    "--optimizer", "adam", "--lr", "0.001",
    "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
    "--max-tokens", "400", "--max-epoch", "1",
    "--encoder-layers", "2", "--decoder-layers", "2",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--encoder-convolutions", "[(4, 3, 3)] * 2",
    "--input-feat-per-channel", "8",
    "--max-source-positions", "64", "--max-target-positions", "32",
    "--log-format", "none",
]


@pytest.fixture(scope="module", params=["concat", "sum"])
def ml_trained(tmp_path_factory, request):
    root = tmp_path_factory.mktemp(f"ml_{request.param}")
    data_dir, save_dir = str(root / "data"), str(root / "ckpt")
    create_multilingual_data(data_dir)
    train_cli.cli_main(
        [data_dir, "--save-dir", save_dir,
         "--langtok-merge-strategy", request.param] + ML_ARGS
    )
    return data_dir, save_dir, request.param


def test_multilingual_train(ml_trained):
    _, save_dir, _ = ml_trained
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_multilingual_generate_one_pair(ml_trained, capsys):
    data_dir, save_dir, merge = ml_trained
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "multilingual_speech_translation",
            "--lang-pairs", "audio-de,audio-nl",
            "-s", "audio", "-t", "de",
            "--langtok-merge-strategy", merge,
            "--encoder-langtok", "tgt",
            "--decoder-langtok",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "400",
            "--gen-subset", "test", "--max-len-b", "8",
            "--log-format", "none", "--quiet",
        ]
    )
    assert scorer.stat.predlen > 0


def test_pretrained_decoder_dict_resize(tmp_path):
    """Fine-tuning path: a bilingual checkpoint's decoder warm-starts the
    multilingual model whose dictionaries grew by the language tokens
    (reference resize_model_to_new_dict)."""
    import argparse
    import pickle

    import jax
    import numpy as np

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.models.multilingual_conv_transformer import (
        _lang_token,
    )
    from .utils import dummy_dictionary

    # "old" dictionary (pretraining) and the same dict + lang tokens
    vocab = 20
    d_old = dummy_dictionary(vocab)
    d_new = dummy_dictionary(vocab)
    langs = ["audio", "de", "nl"]
    for lang in langs:
        d_new.add_symbol(_lang_token(lang))

    common = dict(
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_convolutions="[(4, 3, 3)] * 2",
        input_feat_per_channel=8,
        max_source_positions=64, max_target_positions=32,
        criterion="label_smoothed_cross_entropy",
    )

    # pretrain-style checkpoint on the old dict
    class OldTask:
        target_dictionary = d_old
        source_dictionary = None

    args = argparse.Namespace(arch="conv_transformer", **common)
    registry.apply_architecture(args)
    pre_model = registry.build_model(args, OldTask())
    pre_vars = pre_model.init(jax.random.PRNGKey(1))
    ckpt = str(tmp_path / "pre.pt")
    with open(ckpt, "wb") as f:
        pickle.dump(
            {"model": jax.tree_util.tree_map(np.asarray, pre_vars["params"])},
            f,
        )

    ml_dicts = {lang: d_new for lang in langs}

    class MLTask:
        dicts = ml_dicts
        langs = ["audio", "de", "nl"]

    ml_args = argparse.Namespace(
        arch="multilingual_conv_transformer",
        lang_pairs="audio-de,audio-nl",
        share_encoders=True,
        encoder_langtok="tgt", decoder_langtok=True,
        langtok_merge_strategy="sum",
        pretrained_decoder=ckpt, pretrained_encoder=ckpt,
        allow_partial_restore=False,
        **common,
    )
    registry.apply_architecture(ml_args)
    ml_model = registry.build_model(ml_args, MLTask())
    v = ml_model.init(jax.random.PRNGKey(2))

    old_w = np.asarray(pre_vars["params"]["decoder"]["embed_tokens"]["w"])
    for key, dec in v["params"]["decoders"].items():
        new_w = np.asarray(dec["embed_tokens"]["w"])
        assert new_w.shape[0] == old_w.shape[0] + len(langs)
        np.testing.assert_array_equal(new_w[: old_w.shape[0]], old_w)
        # new language-token rows kept their fresh (nonzero) init
        assert np.abs(new_w[old_w.shape[0]:]).sum() > 0
    # encoder warm-started exactly
    for key, enc in v["params"]["encoders"].items():
        got = np.asarray(enc["layers"][0]["self_attn"]["q"]["w"])
        want = np.asarray(
            pre_vars["params"]["encoder"]["layers"][0]["self_attn"]["q"]["w"]
        )
        np.testing.assert_array_equal(got, want)


def test_multilingual_with_transcripts_train(tmp_path):
    """multilingual_speech_translation_with_transcr: per-pair source
    transcripts wrap every pair's dataset (TranscriptionWrapper) and the
    round-robin training loop still runs end-to-end."""
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_multilingual_data(data_dir)
    # binarize transcripts for the shared source 'audio'
    rng = np.random.RandomState(99)
    for split, count in [("train", 8), ("valid", 4), ("test", 4)]:
        with open(os.path.join(data_dir, f"{split}_raw.audio"), "w") as f:
            for _ in range(count):
                f.write(
                    " ".join(
                        f"tr{rng.randint(10)}"
                        for _ in range(rng.randint(2, 5))
                    ) + "\n"
                )
    preprocess_cli.cli_main([
        "--target-lang", "audio",
        "--trainpref", os.path.join(data_dir, "train_raw"),
        "--validpref", os.path.join(data_dir, "valid_raw"),
        "--testpref", os.path.join(data_dir, "test_raw"),
        "--destdir", data_dir, "--dataset-impl", "cached",
    ])
    argv = [data_dir, "--save-dir", save_dir] + ML_ARGS
    argv[argv.index("--task") + 1] = (
        "multilingual_speech_translation_with_transcr"
    )
    train_cli.cli_main(argv)
    assert "checkpoint1.pt" in os.listdir(save_dir)

    # the task actually loaded transcripts: a collated batch carries them
    import argparse

    from fbk_fairseq_st_tpu import options
    from fbk_fairseq_st_tpu.registry import TASKS

    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, argv)
    task = TASKS[args.task].setup_task(args)
    task.load_dataset("train")
    ds = task.dataset("train")
    batch = ds.collater([ds[0], ds[1]])
    pair_batch = next(iter(batch.values())) if isinstance(
        batch, dict) and "net_input" not in batch else batch
    assert "transcript_target" in pair_batch, sorted(pair_batch)


def test_multilingual_kd_requires_teacher_dumps(tmp_path):
    """The KD variant hard-fails with an actionable message when the
    teacher top-k dumps are absent (its success path shares the
    TeacherOutputDataset machinery proven in tests/test_kd.py)."""
    data_dir = str(tmp_path / "data")
    create_multilingual_data(data_dir)

    from fbk_fairseq_st_tpu import options
    from fbk_fairseq_st_tpu.registry import TASKS

    parser = options.get_training_parser()
    argv = [data_dir, "--distill-topk", "4"] + ML_ARGS
    argv[argv.index("--task") + 1] = (
        "multilingual_speech_translation_with_transcr_kd"
    )
    args = options.parse_args_and_arch(parser, argv)
    task = TASKS[args.task].setup_task(args)
    with pytest.raises(AssertionError, match="Teacher datasets not found"):
        task.load_dataset("train")
