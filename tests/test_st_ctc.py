"""speech_translation_with_transcription + ctc_multi_loss end-to-end
(BASELINE.json config 3: CTC-compression encoder, joint CTC+CE loss)."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_binaries import create_dummy_speech_data


def create_st_data(data_dir, n=16, vocab=12, seed=0):
    create_dummy_speech_data(data_dir, n=n, vocab=vocab, seed=seed)
    rng = np.random.RandomState(seed + 1)
    # source-language transcripts
    for split, count in [("train", n), ("valid", 4), ("test", 4)]:
        with open(os.path.join(data_dir, f"{split}_raw.en"), "w") as f:
            for _ in range(count):
                length = rng.randint(2, 6)
                f.write(
                    " ".join(f"src{rng.randint(vocab)}" for _ in range(length))
                    + "\n"
                )
    preprocess_cli.cli_main(
        [
            "--source-lang", "en",
            "--trainpref", os.path.join(data_dir, "train_raw"),
            "--validpref", os.path.join(data_dir, "valid_raw"),
            "--testpref", os.path.join(data_dir, "test_raw"),
            "--destdir", data_dir,
            "--dataset-impl", "cached",
        ]
    )


ST_ARGS = [
    "--task", "speech_translation_with_transcription",
    "--source-lang", "en",
    "--target-lang", "de",
    "--arch", "conv_transformer",
    "--criterion", "ctc_multi_loss",
    "--underlying-criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1",
    "--ctc-encoder-layer", "1",
    "--ctc-weight", "0.5",
    "--ctc-compress-out",
    "--ctc-compress-strategy", "avg",
    "--optimizer", "adam",
    "--lr", "0.001",
    "--lr-scheduler", "inverse_sqrt",
    "--warmup-updates", "4",
    "--max-tokens", "400",
    "--max-epoch", "1",
    "--encoder-layers", "2",
    "--decoder-layers", "2",
    "--encoder-embed-dim", "16",
    "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32",
    "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2",
    "--decoder-attention-heads", "2",
    "--encoder-convolutions", "[(4, 3, 3)] * 2",
    "--input-feat-per-channel", "8",
    "--max-source-positions", "64",
    "--max-target-positions", "32",
    "--log-format", "none",
]


@pytest.fixture(scope="module")
def st_trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("st")
    data_dir, save_dir = str(root / "data"), str(root / "ckpt")
    create_st_data(data_dir)
    train_cli.cli_main([data_dir, "--save-dir", save_dir] + ST_ARGS)
    return data_dir, save_dir


def test_st_ctc_train(st_trained):
    data_dir, save_dir = st_trained
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_st_ctc_generate(st_trained, capsys):
    data_dir, save_dir = st_trained
    scorer = generate_cli.cli_main(
        [
            data_dir,
            "--task", "speech_translation_with_transcription",
            "--source-lang", "en",
            "--target-lang", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2",
            "--max-tokens", "400",
            "--gen-subset", "test",
            "--max-len-b", "10",
            "--log-format", "none",
        ]
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())
    assert scorer.stat.predlen > 0


def test_transcription_collater():
    """Transcript rows stay aligned with the frame-sorted batch
    (reference transcription_dataset.py collater :22-63)."""
    from fbk_fairseq_st_tpu.data.datasets import (
        FilterBankToTextDataset,
        TranscriptionWrapperDataset,
    )
    from .utils import dummy_dictionary

    d = dummy_dictionary(10)

    class _Src:
        def __init__(self, items):
            self.items = items

        def __getitem__(self, i):
            return self.items[i]

        def __len__(self):
            return len(self.items)

        def size(self, i):
            return self.items[i].shape[0]

    rng = np.random.RandomState(0)
    frames = [rng.randn(t, 4).astype(np.float32) for t in (5, 9, 3)]
    tgts = [np.array([4, 5, 2]), np.array([5, 2]), np.array([6, 6, 6, 2])]
    transcripts = [np.array([7, 2]), np.array([8, 9, 2]), np.array([4, 2])]

    base = FilterBankToTextDataset(_Src(frames), _Src(tgts), d, skip_normalization=True)
    ds = TranscriptionWrapperDataset(base, _Src(transcripts), d)
    batch = ds.collater([ds[0], ds[1], ds[2]])

    # sorted by descending frames: order = [1, 0, 2]
    np.testing.assert_array_equal(batch["id"], [1, 0, 2])
    np.testing.assert_array_equal(
        batch["transcript_target"][0][:3], transcripts[1]
    )
    np.testing.assert_array_equal(
        batch["transcript_target"][1][:2], transcripts[0]
    )
    np.testing.assert_array_equal(batch["transcript_target_lengths"], [3, 2, 2])
    # prev tokens: eos moved to beginning
    assert batch["net_input"]["transcript_prev_output_tokens"][0][0] == d.eos()


def test_w2l_conv_glu_ctc_train(tmp_path):
    """wav2letter Conv+GLU encoder-only model trains with ctc_loss through
    the train CLI (reference w2l_conv_glu_enc.py role, minus the external
    ASG criterion)."""
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_dummy_speech_data(data_dir, n=8)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "speech_recognition", "-t", "de",
            "--arch", "asr_w2l_conv_glu_encoder",
            "--conv-enc-config", "[(8, 5, 4, 0.1), (12, 5, 0, 0.1)]",
            "--input-feat-per-channel", "8",
            "--criterion", "ctc_loss",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "400", "--max-epoch", "1",
            "--log-format", "none",
        ]
    )
    import os

    assert "checkpoint_last.pt" in os.listdir(save_dir)
