"""JSON speech-data route: audio frontend, asr_prep_json, AsrJsonDataset,
and end-to-end training through --dataset-from-json (reference
get_asr_dataset_from_json / AsrDataset role)."""

import json
import os
import wave

import numpy as np
import pytest

from fbk_fairseq_st_tpu.data.audio import apply_mv_norm, logmel_fbank, read_wav
from fbk_fairseq_st_tpu.data.dictionary import Dictionary


def write_wav(path, samples, rate=16000):
    samples = np.clip(samples, -1.0, 1.0)
    pcm = (samples * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def test_read_wav_roundtrip(tmp_path):
    rate = 16000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig, rate)
    data, r = read_wav(p)
    assert r == rate and len(data) == rate
    np.testing.assert_allclose(data / 32767.0, sig, atol=1e-4)


def test_fbank_shape_and_tone_peak(tmp_path):
    rate = 16000
    t = np.arange(rate) / rate  # 1s
    sig = 0.5 * np.sin(2 * np.pi * 1000 * t)
    feats = logmel_fbank((sig * 32767).astype(np.float32), rate, num_mel_bins=40)
    # snip-edges frame count: 1 + (16000 - 400) // 160 = 98
    assert feats.shape == (98, 40)
    assert np.all(np.isfinite(feats))
    # energy concentrates around the 1kHz bin, not at the edges
    peak_bin = int(np.argmax(feats.mean(axis=0)))
    assert 5 < peak_bin < 35
    # white noise peaks elsewhere than a pure tone
    noise = np.random.RandomState(0).randn(rate).astype(np.float32) * 1000
    nf = logmel_fbank(noise, rate, num_mel_bins=40)
    assert nf.shape == (98, 40)


def test_apply_mv_norm():
    f = np.random.RandomState(0).randn(50, 8).astype(np.float32) * 3 + 5
    out = apply_mv_norm(f)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-3)


@pytest.fixture(scope="module")
def json_data(tmp_path_factory):
    """Synthetic wavs + dict + JSON manifest via the asr_prep_json script."""
    root = tmp_path_factory.mktemp("asrjson")
    data_dir = str(root)
    audio_dir = os.path.join(data_dir, "audio")
    os.makedirs(audio_dir)
    rng = np.random.RandomState(0)

    d = Dictionary()
    for i in range(10):
        d.add_symbol(f"w{i}")
    d.finalize(padding_factor=1)
    dict_path = os.path.join(data_dir, "dict.txt")
    d.save(dict_path)

    rate = 16000
    labels = []
    for i in range(6):
        utt = f"spk{i%2}-ch1-{i:04d}"
        dur = rng.randint(rate // 4, rate // 2)  # 0.25-0.5s
        write_wav(
            os.path.join(audio_dir, utt + ".wav"),
            rng.randn(dur) * 0.1,
            rate,
        )
        words = " ".join(f"w{rng.randint(10)}" for _ in range(rng.randint(2, 5)))
        labels.append(f"{utt} {words}")
    labels_path = os.path.join(data_dir, "labels.txt")
    with open(labels_path, "w") as f:
        f.write("\n".join(labels) + "\n")

    from fbk_fairseq_st_tpu.scripts import asr_prep_json

    for split in ["train", "valid"]:
        asr_prep_json.cli_main(
            [
                "--audio-dirs", audio_dir,
                "--labels", labels_path,
                "--dictionary", dict_path,
                "--output", os.path.join(data_dir, f"{split}.json"),
            ]
        )
    return data_dir, d


def test_asr_prep_json_manifest(json_data):
    data_dir, d = json_data
    with open(os.path.join(data_dir, "train.json")) as f:
        utts = json.load(f)["utts"]
    assert len(utts) == 6
    u = next(iter(utts.values()))
    assert set(u["input"]) == {"length_ms", "path"}
    assert 250 <= u["input"]["length_ms"] <= 500
    ids = [int(x) for x in u["output"]["tokenid"].split(", ")]
    assert all(0 <= i < len(d) for i in ids)


def test_asr_json_dataset(json_data):
    data_dir, d = json_data
    from fbk_fairseq_st_tpu.data.asr_json import get_asr_dataset_from_json

    ds = get_asr_dataset_from_json(
        os.path.join(data_dir, "train.json"), d, skip_norm=False,
        num_mel_bins=24,
    )
    assert len(ds) == 6
    # sorted by descending duration
    assert all(
        ds.num_tokens(i) >= ds.num_tokens(i + 1) for i in range(len(ds) - 1)
    )
    item = ds[0]
    assert item["source"].shape[1] == 24
    assert item["target"][-1] == d.eos()
    batch = ds.collater([ds[0], ds[1]])
    assert batch["net_input"]["src_tokens"].shape[0] == 2
    assert batch["net_input"]["src_tokens"].shape[2] == 24
    # per-utterance CMVN applied
    assert abs(float(item["source"].mean())) < 1e-3


def test_train_from_json(json_data):
    data_dir, _ = json_data
    from fbk_fairseq_st_tpu.cli import train as train_cli

    save_dir = os.path.join(data_dir, "ckpt")
    train_cli.cli_main(
        [
            data_dir,
            "--save-dir", save_dir,
            "--task", "speech_recognition",
            "--dataset-from-json",
            "--arch", "conv_transformer",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "2000", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--input-feat-per-channel", "24",
            "--max-source-positions", "256", "--max-target-positions", "32",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
