"""wav2vec pretraining: raw audio dataset, CPC model forward, VQ variants,
end-to-end training (reference wav2vec + audio_pretraining role)."""

import os

import numpy as np
import pytest

from .test_asr_json import write_wav

TINY = dict(
    conv_feature_layers="[(8, 4, 2), (8, 4, 2)]",
    conv_aggregator_layers="[(8, 3, 1)] * 2",
    prediction_steps=3,
    num_negatives=2,
)


def make_model(**overrides):
    import argparse

    import jax

    from fbk_fairseq_st_tpu import registry

    class T:
        source_dictionary = None
        target_dictionary = None

    kwargs = dict(TINY)
    kwargs.update(overrides)
    args = argparse.Namespace(arch="wav2vec", **kwargs)
    registry.apply_architecture(args)
    m = registry.MODELS["wav2vec"].build_model(args, T())
    v = m.init(jax.random.PRNGKey(0))
    return m, v


def test_wav2vec_forward_shapes():
    import jax.numpy as jnp

    m, v = make_model()
    src = jnp.asarray(np.random.RandomState(0).randn(2, 256).astype(np.float32))
    (logits, extra), _ = m.forward(v, {"source": src})
    # feature time: conv stride 2 twice over 256 samples
    S, N, B, T = extra["cpc_logits"].shape
    assert S == 3 and N == 3 and B == 2  # 1 positive + 2 negatives
    assert extra["cpc_targets"].shape == (S, N, B, T)
    assert extra["cpc_valid"].shape == (S, N, B, T)
    # beyond-horizon positions invalid
    assert not bool(extra["cpc_valid"][..., -1].any())


def test_wav2vec_negatives_exclude_self():
    import jax
    import jax.numpy as jnp

    m, v = make_model()
    y = jnp.arange(2 * 10, dtype=jnp.float32).reshape(2, 10, 1)
    y = jnp.broadcast_to(y, (2, 10, 4))
    negs = m.sample_negatives(jax.random.PRNGKey(1), y)
    # negatives never equal the positive at the same timestep
    pos = y[None]
    assert not bool(jnp.all(negs == pos, axis=-1).any())


@pytest.mark.parametrize("vq", ["gumbel", "kmeans"])
def test_wav2vec_vq_variants(vq):
    import jax.numpy as jnp

    m, v = make_model(vq_type=vq, vq_vars=8, vq_groups=2, vq_dim=8)
    src = jnp.asarray(np.random.RandomState(0).randn(2, 256).astype(np.float32))
    (_, extra), _ = m.forward(v, {"source": src})
    if vq == "gumbel":
        assert "prob_perplexity" in extra
    else:
        assert "kmeans_loss" in extra


def make_audio_data(root, n=6, rate=16000):
    audio = os.path.join(root, "audio")
    os.makedirs(audio, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        length = rng.randint(rate // 8, rate // 4)
        write_wav(os.path.join(audio, f"u{i}.wav"), rng.randn(length) * 0.1, rate)
        lines.append(f"u{i}.wav\t{length}")
    for split in ("train", "valid"):
        with open(os.path.join(root, f"{split}.tsv"), "w") as f:
            f.write(audio + "\n" + "\n".join(lines) + "\n")


def test_file_audio_dataset(tmp_path):
    from fbk_fairseq_st_tpu.data.raw_audio_dataset import FileAudioDataset

    root = str(tmp_path)
    make_audio_data(root)
    ds = FileAudioDataset(
        os.path.join(root, "train.tsv"), 16000, max_sample_size=3000
    )
    assert len(ds) == 6
    item = ds[0]
    assert abs(float(item["source"].mean())) < 1e-4  # normalized
    batch = ds.collater([ds[0], ds[1]])
    src = batch["net_input"]["source"]
    assert src.shape[0] == 2 and src.shape[1] <= 3000


def test_wav2vec_train(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path)
    make_audio_data(root)
    save_dir = os.path.join(root, "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "audio_pretraining",
            "--arch", "wav2vec",
            "--criterion", "binary_cross_entropy",
            "--optimizer", "adam", "--lr", "0.0001",
            "--lr-scheduler", "fixed",
            "--conv-feature-layers", TINY["conv_feature_layers"],
            "--conv-aggregator-layers", TINY["conv_aggregator_layers"],
            "--prediction-steps", "3", "--num-negatives", "2",
            "--max-sample-size", "3000",
            "--max-sentences", "3", "--max-epoch", "1",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
