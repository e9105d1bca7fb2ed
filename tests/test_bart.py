"""BART denoising pretraining: noise functions, task composition,
end-to-end training (reference bart/denoising role)."""

import argparse
import os

import numpy as np

from .utils import dummy_dictionary


def make_denoiser(d, mask_idx, **kw):
    from fbk_fairseq_st_tpu.data.denoising_dataset import DenoisingDataset

    class Items:
        def __init__(self, items):
            self.items = items

        def __getitem__(self, i):
            return self.items[i]

        def __len__(self):
            return len(self.items)

    defaults = dict(
        mask=0.0, mask_random=0.0, insert=0.0, rotate=0.0,
        permute_sentences=0.0, mask_length="subword", replace_length=-1,
        poisson_lambda=3.0, bpe=None, permute=0.0,
    )
    defaults.update(kw)
    args = argparse.Namespace(**defaults)
    items = kw.pop("_items")
    ds = DenoisingDataset(
        Items(items), [len(x) for x in items], d, mask_idx,
        mask_whole_words=None, shuffle=False, seed=3, args=args,
    )
    return ds


def make_items(d, n=4, length=12, seed=0):
    rng = np.random.RandomState(seed)
    items = []
    for _ in range(n):
        body = rng.randint(d.nspecial, len(d), size=length - 2)
        items.append(
            np.concatenate([[d.bos()], body, [d.eos()]]).astype(np.int64)
        )
    return items


def test_mask_noise_preserves_frame():
    d = dummy_dictionary(30)
    mask_idx = d.add_symbol("<mask>")
    items = make_items(d)
    ds = make_denoiser(d, mask_idx, mask=0.3, replace_length=1,
                       _items=items)
    s = ds[0]
    assert s["source"][0] == d.bos() and s["source"][-1] == d.eos()
    assert (s["source"] == mask_idx).sum() >= 1
    np.testing.assert_array_equal(s["target"], items[0])
    # deterministic per (seed, epoch, index)
    np.testing.assert_array_equal(ds[0]["source"], s["source"])
    ds.set_epoch(1)
    assert not np.array_equal(ds[0]["source"], s["source"])


def test_span_mask_deletes_tokens():
    d = dummy_dictionary(30)
    mask_idx = d.add_symbol("<mask>")
    items = make_items(d, length=20)
    ds = make_denoiser(
        d, mask_idx, mask=0.4, mask_length="span-poisson",
        replace_length=1, _items=items,
    )
    s = ds[0]
    # span masking at replace_length=1 collapses each span to one <mask>
    assert len(s["source"]) <= len(items[0])
    assert (s["source"] == mask_idx).sum() >= 1


def test_insertion_and_rotation():
    d = dummy_dictionary(30)
    mask_idx = d.add_symbol("<mask>")
    items = make_items(d)
    ds = make_denoiser(d, mask_idx, insert=0.2, replace_length=1, _items=items)
    s = ds[0]
    assert len(s["source"]) > len(items[0])
    ds = make_denoiser(d, mask_idx, rotate=1.0, replace_length=1, _items=items)
    s = ds[0]
    assert len(s["source"]) == len(items[0])
    assert s["source"][0] == d.bos() and s["source"][-1] == d.eos()
    assert sorted(s["source"].tolist()) == sorted(items[0].tolist())


def test_collater_layout():
    d = dummy_dictionary(30)
    mask_idx = d.add_symbol("<mask>")
    items = make_items(d)
    ds = make_denoiser(d, mask_idx, mask=0.3, replace_length=1,
                       _items=items)
    batch = ds.collater([ds[0], ds[1]])
    ni = batch["net_input"]
    assert ni["src_tokens"].shape[0] == 2
    assert ni["prev_output_tokens"][0, 0] == d.eos()  # moved eos
    assert (batch["target"][:, -1] != d.pad()).any()


def test_bart_train(tmp_path):
    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    data_dir = str(tmp_path / "data")
    raw = os.path.join(data_dir, "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in [("train", 20), ("valid", 4)]:
        with open(os.path.join(raw, split), "w") as f:
            for _ in range(n):
                f.write(
                    " ".join(f"tok{rng.randint(15)}"
                             for _ in range(rng.randint(4, 10))) + "\n"
                )
    preprocess_cli.cli_main(
        [
            "--only-source",
            "--trainpref", os.path.join(raw, "train"),
            "--validpref", os.path.join(raw, "valid"),
            "--destdir", data_dir,
            "--dataset-impl", "mmap",
        ]
    )
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        [
            data_dir,
            "--save-dir", save_dir,
            "--task", "denoising",
            "--arch", "bart_base",
            "--criterion", "cross_entropy",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--mask", "0.3", "--rotate", "0.3", "--insert", "0.1",
            "--replace-length", "1",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_bart_classification_head():
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry

    d = dummy_dictionary(20)
    d.add_symbol("<mask>")

    class T:
        source_dictionary = d
        target_dictionary = d

    args = argparse.Namespace(
        arch="bart_base",
        encoder_layers=1, decoder_layers=1,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=32, max_target_positions=32,
    )
    registry.apply_architecture(args)
    m = registry.MODELS["bart"].build_model(args, T())
    m.register_classification_head("h", num_classes=3)
    v = m.init(jax.random.PRNGKey(0))
    batch = {
        "src_tokens": jnp.array([[0, 5, 6, 2], [0, 7, 2, 1]]),
        "src_lengths": jnp.array([4, 3]),
    }
    (logits, _), _ = m.forward(v, batch, classification_head_name="h")
    assert logits.shape == (2, 3)


def test_translation_from_pretrained_bart(tmp_path, capsys):
    """mBART fine-tuning layout: [lang] appended, generation terminates on
    the target-language token."""
    from fbk_fairseq_st_tpu.cli import generate as generate_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import create_translation_data

    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli

    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir)
    # rebuild with one joined dictionary (mBART requirement)
    raw = os.path.join(data_dir, "raw")
    preprocess_cli.cli_main(
        [
            "--source-lang", "en", "--target-lang", "de",
            "--joined-dictionary",
            "--trainpref", os.path.join(raw, "train"),
            "--validpref", os.path.join(raw, "valid"),
            "--testpref", os.path.join(raw, "test"),
            "--destdir", data_dir,
            "--dataset-impl", "mmap",
        ]
    )
    common = [
        "--task", "translation_from_pretrained_bart",
        "-s", "en", "-t", "de",
        "--langs", "en,de",
    ]
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--arch", "mbart_base",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "2", "--decoder-layers", "2",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ] + common
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
    generate_cli.cli_main(
        [
            data_dir,
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-tokens", "200",
            "--gen-subset", "test", "--max-len-b", "10",
            "--log-format", "none",
        ] + common
    )
    out = capsys.readouterr().out
    assert any(line.startswith("H-") for line in out.splitlines())
