"""Masked LM: mask dataset semantics, model forward, end-to-end training
(reference tests/test_binaries.py masked_lm case role)."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.data.mask_tokens import (
    MaskedLMDataset,
    MaskedTokensPair,
    get_whole_word_mask,
)

from .utils import dummy_dictionary


class ListDataset:
    def __init__(self, items):
        self.items = [np.asarray(x) for x in items]

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def num_tokens(self, i):
        return len(self.items[i])

    def size(self, i):
        return len(self.items[i])

    @property
    def sizes(self):
        return np.array([len(x) for x in self.items])


def make_pair(d, items, **kwargs):
    mask_idx = d.add_symbol("<mask>")
    kwargs.setdefault("seed", 3)
    return MaskedTokensPair(
        ListDataset(items), d, pad_idx=d.pad(), mask_idx=mask_idx, **kwargs
    ), mask_idx


def test_mask_pair_shapes_and_determinism():
    d = dummy_dictionary(50)
    items = [np.random.RandomState(i).randint(4, 50, size=30) for i in range(4)]
    pair, mask_idx = make_pair(d, items)
    a, b = pair[0], pair[0]
    np.testing.assert_array_equal(a["source"], b["source"])
    np.testing.assert_array_equal(a["target"], b["target"])
    assert len(a["source"]) == len(items[0])
    # targets: original ids at masked positions, pad elsewhere
    tgt = a["target"]
    masked = tgt != d.pad()
    np.testing.assert_array_equal(tgt[masked], items[0][masked])
    # masked count ~ 15%
    assert 1 <= masked.sum() <= 12
    # source has mask tokens at (most) masked positions
    assert (a["source"] == mask_idx).sum() >= 1


def test_mask_pair_epoch_changes_mask():
    d = dummy_dictionary(50)
    items = [np.random.RandomState(0).randint(4, 50, size=40)]
    pair, _ = make_pair(d, items)
    a = pair[0]["source"].copy()
    pair.set_epoch(1)
    b = pair[0]["source"]
    assert not np.array_equal(a, b)


def test_mask_statistics():
    """Over many items the masked fraction approaches mask_prob and the
    10%/10% unmask/random split shows up in the sources."""
    d = dummy_dictionary(100)
    rng = np.random.RandomState(0)
    items = [rng.randint(4, 100, size=100) for _ in range(200)]
    pair, mask_idx = make_pair(d, items)
    n_masked = n_mask_tok = n_rand = n_total = 0
    for i in range(len(items)):
        s = pair[i]
        masked = s["target"] != d.pad()
        n_masked += masked.sum()
        n_total += len(s["source"])
        n_mask_tok += (s["source"] == mask_idx).sum()
        # random replacement: masked position, not mask token, differs
        n_rand += (
            masked & (s["source"] != mask_idx) & (s["source"] != items[i])
        ).sum()
    frac = n_masked / n_total
    assert 0.13 < frac < 0.17
    # ~80% of masked become <mask>, ~10% random
    assert 0.7 < n_mask_tok / n_masked < 0.9
    assert 0.03 < n_rand / n_masked < 0.2


def test_whole_word_masking():
    d = dummy_dictionary(10)
    cont = d.add_symbol("xy@@")  # continuation token
    begin = d.add_symbol("zt")
    mask_arr = get_whole_word_mask(None, d)
    assert not mask_arr[cont]
    assert mask_arr[begin]
    items = [np.array([begin, cont, cont, begin, begin] * 8)]
    pair, mask_idx = make_pair(
        d, items, mask_prob=0.3, mask_whole_words=mask_arr,
        leave_unmasked_prob=0.0, random_token_prob=0.0,
    )
    s = pair[0]
    src = s["source"]
    # a masked word-begin drags its continuations with it
    for j in range(len(src)):
        if items[0][j] == cont and src[j] == mask_idx:
            # find word begin
            k = j
            while items[0][k] == cont:
                k -= 1
            assert src[k] == mask_idx


def test_collater_fixed_shapes():
    d = dummy_dictionary(50)
    items = [np.random.RandomState(i).randint(4, 50, size=10 + i) for i in range(3)]
    pair, _ = make_pair(d, items)
    ds = MaskedLMDataset(pair, d.pad())
    batch = ds.collater([ds[0], ds[1]], pad_to_src_len=16, pad_to_bsz=4)
    assert batch["net_input"]["src_tokens"].shape == (4, 16)
    assert batch["target"].shape == (4, 16)
    assert batch["id"].tolist()[2:] == [-1, -1]


def test_masked_lm_model_forward():
    import argparse

    import jax

    from fbk_fairseq_st_tpu import registry

    d = dummy_dictionary(30)
    d.add_symbol("<mask>")

    class T:
        dictionary = d

    args = argparse.Namespace(
        arch="bert_base", tokens_per_sample=32,
        encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, max_positions=32,
    )
    registry.apply_architecture(args)
    m = registry.MODELS["masked_lm"].build_model(args, T())
    v = m.init(jax.random.PRNGKey(0))
    assert "embed_out" not in v["params"]  # bert_base ties embeddings
    assert "sentence_projection" in v["params"]  # bert_base has NSP head
    import jax.numpy as jnp

    batch = {"src_tokens": jnp.array([[0, 5, 6, 7, 2], [0, 8, 9, 2, 1]])}
    (logits, extra), _ = m.forward(v, batch)
    assert logits.shape == (2, 5, len(d))
    assert extra["pooled_output"].shape == (2, 16)
    assert extra["sentence_logits"].shape == (2, 2)


def test_masked_lm_train(tmp_path):
    """End-to-end: preprocess lm data -> train bert_base tiny."""
    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir, exist_ok=True)
    raw = os.path.join(data_dir, "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in [("train", 30), ("valid", 5)]:
        with open(os.path.join(raw, split), "w") as f:
            for _ in range(n):
                f.write(
                    " ".join(f"tok{rng.randint(20)}"
                             for _ in range(rng.randint(4, 12))) + "\n"
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
            "--task", "masked_lm",
            "--arch", "bert_base",
            "--criterion", "masked_lm",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--encoder-layers", "2", "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def make_multilingual_lm_data(root, langs=("aa", "bb"), n=(20, 8)):
    """Per-language subdirs sharing one dictionary."""
    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli

    rng = np.random.RandomState(0)
    raw = root.rstrip("/") + "_raw"  # outside root: the task
    os.makedirs(raw, exist_ok=True)
    os.makedirs(root, exist_ok=True)
    # scans root subdirs as languages; one shared vocab across languages
    for li, (lang, count) in enumerate(zip(langs, n)):
        for split, cnt in [("train", count), ("valid", 4)]:
            with open(os.path.join(raw, f"{split}.{lang}"), "w") as f:
                for _ in range(cnt):
                    f.write(
                        " ".join(f"tok{rng.randint(15)}"
                                 for _ in range(rng.randint(4, 10))) + "\n"
                    )
    # build one dict from all languages
    import shutil

    first = True
    for lang in langs:
        dest = os.path.join(root, lang)
        args = [
            "--only-source",
            "--trainpref", os.path.join(raw, f"train.{lang}"),
            "--validpref", os.path.join(raw, f"valid.{lang}"),
            "--destdir", dest,
            "--dataset-impl", "mmap",
        ]
        if not first:
            args += ["--srcdict", os.path.join(root, "dict.txt")]
        preprocess_cli.cli_main(args)
        if first:
            shutil.copy(
                os.path.join(dest, "dict.txt"), os.path.join(root, "dict.txt")
            )
            first = False


def test_multilingual_masked_lm_train(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path / "data")
    make_multilingual_lm_data(root)
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "multilingual_masked_lm",
            "--multilang-sampling-alpha", "0.5",
            "--arch", "bert_base",
            "--criterion", "masked_lm",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--encoder-layers", "2", "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_multilingual_denoising_train(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path / "data")
    make_multilingual_lm_data(root)
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "multilingual_denoising",
            "--add-lang-token",
            "--mask", "0.3", "--replace-length", "1",
            "--arch", "mbart_base",
            "--criterion", "cross_entropy",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
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


def make_legacy_lm_data(root, langs=None):
    """Monolingual data with a MaskedLMDictionary-compatible dict.txt."""
    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli

    rng = np.random.RandomState(0)
    raw = root.rstrip("/") + "_raw"
    os.makedirs(raw, exist_ok=True)
    os.makedirs(root, exist_ok=True)
    names = langs or [None]
    for lang in names:
        suffix = f".{lang}" if lang else ""
        for split, cnt in [("train", 20), ("valid", 5)]:
            with open(os.path.join(raw, split + suffix), "w") as f:
                for _ in range(cnt):
                    f.write(
                        " ".join(f"tok{rng.randint(15)}"
                                 for _ in range(rng.randint(4, 10))) + "\n"
                    )
    first = True
    for lang in names:
        suffix = f".{lang}" if lang else ""
        args = [
            "--only-source",
            "--task",
            "cross_lingual_lm" if langs else "legacy_masked_lm",
            "--trainpref", os.path.join(raw, "train" + suffix),
            "--validpref", os.path.join(raw, "valid" + suffix),
            "--destdir", root,
            "--dataset-impl", "mmap",
        ]
        if not first:
            args += ["--srcdict", os.path.join(root, "dict.txt")]
        preprocess_cli.cli_main(args)
        if lang:
            import shutil

            for split in ("train", "valid"):
                for ext in ("bin", "idx"):
                    shutil.move(
                        os.path.join(root, f"{split}.{ext}"),
                        os.path.join(root, f"{split}.{lang}.{ext}"),
                    )
        first = False


def test_legacy_masked_lm_train(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path / "data")
    make_legacy_lm_data(root)
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "legacy_masked_lm",
            "--arch", "bert_base",
            "--criterion", "legacy_masked_lm_loss",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-sentences", "4", "--max-epoch", "1",
            "--encoder-layers", "2", "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
            "--max-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_cross_lingual_lm_train(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path / "data")
    make_legacy_lm_data(root, langs=["aa", "bb"])
    save_dir = str(tmp_path / "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "cross_lingual_lm",
            "--monolingual-langs", "aa,bb",
            "--arch", "xlm_base",
            "--criterion", "legacy_masked_lm_loss",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-sentences", "4", "--max-epoch", "1",
            "--encoder-layers", "2", "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
            "--max-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
