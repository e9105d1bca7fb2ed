"""RoBERTa + sentence_prediction: model forward, GLUE-style classification
fine-tune end-to-end (reference tests/test_binaries.py roberta cases role)."""

import os

import numpy as np

from fbk_fairseq_st_tpu.data.dictionary import Dictionary

from .utils import dummy_dictionary


def test_roberta_forward_lm_and_heads():
    import argparse

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu import registry

    d = dummy_dictionary(30)
    d.add_symbol("<mask>")

    class T:
        source_dictionary = d
        target_dictionary = d

    args = argparse.Namespace(
        arch="roberta_base", tokens_per_sample=32,
        encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, max_positions=32,
    )
    registry.apply_architecture(args)
    m = registry.MODELS["roberta"].build_model(args, T())
    m.register_classification_head("sentence_classification_head",
                                   num_classes=3)
    v = m.init(jax.random.PRNGKey(0))
    assert "embed_out" not in v["params"]  # tied by default
    assert "sentence_classification_head" in v["params"]["classification_heads"]

    batch = {"src_tokens": jnp.array([[0, 5, 6, 2], [0, 8, 2, 1]])}
    (logits, _), _ = m.forward(v, batch)
    assert logits.shape == (2, 4, len(d))
    (cls_logits, _), _ = m.forward(
        v, batch, classification_head_name="sentence_classification_head"
    )
    assert cls_logits.shape == (2, 3)
    (feats, _), _ = m.forward(v, batch, features_only=True)
    assert feats.shape == (2, 4, 16)


def make_sentence_prediction_data(root, n_classes=2, n=24):
    """input0 indexed data + label indexed data + dicts."""
    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli

    rng = np.random.RandomState(0)
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    for split, count in [("train", n), ("valid", 6)]:
        with open(os.path.join(raw, f"{split}.inp"), "w") as fi, open(
            os.path.join(raw, f"{split}.lbl"), "w"
        ) as fl:
            for _ in range(count):
                length = rng.randint(3, 8)
                fi.write(
                    " ".join(f"w{rng.randint(12)}" for _ in range(length))
                    + "\n"
                )
                fl.write(f"class{rng.randint(n_classes)}\n")

    for kind, ext in [("input0", "inp"), ("label", "lbl")]:
        dest = os.path.join(root, kind)
        preprocess_cli.cli_main(
            [
                "--only-source",
                "--trainpref", os.path.join(raw, f"train.{ext}"),
                "--validpref", os.path.join(raw, f"valid.{ext}"),
                "--destdir", dest,
                "--dataset-impl", "mmap",
            ]
        )


def test_sentence_prediction_finetune(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path)
    make_sentence_prediction_data(root)
    save_dir = os.path.join(root, "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "sentence_prediction",
            "--num-classes", "2",
            "--init-token", "0",
            "--arch", "roberta_base",
            "--criterion", "sentence_prediction",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--max-positions", "32",
            "--max-sentences", "8", "--max-epoch", "2",
            "--encoder-layers", "2", "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_label_offset_mapping(tmp_path):
    """Label dataset ids map to 0-based classes via nspecial offset."""
    root = str(tmp_path)
    make_sentence_prediction_data(root, n_classes=3)

    import argparse

    from fbk_fairseq_st_tpu.registry import TASKS

    args = argparse.Namespace(
        data=root, num_classes=3, init_token=0, separator_token=None,
        regression_target=False, no_shuffle=True, truncate_sequence=False,
        max_positions=64, seed=1, dataset_impl=None,
    )
    task = TASKS["sentence_prediction"].setup_task(args)
    task.load_dataset("train")
    ds = task.dataset("train")
    classes = {int(np.asarray(ds[i]["target"]).reshape(-1)[0])
               for i in range(len(ds))}
    assert classes <= {0, 1, 2} and len(classes) == 3
    # init token prepended
    assert ds[0]["source"][0] == 0


def make_ranking_data(root, n_options=3, n=16):
    from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli

    rng = np.random.RandomState(0)
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    files = {}
    for kind in ["input0"] + [f"input{i+1}" for i in range(n_options)]:
        files[kind] = {}
    labels = {}
    for split, count in [("train", n), ("valid", 4)]:
        for kind in files:
            files[kind][split] = []
        labels[split] = []
        for _ in range(count):
            for kind in files:
                length = rng.randint(2, 6)
                files[kind][split].append(
                    " ".join(f"w{rng.randint(12)}" for _ in range(length))
                )
            labels[split].append(rng.randint(n_options))
    for kind in files:
        for split in ("train", "valid"):
            with open(os.path.join(raw, f"{split}.{kind}"), "w") as f:
                f.write("\n".join(files[kind][split]) + "\n")
        preprocess_cli.cli_main(
            [
                "--only-source",
                "--trainpref", os.path.join(raw, f"train.{kind}"),
                "--validpref", os.path.join(raw, f"valid.{kind}"),
                "--destdir", os.path.join(root, kind),
                "--dataset-impl", "mmap",
            ]
        )
    os.makedirs(os.path.join(root, "label"), exist_ok=True)
    for split in ("train", "valid"):
        with open(os.path.join(root, "label", f"{split}.label"), "w") as f:
            f.write("\n".join(str(x) for x in labels[split]) + "\n")


def test_sentence_ranking_finetune(tmp_path):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = str(tmp_path)
    make_ranking_data(root)
    save_dir = os.path.join(root, "ckpt")
    train_cli.cli_main(
        [
            root,
            "--save-dir", save_dir,
            "--task", "sentence_ranking",
            "--num-classes", "3",
            "--init-token", "0", "--separator-token", "2",
            "--arch", "roberta_base",
            "--criterion", "sentence_ranking",
            "--optimizer", "adam", "--lr", "0.0005",
            "--lr-scheduler", "fixed",
            "--max-positions", "64",
            "--max-sentences", "4", "--max-epoch", "1",
            "--encoder-layers", "2", "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_roberta_hub_interface():
    """encode/decode, extract_features, predict, fill_mask."""
    import argparse

    import jax

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.models.roberta import RobertaHubInterface

    d = dummy_dictionary(30)
    d.add_symbol("<mask>")

    class T:
        source_dictionary = d
        target_dictionary = d

    args = argparse.Namespace(
        arch="roberta_base", tokens_per_sample=32,
        encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2, max_positions=32, bpe=None,
    )
    registry.apply_architecture(args)
    m = registry.MODELS["roberta"].build_model(args, T())
    m.register_classification_head("h", num_classes=3)
    v = m.init(jax.random.PRNGKey(0))
    hub = RobertaHubInterface(args, T(), m, v)

    toks = hub.encode("tok4 tok5")
    assert toks[0] == d.bos() and toks[-1] == d.eos()
    assert hub.decode(toks) == "tok4 tok5"
    feats = hub.extract_features(toks)
    assert feats.shape[-1] == 16
    lp = hub.predict("h", toks)
    assert lp.shape == (1, 3)
    fills = hub.fill_mask("tok4 <mask> tok5", topk=3)
    assert len(fills) == 3 and all(len(f) == 3 for f in fills)
