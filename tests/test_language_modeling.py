"""Language modeling: token blocks, LM training, eval_lm perplexity."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import eval_lm as eval_lm_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import train as train_cli
from fbk_fairseq_st_tpu.data.monolingual import TokenBlockDataset


class _Toks:
    def __init__(self, items):
        self.items = [np.asarray(i, np.int64) for i in items]
        self.sizes = np.array([len(i) for i in items], np.int64)

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)


def test_token_block_modes():
    ds = _Toks([[1, 2, 3], [4, 5], [6, 7, 8, 9]])
    # none: fixed blocks of 4 over the concatenated stream
    tb = TokenBlockDataset(ds, ds.sizes, 4, pad=1, eos=2, break_mode="none")
    np.testing.assert_array_equal(tb[0], [1, 2, 3, 4])
    np.testing.assert_array_equal(tb[1], [5, 6, 7, 8])
    np.testing.assert_array_equal(tb[2], [9])
    # eos: one sentence per block
    tb = TokenBlockDataset(ds, ds.sizes, None, pad=1, eos=2, break_mode="eos")
    assert len(tb) == 3
    np.testing.assert_array_equal(tb[1], [4, 5])
    # complete: whole sentences up to 5 tokens
    tb = TokenBlockDataset(ds, ds.sizes, 5, pad=1, eos=2, break_mode="complete")
    np.testing.assert_array_equal(tb[0], [1, 2, 3, 4, 5])
    np.testing.assert_array_equal(tb[1], [6, 7, 8, 9])


def create_lm_data(data_dir, n=30, vocab=12, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(data_dir, exist_ok=True)
    raw = os.path.join(data_dir, "raw")
    os.makedirs(raw, exist_ok=True)
    for split, count in [("train", n), ("valid", 5), ("test", 5)]:
        with open(os.path.join(raw, f"{split}.txt"), "w") as f:
            for _ in range(count):
                length = rng.randint(3, 9)
                f.write(
                    " ".join(f"w{rng.randint(vocab)}" for _ in range(length)) + "\n"
                )
    # binarize with a single 'txt' lang then rename to LM layout
    preprocess_cli.cli_main(
        [
            "--target-lang", "txt",
            "--trainpref", os.path.join(raw, "train"),
            "--validpref", os.path.join(raw, "valid"),
            "--testpref", os.path.join(raw, "test"),
            "--destdir", data_dir,
            "--dataset-impl", "mmap",
        ]
    )
    import shutil

    for split in ("train", "valid", "test"):
        for ext in ("bin", "idx"):
            shutil.move(
                os.path.join(data_dir, f"{split}.txt.{ext}"),
                os.path.join(data_dir, f"{split}.{ext}"),
            )
    shutil.move(
        os.path.join(data_dir, "dict.txt.txt"), os.path.join(data_dir, "dict.txt")
    )


def test_lm_train_and_eval(tmp_path):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--sample-break-mode", "eos",
            "--tokens-per-sample", "32",
            "--arch", "transformer_lm",
            "--share-decoder-input-output-embed",
            "--criterion", "cross_entropy",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
            "--max-tokens", "128", "--max-epoch", "1",
            "--decoder-layers", "2",
            "--decoder-embed-dim", "16",
            "--decoder-ffn-embed-dim", "32",
            "--decoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)

    avg_nll, total = eval_lm_cli.cli_main(
        [
            data_dir,
            "--task", "language_modeling",
            "--sample-break-mode", "eos",
            "--tokens-per-sample", "32",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test",
            "--max-tokens", "128",
            "--log-format", "none",
        ]
    )
    assert total > 0
    assert np.isfinite(avg_nll)


import pytest


@pytest.mark.parametrize(
    "arch,extra",
    [
        ("fconv_lm", ["--decoder-layers", "[(16, 3)] * 2",
                      "--decoder-embed-dim", "16",
                      "--decoder-out-embed-dim", "16"]),
        ("lstm_lm", ["--decoder-layers", "2", "--decoder-embed-dim", "16",
                     "--decoder-hidden-size", "16",
                     "--decoder-out-embed-dim", "16"]),
        ("lightconv_lm", ["--decoder-layers", "2",
                          "--decoder-embed-dim", "16",
                          "--decoder-conv-dim", "16",
                          "--decoder-ffn-embed-dim", "32",
                          "--decoder-attention-heads", "2",
                          "--decoder-kernel-size-list", "[3, 5]"]),
    ],
)
def test_lm_variants_train_and_eval(tmp_path, arch, extra):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--arch", arch,
            "--criterion", "cross_entropy",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--log-format", "none",
        ] + extra
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
    import io
    from contextlib import redirect_stdout

    from fbk_fairseq_st_tpu.cli import eval_lm as eval_lm_cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_lm_cli.cli_main(
            [
                data_dir,
                "--task", "language_modeling",
                "--path", os.path.join(save_dir, "checkpoint_last.pt"),
                "--tokens-per-sample", "32",
                "--max-tokens", "256",
                "--gen-subset", "valid",
                "--log-format", "none",
            ]
        )


def test_adaptive_softmax_lm(tmp_path):
    """transformer_lm with adaptive softmax + adaptive_loss: log-prob
    composition is exact (sums to 1) and training runs end-to-end."""
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.adaptive_softmax import (
        adaptive_log_probs,
        _parse_cutoff,
        init_adaptive_softmax,
    )

    vocab, dim = 50, 16
    cutoff = _parse_cutoff("10,30", vocab)
    p = init_adaptive_softmax(jax.random.PRNGKey(0), vocab, dim, cutoff)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, dim))
    lp = adaptive_log_probs(p, cutoff, x)
    assert lp.shape == (3, 5, vocab)
    sums = jnp.exp(jax.scipy.special.logsumexp(lp, axis=-1))
    np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-5)

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--arch", "transformer_lm",
            "--criterion", "adaptive_loss",
            "--adaptive-softmax-cutoff", "8,12",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--decoder-layers", "2", "--decoder-embed-dim", "16",
            "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_adaptive_input_embeddings():
    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.adaptive_softmax import (
        adaptive_embed,
        _parse_cutoff,
        init_adaptive_input,
    )

    vocab, out_dim = 40, 16
    cutoff = _parse_cutoff("8,20", vocab)
    p = init_adaptive_input(jax.random.PRNGKey(0), vocab, 1, 16, 2.0,
                            out_dim, cutoff)
    ids = jnp.array([[0, 5, 9, 25, 39], [1, 7, 19, 20, 2]])
    emb = adaptive_embed(p, cutoff, ids)
    assert emb.shape == (2, 5, out_dim)
    # padding row embeds to zero (zero embedding + linear proj no bias)
    np.testing.assert_allclose(np.asarray(emb[1, 0]), 0.0, atol=1e-7)


def test_hf_gpt2_lm_train(tmp_path):
    """Hugging Face Flax GPT-2 inside the training loop."""
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--arch", "hf_gpt2",
            "--criterion", "cross_entropy",
            "--optimizer", "adam", "--lr", "0.0001",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "128", "--max-epoch", "1",
            "--embed-dim", "16", "--num-layers", "2",
            "--num-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_transformer_from_pretrained_xlm(tmp_path):
    """XLM-pretrained NMT warm start: matching leaves copied into both
    encoder and decoder."""
    import argparse
    import pickle

    import jax

    from fbk_fairseq_st_tpu import registry

    from .utils import dummy_dictionary

    d = dummy_dictionary(20)
    d.add_symbol("<mask>")

    class T:
        source_dictionary = d
        target_dictionary = d
        dictionary = d

    common = dict(
        encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        max_source_positions=32, max_target_positions=32,
    )
    xlm_args = argparse.Namespace(
        arch="xlm_base", tokens_per_sample=32, max_positions=32,
        encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2,
    )
    registry.apply_architecture(xlm_args)
    xlm = registry.MODELS["masked_lm"].build_model(xlm_args, T())
    xlm_vars = xlm.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "xlm.pt")
    with open(ckpt, "wb") as f:
        pickle.dump({"model": xlm_vars["params"]}, f)

    args = argparse.Namespace(
        arch="transformer_from_pretrained_xlm",
        pretrained_xlm_checkpoint=ckpt,
        **common,
    )
    registry.apply_architecture(args)
    m = registry.MODELS["transformer_from_pretrained_xlm"].build_model(
        args, T()
    )
    v = m.init(jax.random.PRNGKey(1))
    got = np.asarray(
        v["params"]["encoder"]["layers"][0]["fc1"]["w"]
    )
    want = np.asarray(xlm_vars["params"]["layers"][0]["fc1"]["w"])
    np.testing.assert_array_equal(got, want)
    # decoder self-attn warm-started too
    got_d = np.asarray(
        v["params"]["decoder"]["layers"][1]["fc1"]["w"]
    )
    want_d = np.asarray(xlm_vars["params"]["layers"][1]["fc1"]["w"])
    np.testing.assert_array_equal(got_d, want_d)


def test_layerdrop_and_pruning(tmp_path):
    """Train with --decoder-layerdrop then load with
    --decoder-layers-to-keep pruning half the stack."""
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--arch", "transformer_lm",
            "--criterion", "cross_entropy",
            "--decoder-layerdrop", "0.5",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--decoder-layers", "4", "--decoder-embed-dim", "16",
            "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    from fbk_fairseq_st_tpu.train.checkpoint import load_model_ensemble

    ensemble, args = load_model_ensemble(
        [os.path.join(save_dir, "checkpoint_last.pt")],
        arg_overrides={"decoder_layers_to_keep": "0,2"},
    )
    model, variables = ensemble[0]
    assert len(variables["params"]["decoder"]["layers"]) == 2
    assert args.decoder_layers == 2
    # pruned model still scores
    import jax.numpy as jnp

    batch = {"src_tokens": jnp.array([[2, 5, 6, 7]])}
    (logits, _), _ = model.forward(variables, batch)
    assert logits.shape[0] == 1


def test_adaptive_input_lm_train(tmp_path):
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--arch", "transformer_lm",
            "--criterion", "adaptive_loss",
            "--adaptive-input", "--adaptive-input-cutoff", "8,12",
            "--adaptive-input-factor", "2",
            "--adaptive-softmax-cutoff", "8,12",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--tokens-per-sample", "32",
            "--max-tokens", "256", "--max-epoch", "1",
            "--decoder-layers", "2", "--decoder-embed-dim", "16",
            "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


def test_lm_context_window_dataset_carries_context():
    """Unit semantics of the sliding-window wrapper (reference
    data/lm_context_window_dataset.py): context carried across collates,
    targets padded outside the fresh window, budget trimming."""
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.data.monolingual import (
        LMContextWindowDataset,
        MonolingualDataset,
    )

    d = Dictionary()
    for i in range(8):
        d.add_symbol(f"w{i}")
    items = [
        np.array([4, 5, 6, d.eos()]),
        np.array([7, 8, d.eos()]),
        np.array([9, 10, 11, d.eos()]),
    ]
    mono = MonolingualDataset(_Toks(items), [len(x) for x in items], d)
    wrapped = LMContextWindowDataset(
        mono, tokens_per_sample=8, context_window=3, pad_idx=d.pad()
    )

    b0 = wrapped.collater([wrapped[0]])
    # first batch: no context yet
    assert b0["start_indices"][0] == 0
    assert b0["target"][0, : 4].tolist() == items[0].tolist()

    b1 = wrapped.collater([wrapped[1]])
    # second batch: last 3 non-pad tokens of batch 0 prepended
    assert b1["start_indices"][0] == 3
    # (the carry is over the shifted SOURCE row [eos, 4, 5, 6], as in the
    # reference wrapper)
    src = b1["net_input"]["src_tokens"][0]
    assert src[:3].tolist() == [4, 5, 6]
    # context positions are not scored
    assert (b1["target"][0, :3] == d.pad()).all()
    assert b1["target"][0, 3:6].tolist() == items[1].tolist()
    assert b1["net_input"]["src_lengths"][0] == len(items[1]) + 3


def test_eval_lm_context_window(tmp_path):
    """--context-window end to end: same token count scored, finite ppl,
    and a different (context-conditioned) NLL than the windowless run."""
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "language_modeling",
            "--sample-break-mode", "eos",
            "--tokens-per-sample", "32",
            "--arch", "transformer_lm",
            "--share-decoder-input-output-embed",
            "--criterion", "cross_entropy",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
            "--max-tokens", "128", "--max-epoch", "1",
            "--decoder-layers", "2",
            "--decoder-embed-dim", "16",
            "--decoder-ffn-embed-dim", "32",
            "--decoder-attention-heads", "2",
            "--log-format", "none",
        ]
    )
    base_argv = [
        data_dir,
        "--task", "language_modeling",
        "--sample-break-mode", "eos",
        "--tokens-per-sample", "32",
        "--path", os.path.join(save_dir, "checkpoint_last.pt"),
        "--gen-subset", "test",
        "--max-tokens", "128",
        "--log-format", "none",
    ]
    nll_plain, total_plain = eval_lm_cli.cli_main(list(base_argv))
    nll_ctx, total_ctx = eval_lm_cli.cli_main(
        base_argv + ["--context-window", "8"]
    )
    assert total_ctx == total_plain  # same tokens scored
    assert np.isfinite(nll_ctx)
    assert nll_ctx != nll_plain  # context actually conditioned the scores

    # --output-word-probs / --output-word-stats (reference eval_lm
    # WordStat): per-word "word [logprob]" records on stdout, stats via
    # the logger; the aggregate NLL is unchanged
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        nll_words, total_words = eval_lm_cli.cli_main(
            base_argv + ["--output-word-probs", "--output-word-stats"]
        )
    assert total_words == total_plain
    assert nll_words == nll_plain
    word_lines = [
        l for l in buf.getvalue().splitlines() if "[" in l and "]" in l
    ]
    assert word_lines, "no word-probability records printed"


def test_tie_adaptive_weights_shares_parameters():
    """Baevski & Auli tying: with --tie-adaptive-weights the adaptive
    softmax reuses the adaptive input embedding leaves — fewer free
    parameters, normalized outputs, and output-layer gradients flow into
    the embedding tables."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"w{i}")

    class T:
        target_dictionary = d
        source_dictionary = d

    def build(tied, tie_proj=True):
        args = argparse.Namespace(
            arch="transformer_lm",
            criterion="cross_entropy",
            decoder_embed_dim=16, decoder_ffn_embed_dim=32,
            decoder_layers=1, decoder_attention_heads=2,
            adaptive_input=True, adaptive_input_cutoff="20,40",
            adaptive_input_factor=2.0,
            adaptive_softmax_cutoff="20,40", adaptive_softmax_factor=2.0,
            tie_adaptive_weights=tied, tie_adaptive_proj=tie_proj,
            tokens_per_sample=16, dropout=0.0, attention_dropout=0.0,
        )
        registry.apply_architecture(args)
        model = registry.build_model(args, T())
        variables = model.init(jax.random.PRNGKey(0))
        return model, variables

    model_t, var_t = build(True)
    model_u, var_u = build(False)

    n_params = lambda v: sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"])
    )
    assert n_params(var_t) < n_params(var_u)  # shared leaves dropped

    tokens = jnp.asarray(
        np.random.RandomState(0).randint(4, 60, size=(2, 8))
    )
    (lp, _), _ = model_t.forward(var_t, {"src_tokens": tokens})
    # composed adaptive log-probs normalize over the full vocab
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(
            lp.astype(jnp.float32), axis=-1
        )),
        0.0, atol=1e-4,
    )

    # grads reach the input embedding tables from the OUTPUT layer alone
    def loss_from_output_only(params):
        v = {"params": params, "state": var_t["state"]}
        feats = jnp.ones((2, 8, 16), jnp.float32)
        out = model_t.decoder.output_layer(v["params"]["decoder"], feats)
        return out.astype(jnp.float32).sum()

    g = jax.grad(loss_from_output_only)(var_t["params"])
    emb_g = g["decoder"]["adaptive_input"]["clusters"][0]["embed"]["w"]
    assert float(np.abs(np.asarray(emb_g)).max()) > 0

    # untied-proj variant also builds and normalizes
    model_np, var_np = build(True, tie_proj=False)
    (lp2, _), _ = model_np.forward(var_np, {"src_tokens": tokens})
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(
            lp2.astype(jnp.float32), axis=-1
        )),
        0.0, atol=1e-4,
    )


# ---------------------------------------------------------------------------
# round 4: multi-target LM data + complete_doc + output-dictionary-size
# (reference tasks/language_modeling.py:65-199, data/monolingual_dataset.py,
# data/token_block_dataset.py:120-146)
# ---------------------------------------------------------------------------


@pytest.mark.quick
def test_token_block_include_targets():
    """include_targets: source/past shift across block boundaries; only the
    stream start is eos/pad padded (reference token_block_dataset.py:128-146).
    Stream = [1,2,3,4,5,6,7,8,9]."""
    ds = _Toks([[1, 2, 3], [4, 5], [6, 7, 8, 9]])
    tb = TokenBlockDataset(ds, ds.sizes, 4, pad=0, eos=2,
                           break_mode="none", include_targets=True)
    src, item, past = tb[0]
    np.testing.assert_array_equal(item, [1, 2, 3, 4])
    np.testing.assert_array_equal(src, [2, 1, 2, 3])     # eos-led shift
    np.testing.assert_array_equal(past, [0, 2, 1, 2])    # pad,eos-led shift
    src, item, past = tb[1]
    np.testing.assert_array_equal(item, [5, 6, 7, 8])
    np.testing.assert_array_equal(src, [4, 5, 6, 7])     # crosses boundary
    np.testing.assert_array_equal(past, [3, 4, 5, 6])

    # start == 1 corner (past needs one eos of padding)
    tb1 = TokenBlockDataset(ds, ds.sizes, 1, pad=0, eos=2,
                            break_mode="none", include_targets=True)
    src, item, past = tb1[1]
    np.testing.assert_array_equal(item, [2])
    np.testing.assert_array_equal(src, [1])
    np.testing.assert_array_equal(past, [2])


@pytest.mark.quick
def test_token_block_complete_doc():
    """complete_doc: a size-1 sentence (lone eos = empty line) is a document
    boundary no block crosses (reference token_block_utils_fast.pyx:75-95)."""
    ds = _Toks([[1, 2, 3], [2], [4, 5], [6, 7], [2], [8, 9]])
    tb = TokenBlockDataset(ds, ds.sizes, 10, pad=0, eos=2,
                           break_mode="complete_doc", include_targets=False)
    assert len(tb) == 3
    np.testing.assert_array_equal(tb[0], [1, 2, 3])
    np.testing.assert_array_equal(tb[1], [4, 5, 6, 7])
    np.testing.assert_array_equal(tb[2], [8, 9])
    # small block size still never crosses the separator
    tb = TokenBlockDataset(ds, ds.sizes, 2, pad=0, eos=2,
                           break_mode="complete_doc")
    got = [tb[i].tolist() for i in range(len(tb))]
    assert got == [[1, 2, 3], [4, 5], [6, 7], [8, 9]]


@pytest.mark.quick
def test_monolingual_multi_target_matches_reference():
    """targets=['self','future','past'] + add_eos_for_other_targets +
    add_bos_token + --output-dictionary-size truncation: sample-for-sample
    equality with the reference MonolingualDataset fed the same
    (source, future, past) triples."""
    import torch

    from .test_reference_equivalence import _load_reference

    _load_reference()
    from fairseq.data.monolingual_dataset import (
        MonolingualDataset as RefMono,
    )
    from fairseq.data.dictionary import Dictionary as RefDictionary

    from fbk_fairseq_st_tpu.data.dictionary import (
        Dictionary,
        TruncatedDictionary,
    )
    from fbk_fairseq_st_tpu.data.monolingual import MonolingualDataset

    def fill(d):
        for i in range(10):
            d.add_symbol(f"w{i}")
        return d

    d_my, d_ref = fill(Dictionary()), fill(RefDictionary())
    # 'complete'-mode triples (some blocks do not end in eos)
    ds = _Toks([[4, 5, 6], [7, 8], [9, 10, 11, 2]])
    tb = TokenBlockDataset(ds, ds.sizes, 5, pad=d_my.pad(), eos=d_my.eos(),
                           break_mode="complete", include_targets=True)

    class _RefTriples(torch.utils.data.Dataset):
        def __len__(self):
            return len(tb)

        def __getitem__(self, i):
            s, t, p = tb[i]
            return (torch.tensor(s), torch.tensor(t), torch.tensor(p))

    from fairseq.data.dictionary import TruncatedDictionary as RefTrunc

    for targets in (["future"], ["self", "future", "past"], ["past"]):
        for trunc, bos in ((None, False), (10, True)):
            if bos and len(targets) > 1:
                # the reference's _maybe_add_bos crashes on a target LIST
                # (monolingual_dataset.py:136 list.new) — this build handles
                # it; nothing to compare against
                continue
            tv_my = (TruncatedDictionary(d_my, trunc) if trunc else d_my)
            tv_ref = (RefTrunc(d_ref, trunc) if trunc else d_ref)
            mine = MonolingualDataset(
                tb, tb.sizes, d_my, tv_my, add_eos_for_other_targets=True,
                shuffle=False, targets=list(targets), add_bos_token=bos,
            )
            ref = RefMono(
                _RefTriples(), tb.sizes, d_ref, tv_ref,
                add_eos_for_other_targets=True, shuffle=False,
                targets=list(targets), add_bos_token=bos,
            )
            for i in range(len(tb)):
                a, b = mine[i], ref[i]
                np.testing.assert_array_equal(
                    a["source"], b["source"].numpy(), err_msg=str((targets, i))
                )
                if isinstance(a["target"], list):
                    assert len(a["target"]) == len(b["target"])
                    for x, y in zip(a["target"], b["target"]):
                        np.testing.assert_array_equal(x, y.numpy())
                else:
                    np.testing.assert_array_equal(
                        a["target"], b["target"].numpy()
                    )
            # collated batches agree (reference collate pads with pad_idx)
            bm = mine.collater([mine[i] for i in range(len(tb))])
            br = ref.collater([ref[i] for i in range(len(tb))])
            np.testing.assert_array_equal(
                bm["net_input"]["src_tokens"],
                br["net_input"]["src_tokens"].numpy(),
            )
            if isinstance(bm["target"], list):
                for x, y in zip(bm["target"], br["target"]):
                    np.testing.assert_array_equal(x, y.numpy())
            else:
                np.testing.assert_array_equal(
                    bm["target"], br["target"].numpy()
                )


def test_lm_task_new_flags_end_to_end(tmp_path):
    """--output-dictionary-size / --add-bos-token / --future-target /
    complete_doc parse and train through the real CLI; --self-target is
    rejected for a decoder-only LM (supported_targets validation)."""
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    base = [
        data_dir, "--save-dir", save_dir,
        "--task", "language_modeling",
        "--sample-break-mode", "complete_doc",
        "--tokens-per-sample", "16",
        "--arch", "transformer_lm",
        "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "fixed",
        "--max-tokens", "128", "--max-epoch", "1",
        "--decoder-layers", "1",
        "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32",
        "--decoder-attention-heads", "2",
        "--log-format", "none",
        "--output-dictionary-size", "10",
        "--add-bos-token", "--future-target",
        "--truncate-sequence",
    ]
    train_cli.cli_main(base)
    assert "checkpoint_last.pt" in os.listdir(save_dir)

    # eval_lm against the truncated-output checkpoint
    avg_nll, total = eval_lm_cli.cli_main(
        [
            data_dir,
            "--task", "language_modeling",
            "--sample-break-mode", "eos",
            "--tokens-per-sample", "16",
            "--output-dictionary-size", "10",
            "--add-bos-token",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--gen-subset", "test",
            "--max-tokens", "128",
            "--log-format", "none",
        ]
    )
    assert total > 0 and np.isfinite(avg_nll)

    # decoder-only LMs support only the 'future' target
    bad = list(base)
    bad[bad.index("--future-target")] = "--self-target"
    with pytest.raises(ValueError, match="Unsupported language modeling"):
        train_cli.cli_main(bad)
