"""CLI flag-surface parity with the reference parsers, and the functional
behavior behind the newly closed flags: --checkpoint-suffix,
--allow-partial-restore, preprocess --align-suffix/--alignfile,
--replace-unk post-processing, and the NAT --iter-decode-* family."""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from fbk_fairseq_st_tpu import options
from fbk_fairseq_st_tpu.cli import generate as generate_cli
from fbk_fairseq_st_tpu.cli import preprocess as preprocess_cli
from fbk_fairseq_st_tpu.cli import train as train_cli

from .test_translation import TRANSLATION_ARGS, create_translation_data

REFERENCE = "/root/reference"


def _option_strings(parser):
    opts = set()
    for action in parser._actions:
        opts.update(s for s in action.option_strings if s.startswith("--"))
    return opts


@pytest.mark.quick
@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
def test_flag_surface_covers_reference_parsers():
    """Every option string the reference parsers define must exist here —
    a fork user's command line parses unmodified (functional where
    meaningful, documented parity no-op where torch-specific)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    np.float = np.float64
    np.double = np.float64
    np.int = np.int64
    np.bool = np.bool_
    np.object = object
    for name in [
        "fairseq.data.data_utils_fast",
        "fairseq.data.token_block_utils_fast",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    from fairseq import options as ref_options

    for factory in [
        "get_training_parser",
        "get_generation_parser",
        "get_interactive_generation_parser",
        "get_eval_lm_parser",
        "get_validation_parser",
        "get_preprocessing_parser",
    ]:
        ref = _option_strings(getattr(ref_options, factory)())
        mine = _option_strings(getattr(options, factory)())
        missing = sorted(ref - mine)
        assert not missing, f"{factory} missing flags: {missing}"


@pytest.mark.quick
def test_parity_noop_flags_parse():
    """The torch-DDP/SlowMo/fp16-scaler machinery flags parse (and are
    documented no-ops)."""
    parser = options.get_training_parser()
    args = options.parse_args_and_arch(
        parser,
        [
            "data", "--arch", "transformer_iwslt_de_en",
            "--task", "translation",
            "--distributed-backend", "nccl",
            "--distributed-init-method", "tcp://localhost:1234",
            "--distributed-port", "1234",
            "--device-id", "0",
            "--distributed-no-spawn",
            "--bucket-cap-mb", "100",
            "--broadcast-buffers",
            "--find-unused-parameters",
            "--fast-stat-sync",
            "--fix-batches-to-gpus",
            "--fp16-no-flatten-grads",
            "--all-gather-list-size", "32768",
            "--distributed-wrapper", "SlowMo",
            "--slowmo-momentum", "0.5",
            "--slowmo-algorithm", "LocalSGD",
            "--localsgd-frequency", "5",
            "--nprocs-per-node", "8",
            "--checkpoint-suffix=-x",
        ],
    )
    assert args.distributed_init_method == "tcp://localhost:1234"
    assert args.checkpoint_suffix == "-x"


def test_checkpoint_suffix_names_and_resume(tmp_path):
    """--checkpoint-suffix inserts before .pt in every saved name and the
    default restore path picks it up (reference checkpoint_utils.py:48,:126)."""
    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir, n=12)
    args = [data_dir, "--save-dir", save_dir,
            "--checkpoint-suffix=-model_part-0"] + TRANSLATION_ARGS
    args[args.index("--max-epoch") + 1] = "1"
    train_cli.cli_main(args)
    names = sorted(os.listdir(save_dir))
    assert "checkpoint_last-model_part-0.pt" in names
    assert "checkpoint1-model_part-0.pt" in names
    assert not any(n == "checkpoint_last.pt" for n in names)

    # resume: epoch 2 restores from the suffixed last checkpoint
    args[args.index("--max-epoch") + 1] = "2"
    train_cli.cli_main(args)
    assert "checkpoint2-model_part-0.pt" in os.listdir(save_dir)


@pytest.mark.quick
def test_merge_partial_state_semantics():
    from fbk_fairseq_st_tpu.train.checkpoint import merge_partial_state

    init = {
        "encoder": {"w": np.zeros((2, 2)), "extra": np.ones((3,))},
        "decoder": {"w": np.zeros((2,))},
    }
    ckpt = {
        "encoder": {"w": np.full((2, 2), 7.0)},
        "decoder": {"w": np.full((2,), 3.0)},
        "stale_head": {"w": np.zeros((1,))},
    }
    merged, missing, unexpected = merge_partial_state(init, ckpt)
    np.testing.assert_array_equal(merged["encoder"]["w"], 7.0 * np.ones((2, 2)))
    np.testing.assert_array_equal(merged["decoder"]["w"], 3.0 * np.ones((2,)))
    np.testing.assert_array_equal(merged["encoder"]["extra"], np.ones((3,)))
    assert missing == ["encoder.extra"]
    assert unexpected == ["stale_head"]

    with pytest.raises(ValueError, match="decoder.w"):
        merge_partial_state(
            init, {"decoder": {"w": np.zeros((5,))}}
        )


def test_allow_partial_restore_cli(tmp_path):
    """A checkpoint stripped of one param restores under
    --allow-partial-restore (fresh init for the hole, optimizer reset)."""
    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir, n=12)
    args = [data_dir, "--save-dir", save_dir] + TRANSLATION_ARGS
    args[args.index("--max-epoch") + 1] = "1"
    train_cli.cli_main(args)

    last = os.path.join(save_dir, "checkpoint_last.pt")
    with open(last, "rb") as f:
        state = pickle.load(f)

    def pop_one_leaf(tree):
        for k in list(tree):
            if isinstance(tree[k], dict):
                if pop_one_leaf(tree[k]):
                    return True
            else:
                del tree[k]
                return True
        return False

    assert pop_one_leaf(state["model"])
    with open(last, "wb") as f:
        pickle.dump(state, f)

    # strict restore must fail, partial restore must train through
    args2 = list(args)
    args2[args2.index("--max-epoch") + 1] = "2"
    with pytest.raises(Exception):
        train_cli.cli_main(list(args2))
    train_cli.cli_main(args2 + ["--allow-partial-restore"])
    assert "checkpoint2.pt" in os.listdir(save_dir)


def test_preprocess_align_suffix_and_alignfile(tmp_path):
    """--align-suffix binarizes Pharaoh alignments into {split}.align.src-tgt
    (consumed by --load-alignments training without raw .align files) and
    --alignfile writes the alignment.src-tgt.txt unk-replacement dictionary."""
    data_dir = str(tmp_path / "d")
    create_translation_data(data_dir, n=12)
    raw = os.path.join(data_dir, "raw")
    # monotone alignments per split (valid positions on BOTH sides) + the
    # same file as --alignfile input
    for split in ("train", "valid", "test"):
        with open(os.path.join(raw, f"{split}.en")) as f:
            en = f.readlines()
        with open(os.path.join(raw, f"{split}.de")) as f:
            de = f.readlines()
        with open(os.path.join(raw, f"{split}.align"), "w") as f:
            for e_line, d_line in zip(en, de):
                n = min(len(e_line.split()), len(d_line.split()))
                f.write(" ".join(f"{i}-{i}" for i in range(n)) + "\n")

    dest = str(tmp_path / "bin")
    preprocess_cli.cli_main(
        [
            "--source-lang", "en", "--target-lang", "de",
            "--trainpref", os.path.join(raw, "train"),
            "--validpref", os.path.join(raw, "valid"),
            "--testpref", os.path.join(raw, "test"),
            "--destdir", dest,
            "--dataset-impl", "mmap",
            "--align-suffix", "align",
            "--alignfile", os.path.join(raw, "train.align"),
        ]
    )
    # binarized alignment datasets exist and round-trip the flat pairs
    from fbk_fairseq_st_tpu.data import indexed_dataset

    prefix = os.path.join(dest, "train.align.en-de")
    impl = indexed_dataset.infer_dataset_impl(prefix)
    assert impl is not None
    ds = indexed_dataset.make_dataset(prefix, impl)
    with open(os.path.join(raw, "train.align")) as f:
        first_n = len(f.readline().split())
    got = np.asarray(ds[0]).reshape(-1, 2)
    np.testing.assert_array_equal(
        got, np.stack([np.arange(first_n)] * 2, axis=1)
    )

    # the unk-replacement dictionary maps words to their most frequent
    # aligned counterpart (here the same position's target word)
    align_txt = os.path.join(dest, "alignment.en-de.txt")
    assert os.path.exists(align_txt)
    mapping = dict(
        line.split() for line in open(align_txt) if len(line.split()) == 2
    )
    assert mapping, "empty alignment dictionary"
    assert all(k.startswith("e") and v.startswith("d") for k, v in mapping.items())

    # alignment-supervised training reads the BINARIZED datasets (no raw
    # .align files exist in dest)
    save_dir = str(tmp_path / "s")
    train_cli.cli_main(
        [
            dest, "--save-dir", save_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--load-alignments",
            "--arch", "transformer_align",
            "--alignment-layer", "1", "--alignment-heads", "1",
            "--criterion", "label_smoothed_cross_entropy_with_alignment",
            "--label-smoothing", "0.1", "--alignment-lambda", "0.05",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "1", "--decoder-layers", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)


@pytest.mark.quick
def test_replace_unk_post_processing():
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary
    from fbk_fairseq_st_tpu.utils.align_utils import (
        load_align_dict,
        post_process_prediction,
    )

    d = Dictionary()
    for w in ["Haus", "ist", "rot"]:
        d.add_symbol(w)
    # hypo: "Haus <unk> rot", attention aligns step 1 to source position 1
    hypo_tokens = np.array(
        [d.index("Haus"), d.unk(), d.index("rot"), d.eos()], np.int64
    )
    alignment = ["0-0", "1-1", "2-2", "2-3"]

    # empty align dict: copy the aligned source token verbatim
    toks, hypo_str, _ = post_process_prediction(
        hypo_tokens, "the house", alignment, {}, d, remove_bpe=None
    )
    assert hypo_str == "Haus house rot"

    # file-backed dict maps the source word to a replacement
    assert load_align_dict(None) is None
    assert load_align_dict(True) == {}
    toks, hypo_str, _ = post_process_prediction(
        hypo_tokens, "the house", alignment, {"house": "HAUS"}, d,
        remove_bpe=None,
    )
    assert hypo_str == "Haus HAUS rot"
    # re-encoded tokens reflect the replacement (scored post-processing)
    assert d.string(toks) == "Haus HAUS rot"


def test_iter_decode_beam_history_reranker(tmp_path, capsys):
    """--iter-decode-with-beam / --retain-iter-history / --print-step /
    --iter-decode-with-external-reranker through the real CLIs."""
    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir, n=12)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "translation_lev", "-s", "en", "-t", "de",
            "--noise", "random_mask",
            "--arch", "cmlm_transformer",
            "--criterion", "nat_loss",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "fixed",
            "--max-tokens", "200", "--max-epoch", "1",
            "--encoder-layers", "1", "--decoder-layers", "1",
            "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-source-positions", "64", "--max-target-positions", "64",
            "--log-format", "none",
        ]
    )
    ckpt = os.path.join(save_dir, "checkpoint_last.pt")
    gen_args = [
        data_dir,
        "--task", "translation_lev", "-s", "en", "-t", "de",
        "--max-tokens", "200",
        "--gen-subset", "test", "--max-len-b", "16",
        "--iter-decode-max-iter", "3",
        "--log-format", "none",
    ]

    # length beam + history + step count
    capsys.readouterr()
    generate_cli.cli_main(
        gen_args
        + [
            "--path", ckpt,
            "--iter-decode-with-beam", "2",
            "--retain-iter-history", "--print-step",
        ]
    )
    out = capsys.readouterr().out
    assert any(l.startswith("I-") for l in out.splitlines()), "no I- lines"
    e_lines = [l for l in out.splitlines() if l.startswith("E-")]
    assert e_lines, "no E- history lines"
    # history = initial rows + one per iteration
    first_id = e_lines[0].split("\t")[0].rsplit("_", 1)[0]
    steps = [l for l in e_lines if l.startswith(first_id + "_")]
    assert len(steps) == 4  # init + 3 iterations

    # external reranker: the same checkpoint doubles as the (teacher-forced)
    # rescoring model — exercises the full rerank mechanism
    generate_cli.cli_main(
        gen_args
        + [
            "--path", f"{ckpt}:{ckpt}",
            "--iter-decode-with-beam", "2",
            "--iter-decode-with-external-reranker",
            "--quiet",
        ]
    )


@pytest.mark.quick
def test_eval_lm_and_validation_parsers():
    """The new parser factories exist and accept the reference's flags."""
    p = options.get_eval_lm_parser()
    args, _ = p.parse_known_args(
        ["data", "--output-word-probs", "--output-word-stats",
         "--context-window", "4", "--softmax-batch", "1024",
         "--path", "x.pt"]
    )
    assert args.output_word_probs and args.output_word_stats
    assert args.context_window == 4

    v = options.get_validation_parser()
    args, _ = v.parse_known_args(
        ["data", "--path", "x.pt", "--model-overrides", "{}",
         "--quiet", "--results-path", "/tmp/r"]
    )
    assert args.quiet and args.results_path == "/tmp/r"


@pytest.mark.quick
@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
def test_add_argument_surface_covers_reference_tree():
    """Mechanical add_argument option-string diff over the WHOLE reference
    tree (fairseq/ + fairseq_cli/ + examples/speech_recognition) vs this
    repo — catches component-level add_args (tasks, models, criterions,
    encoders, w2l decoders) that the parser-factory sweep above structurally
    cannot see. Every reference long option must be registered somewhere in
    this package (functionally, or as a documented parity no-op/alias)."""
    import re
    from pathlib import Path

    # every quoted option string in the call, including alias spellings
    # (e.g. add_argument("--activation-dropout", "--relu-dropout", ...))
    call = re.compile(r"add_argument\(((?:\s*['\"]-[^'\"]*['\"]\s*,?)+)")
    opt = re.compile(r"['\"](--[A-Za-z0-9][A-Za-z0-9-]*)['\"]")

    def collect(roots):
        opts = set()
        for root in roots:
            for p in Path(root).rglob("*.py"):
                if "test" in p.parts or p.name.startswith("test_"):
                    continue
                text = p.read_text(errors="ignore")
                for c in call.finditer(text):
                    opts.update(m.group(1) for m in opt.finditer(c.group(1)))
        return opts

    ref = collect([
        os.path.join(REFERENCE, "fairseq"),
        os.path.join(REFERENCE, "fairseq_cli"),
        os.path.join(REFERENCE, "examples", "speech_recognition"),
    ])
    mine = collect([
        os.path.dirname(os.path.dirname(os.path.abspath(options.__file__)))
        + "/fbk_fairseq_st_tpu",
    ])
    missing = sorted(ref - mine)
    assert not missing, (
        f"{len(missing)} reference flags have no registration here: "
        f"{missing}"
    )


@pytest.mark.quick
def test_component_flag_tail_parses():
    """The flags the round-3 audit found missing now parse through the real
    two-pass parser with their owning component selected."""
    cases = [
        (["data", "--task", "language_modeling",
          "--arch", "transformer_lm",
          "--self-target", "--future-target", "--past-target",
          "--output-dictionary-size", "1000", "--add-bos-token",
          "--sample-break-mode", "complete_doc",
          "--adaptive-softmax-factor", "2"],
         ["self_target", "past_target", "add_bos_token"]),
        (["data", "--task", "translation", "--arch", "lstm",
          "--encoder-freeze-embed", "--decoder-freeze-embed"],
         ["encoder_freeze_embed"]),
        (["data", "--task", "translation",
          "--arch", "transformer_iwslt_de_en",
          "--cross-self-attention", "--no-cross-attention",
          "--quant-noise-pq", "0.1", "--quant-noise-pq-block-size", "8",
          "--quant-noise-scalar", "0.2",
          "--optimizer", "adam", "--use-old-adam"],
         ["cross_self_attention", "use_old_adam"]),
        (["data", "--task", "translation_lev", "--noise", "random_mask",
          "--arch", "nonautoregressive_transformer",
          "--pred-length-offset", "--sg-length-pred",
          "--apply-bert-init"],
         ["pred_length_offset", "sg_length_pred"]),
        (["data", "--task", "audio_pretraining", "--arch", "wav2vec",
          "--aggregator", "gru", "--gru-dim", "256",
          "--criterion", "binary_cross_entropy",
          "--log-keys", "['prob_perplexity']"],
         ["gru_dim"]),
        (["data", "--task", "masked_lm",
          "--arch", "masked_lm",
          "--criterion", "legacy_masked_lm_loss", "--masked-lm-only"],
         ["masked_lm_only"]),
        (["data", "--task", "multilingual_denoising",
          "--arch", "mbart_large", "--langs", "en,ja",
          "--no-whole-word-mask-langs", "ja"],
         ["no_whole_word_mask_langs"]),
        (["data", "--task", "sentence_prediction", "--num-classes", "2",
          "--arch", "roberta_base", "--add-prev-output-tokens"],
         ["add_prev_output_tokens"]),
    ]
    for argv, attrs in cases:
        parser = options.get_training_parser()
        args = options.parse_args_and_arch(parser, list(argv))
        for a in attrs:
            assert getattr(args, a) not in (None, False), (argv, a)
