"""CLI tooling: average_checkpoints, validate, score, interactive, and the
MuST-SHE / NE eval scripts."""

import os

import numpy as np
import pytest

from fbk_fairseq_st_tpu.cli import average_checkpoints as avg_cli
from fbk_fairseq_st_tpu.cli import interactive as interactive_cli
from fbk_fairseq_st_tpu.cli import score as score_cli
from fbk_fairseq_st_tpu.cli import validate as validate_cli
from fbk_fairseq_st_tpu.scripts.eval import mustshe_acc, ne_terms_accuracy
from fbk_fairseq_st_tpu.train.checkpoint import load_checkpoint_to_cpu

from .test_translation import TRANSLATION_ARGS, create_translation_data


@pytest.fixture(scope="module")
def mt(tmp_path_factory):
    from fbk_fairseq_st_tpu.cli import train as train_cli

    root = tmp_path_factory.mktemp("tools")
    data_dir, save_dir = str(root / "data"), str(root / "ckpt")
    create_translation_data(data_dir)
    argv = [data_dir, "--save-dir", save_dir] + TRANSLATION_ARGS
    argv[argv.index("--max-epoch") + 1] = "3"
    train_cli.cli_main(argv)
    return data_dir, save_dir


def test_average_checkpoints(mt, tmp_path):
    data_dir, save_dir = mt
    out = str(tmp_path / "avg.pt")
    avg_cli.cli_main(
        ["--inputs", save_dir, "--num-epoch-checkpoints", "2", "--output", out]
    )
    avg = load_checkpoint_to_cpu(out)
    c2 = load_checkpoint_to_cpu(os.path.join(save_dir, "checkpoint2.pt"))
    c3 = load_checkpoint_to_cpu(os.path.join(save_dir, "checkpoint3.pt"))
    import jax

    def leaf0(state):
        return jax.tree_util.tree_leaves(state["model"])[0]

    np.testing.assert_allclose(
        leaf0(avg), (leaf0(c2) + leaf0(c3)) / 2.0, rtol=1e-6
    )


def test_validate_cli(mt, capsys):
    data_dir, save_dir = mt
    validate_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--max-tokens", "200",
            "--optimizer", "adam",
            "--lr-scheduler", "fixed",
        ]
    )
    # stats were printed for the valid subset
    out = capsys.readouterr().out


def test_score_cli(tmp_path, capsys):
    sys_f, ref_f = str(tmp_path / "sys.txt"), str(tmp_path / "ref.txt")
    with open(sys_f, "w") as f:
        f.write("the cat sat on the mat\nhello world\n")
    with open(ref_f, "w") as f:
        f.write("the cat sat on the mat\nhello there world\n")
    score_cli.cli_main(["--sys", sys_f, "--ref", ref_f])
    out = capsys.readouterr().out
    assert "BLEU4" in out


def test_interactive_cli(mt, tmp_path, capsys):
    data_dir, save_dir = mt
    inp = str(tmp_path / "input.txt")
    with open(inp, "w") as f:
        f.write("e1 e2 e3\ne4 e5\n")
    interactive_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-len-b", "8",
            "--buffer-size", "2",
            "--input", inp,
        ]
    )
    out = capsys.readouterr().out
    assert out.count("S-") == 2
    assert out.count("H-") >= 2


def test_mustshe_acc(tmp_path, capsys):
    tsv = str(tmp_path / "def.tsv")
    hyp = str(tmp_path / "hyp.txt")
    with open(tsv, "w") as f:
        f.write("CATEGORY\tGENDERTERMS\n")
        f.write("1F\tamica amico;bella bello\n")
        f.write("1M\tamico amica\n")
    with open(hyp, "w") as f:
        f.write("la mia amica bello\n")  # 1 correct, 1 wrong
        f.write("il mio amico\n")  # 1 correct
    scores = mustshe_acc.cli_main(["--input", hyp, "--tsv-definition", tsv])
    assert scores["Global"]["term_coverage"] == 1.0
    np.testing.assert_allclose(scores["Global"]["gender_accuracy"], 2 / 3)
    assert scores["1F"]["gender_accuracy"] == 0.5
    assert scores["1M"]["gender_accuracy"] == 1.0


def test_ne_terms_accuracy(tmp_path, capsys):
    ref = str(tmp_path / "ref.iob")
    hyp = str(tmp_path / "hyp.txt")
    with open(ref, "w") as f:
        # sentence 1: "Moby Dick" PER entity
        f.write("1\tMoby\tB-PER\n2\tDick\tI-PER\n\n")
        # sentence 2: "Paris" LOC
        f.write("1\tParis\tB-LOC\n\n")
    with open(hyp, "w") as f:
        f.write("I read moby dick yesterday\n")
        f.write("I love Paris\n")
    items, entities = ne_terms_accuracy.cli_main(
        ["--input", hyp, "--ne-reference", ref]
    )
    assert entities["PER"]["found"] == 0  # case-sensitive miss
    assert entities["PER"]["ci_found"] == 1  # case-insensitive hit
    assert entities["LOC"]["found"] == 1


def test_resegment_mustc_with_alignments(tmp_path):
    """Resegmentation: proportional cut on source, fast_align snapping on
    the target side."""
    from fbk_fairseq_st_tpu.scripts import resegment_data_mustc as rs

    orig_yaml = tmp_path / "orig.yaml"
    orig_yaml.write_text(
        "- {duration: 4.0, offset: 0.0, wav: a.wav}\n"
        "- {duration: 4.0, offset: 4.0, wav: a.wav}\n"
    )
    new_yaml = tmp_path / "new.yaml"
    # one new segment covering second half of seg1 + first half of seg2
    new_yaml.write_text("- {duration: 4.0, offset: 2.0, wav: a.wav}\n")
    src = tmp_path / "src.txt"
    src.write_text("s1 s2 s3 s4\nt1 t2 t3 t4\n")
    tgt = tmp_path / "tgt.txt"
    tgt.write_text("S1 S2 S3 S4\nT1 T2 T3 T4\n")
    align = tmp_path / "align.txt"
    # monotone word alignments i-i
    align.write_text("0-0 1-1 2-2 3-3\n0-0 1-1 2-2 3-3\n")
    out_src = tmp_path / "out.src"
    out_tgt = tmp_path / "out.tgt"
    rs.cli_main(
        [
            "--orig-yaml", str(orig_yaml),
            "--new-yaml", str(new_yaml),
            "--orig-text", str(src), str(tgt),
            "--output", str(out_src), str(out_tgt),
            "--text-alignments", str(align),
        ]
    )
    assert out_src.read_text().strip() == "s3 s4 t1 t2"
    assert out_tgt.read_text().strip() == "S3 S4 T1 T2"


def test_resegment_alignment_outlier_skipped():
    """An isolated far-away alignment link does not drag the cut point."""
    from fbk_fairseq_st_tpu.scripts.resegment_data_mustc import (
        _snap_target_cut,
    )

    # src words 0..3 -> tgt mostly 0..3, but src 0 links to tgt 20 (outlier)
    aligns = {0: 20, 1: 1, 2: 2, 3: 3}
    span = _snap_target_cut(aligns, 0, 4, 30)
    assert span == (1, 21) or span[0] == 1  # outlier skipped at the low end


def test_jax_compilation_cache_wiring(tmp_path):
    """--jax-cache-dir points XLA's persistent compilation cache at the
    directory: after a (forced-threshold-0) compile, cache entries exist.
    Subprocess so the global jax config change doesn't leak into the
    suite."""
    import subprocess
    import sys

    cache = tmp_path / "xla-cache"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from fbk_fairseq_st_tpu.options import enable_compilation_cache\n"
        f"enable_compilation_cache({str(cache)!r})\n"
        "jax.config.update("
        "'jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "import jax.numpy as jnp\n"
        "print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64))))\n"
    )
    subprocess.run(
        [sys.executable, "-c", code], check=True, cwd="/root/repo",
        capture_output=True, timeout=300,
    )
    assert cache.is_dir() and any(cache.iterdir())


@pytest.mark.quick
def test_strip_modules_both_formats(tmp_path):
    """strip_modules removes params by prefix on native (nested tree) and
    fork torch (flat state dict) checkpoints (reference
    strip_modules.py:14-47)."""
    import pickle

    from fbk_fairseq_st_tpu.scripts import strip_modules

    # native nested checkpoint
    native = str(tmp_path / "native.pt")
    state = {
        "model": {
            "encoder": {"w": np.ones(3)},
            "decoder": {"layers": [  # list subtree survives untouched
            ], "w": np.zeros(2)},
        },
        "args": {"arch": "x"},
    }
    state["model"]["decoder"].pop("layers")
    with open(native, "wb") as f:
        pickle.dump(state, f)
    out = str(tmp_path / "enc_only.pt")
    strip_modules.main(["--model-path", native, "--new-model-path", out,
                        "--strip-what", "decoder"])
    with open(out, "rb") as f:
        stripped = pickle.load(f)
    assert "decoder" not in stripped["model"]
    assert "encoder" in stripped["model"]
    assert stripped["args"] == {"arch": "x"}

    # fork torch flat checkpoint
    import torch

    fork = str(tmp_path / "fork.pt")
    torch.save(
        {"model": {"encoder.w": torch.ones(3),
                   "decoder.embed.weight": torch.zeros(2)},
         "args": None},
        fork,
    )
    out2 = str(tmp_path / "fork_enc.pt")
    strip_modules.main(["--model-path", fork, "--new-model-path", out2,
                        "--strip-what", "decoder"])
    stripped2 = torch.load(out2, map_location="cpu", weights_only=False)
    assert list(stripped2["model"]) == ["encoder.w"]

    # root-level launcher exists and targets the same main
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "root_strip", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "strip_modules.py")
    )
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main is strip_modules.main


@pytest.mark.quick
def test_hubconf_exposes_models():
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "hubconf", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "hubconf.py")
    )
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert "jax" in mod.dependencies
    assert callable(getattr(mod, "transformer"))
    assert callable(getattr(mod, "conv_transformer"))
