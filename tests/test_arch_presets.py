"""Every registered architecture preset must apply cleanly, and the repo's
registry must cover every name the reference registers (the --arch string is
the CLI parity surface: a fork user's command line must resolve)."""

import argparse
import os
import re

import pytest

from fbk_fairseq_st_tpu import registry

pytestmark = pytest.mark.quick

REFERENCE = "/root/reference"


def _collect_reference_names():
    out = {"arch": set(), "model": set(), "task": set(), "criterion": set(),
           "optimizer": set(), "lr_scheduler": set()}
    for dirpath, _, files in os.walk(REFERENCE):
        if any(s in dirpath for s in (".git", "tests", "__pycache__")):
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            try:
                src = open(os.path.join(dirpath, f)).read()
            except OSError:
                continue
            for m in re.finditer(
                r"register_model_architecture\(\s*['\"]([^'\"]+)['\"]\s*,"
                r"\s*['\"]([^'\"]+)['\"]", src
            ):
                out["arch"].add(m.group(2))
                out["model"].add(m.group(1))
            for m in re.finditer(r"register_model\(\s*['\"]([^'\"]+)['\"]",
                                 src):
                out["model"].add(m.group(1))
            for kind in ("task", "criterion", "optimizer", "lr_scheduler"):
                for m in re.finditer(
                    r"register_%s\(\s*['\"]([^'\"]+)['\"]" % kind, src
                ):
                    out[kind].add(m.group(1))
    return out


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not mounted")
def test_registry_covers_every_reference_name():
    ref = _collect_reference_names()
    # 'classification' appears only inside register_task's docstring example
    # (reference fairseq/tasks/__init__.py:27)
    ref["task"].discard("classification")
    assert ref["arch"] - set(registry.ARCHITECTURES.keys()) == set()
    assert ref["model"] - set(registry.MODELS.keys()) == set()
    assert ref["task"] - set(registry.TASKS.keys()) == set()
    assert ref["criterion"] - set(registry.CRITERIONS.keys()) == set()
    assert ref["optimizer"] - set(registry.OPTIMIZERS.keys()) == set()
    assert ref["lr_scheduler"] - set(registry.LR_SCHEDULERS.keys()) == set()


def test_every_arch_preset_applies():
    """Arch functions back-fill defaults by mutating args; every one must
    run on a bare namespace without raising (reference parse_args_and_arch
    guarantees this before build_model)."""
    for arch in sorted(registry.ARCHITECTURES.keys()):
        args = argparse.Namespace(arch=arch)
        registry.apply_architecture(args)
        assert getattr(args, "arch") == arch


def test_new_round3_presets_fill_reference_defaults():
    cases = {
        # arch -> key attribute expectations from the reference presets
        "transformer_lm_gpt2_big": {"decoder_layers": 48,
                                    "decoder_embed_dim": 1600,
                                    "decoder_attention_heads": 25},
        "transformer_lm_gbw": {"decoder_embed_dim": 512,
                               "no_decoder_final_norm": True},
        "transformer_lm_wiki103": {"decoder_layers": 16, "dropout": 0.3,
                                   "adaptive_input": True},
        "transformer_lm_megatron": {"decoder_embed_dim": 3072,
                                    "decoder_ffn_embed_dim": 12288,
                                    "decoder_layers": 72},
        "transformer_lm_megatron_11b": {"decoder_ffn_embed_dim": 18432},
        "lightconv_lm_gbw": {"decoder_embed_dim": 512,
                             "decoder_ffn_embed_dim": 4096},
        "lightconv_wmt_zh_en_big": {"dropout": 0.2,
                                    "attention_dropout": 0.2,
                                    "weight_dropout": 0.2},
        "lightconv_wmt_en_fr_big": {"dropout": 0.1,
                                    "encoder_embed_dim": 1024},
        "levenshtein_transformer_vaswani_wmt_en_de_big": {
            "encoder_embed_dim": 1024, "dropout": 0.3},
        "levenshtein_transformer_wmt_en_de_big": {
            "encoder_normalize_before": True, "attention_dropout": 0.1},
        "conv_transformer_context_big2": {"encoder_embed_dim": 512,
                                          "encoder_ffn_embed_dim": 2048},
        "conv_transformer_context_giant": {"encoder_embed_dim": 1024,
                                           "encoder_attention_heads": 16},
        "multilingual_conv_transformer_big2": {
            "encoder_embed_dim": 512, "encoder_ffn_embed_dim": 2048},
        "gru_transformer_big": {"dropout": 0.3, "encoder_embed_dim": 1024},
    }
    for arch, expect in cases.items():
        args = argparse.Namespace(arch=arch)
        registry.apply_architecture(args)
        for k, v in expect.items():
            assert getattr(args, k) == v, (arch, k, getattr(args, k))
