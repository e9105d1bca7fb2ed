"""The tutorial code under docs/tutorial_examples/ must actually run.

docs/tutorial_simple_gru.md and docs/tutorial_classifying_names.md embed
this code; these tests drive it the way the tutorials tell users to
(--user-dir import + the real CLIs / generator), so the docs can't rot.
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
USER_DIR = os.path.join(REPO, "docs", "tutorial_examples")


@pytest.fixture(scope="module")
def user_module():
    """Import docs/tutorial_examples the way the CLI does."""
    from fbk_fairseq_st_tpu.registry import MODELS
    from fbk_fairseq_st_tpu.utils.user_dir import import_user_module

    import_user_module(argparse.Namespace(user_dir=USER_DIR))
    assert "tutorial_simple_gru" in MODELS, (
        "user-dir import failed to register the tutorial components"
    )
    return None


def test_user_dir_name_collision_imports_under_alias(tmp_path):
    """A --user-dir whose basename shadows an already-imported module
    (e.g. a dir named 'examples' while the reference's `examples` package
    is loaded) must still register its components. The reference's
    import_user_module silently no-ops on the name hit; here the
    collision imports under a private alias."""
    import sys

    from fbk_fairseq_st_tpu.registry import MODELS
    from fbk_fairseq_st_tpu.utils.user_dir import import_user_module

    pkg = tmp_path / "argparse"  # collides with the stdlib module
    pkg.mkdir()
    (pkg / "__init__.py").write_text(
        "from fbk_fairseq_st_tpu.models.base import Model\n"
        "from fbk_fairseq_st_tpu.registry import register_model\n"
        "@register_model('collision_probe_model')\n"
        "class CollisionProbe(Model):\n"
        "    pass\n"
    )
    assert "argparse" in sys.modules  # the collision is real
    import_user_module(argparse.Namespace(user_dir=str(pkg)))
    assert "collision_probe_model" in MODELS
    import argparse as argparse_check  # stdlib module untouched

    assert hasattr(argparse_check, "ArgumentParser")
    # idempotent: a second import (the CLI calls it again) must not
    # re-register and blow up on the duplicate name
    import_user_module(argparse.Namespace(user_dir=str(pkg)))


def _toy_dictionary(n=20):
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for i in range(n):
        d.add_symbol(f"w{i}")
    d.finalize()
    return d


def test_simple_gru_trains_and_decodes(user_module):
    """Forward produces finite loss + grads; the generator beam-decodes
    the registered model through the standard while_loop path."""
    from fbk_fairseq_st_tpu import registry
    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    d = _toy_dictionary()

    class T:
        source_dictionary = d
        target_dictionary = d

    args = argparse.Namespace(arch="tutorial_simple_gru")
    registry.apply_architecture(args)
    args.embed_dim, args.hidden_dim = 16, 24
    model = registry.build_model(args, T())
    variables = model.init(jax.random.PRNGKey(0))

    b, t_src, t_tgt = 4, 7, 5
    rng = np.random.RandomState(0)
    batch = {
        "src_tokens": jnp.asarray(
            rng.randint(4, len(d), size=(b, t_src)), jnp.int32),
        "src_lengths": jnp.full((b,), t_src, jnp.int32),
        "prev_output_tokens": jnp.asarray(
            rng.randint(4, len(d), size=(b, t_tgt)), jnp.int32),
    }
    target = jnp.asarray(rng.randint(4, len(d), size=(b, t_tgt)))

    from fbk_fairseq_st_tpu.ops.core import RngStream

    def loss_fn(params):
        (logits,), _ = model.forward(
            {"params": params, "state": {}}, batch,
            RngStream(jax.random.PRNGKey(1)), True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, target[..., None], -1).mean()

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    gen = SequenceGenerator(d, beam_size=3, max_len_b=8)
    out = gen.generate([(model, variables)], {
        "net_input": {"src_tokens": batch["src_tokens"],
                      "src_lengths": batch["src_lengths"]},
        "id": np.arange(b),
    })
    assert len(out) == b
    for hyps in out:
        assert len(hyps) >= 1 and len(hyps[0]["tokens"]) >= 1


ALPHABETS = {"elvish": "aeiloun", "dwarvish": "kgrdbzt"}


def _write_names_tsv(path, n, seed):
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for _ in range(n):
            label = list(ALPHABETS)[rng.randint(2)]
            chars = ALPHABETS[label]
            name = "".join(
                chars[rng.randint(len(chars))]
                for _ in range(rng.randint(3, 9)))
            f.write(f"{name}\t{label}\n")


def test_classify_names_cli_end_to_end(user_module, tmp_path):
    """The classifying-names tutorial command line, verbatim (minus size):
    a custom task/model/criterion trio trains through the real train CLI
    and separates the two synthetic alphabets."""
    from fbk_fairseq_st_tpu.cli import train as train_cli
    from fbk_fairseq_st_tpu.registry import TASKS

    data = tmp_path / "names"
    data.mkdir()
    _write_names_tsv(data / "train.tsv", 256, 0)
    _write_names_tsv(data / "valid.tsv", 64, 1)
    save_dir = str(tmp_path / "ckpts")

    train_cli.cli_main([
        str(data),
        "--user-dir", USER_DIR,
        "--task", "tutorial_names_classification",
        "--arch", "tutorial_names_classifier",
        "--criterion", "tutorial_names_loss",
        "--embed-dim", "16", "--hidden-dim", "32",
        "--optimizer", "adam", "--lr", "1e-2", "--lr-scheduler", "fixed",
        "--max-sentences", "64", "--max-epoch", "3",
        "--save-dir", save_dir, "--log-format", "none",
    ])
    assert "checkpoint_last.pt" in os.listdir(save_dir)

    # reload the checkpoint and measure valid accuracy in-process
    from fbk_fairseq_st_tpu.train import checkpoint as ckpt

    args = argparse.Namespace(
        user_dir=USER_DIR, data=str(data), task="tutorial_names_classification")
    task = TASKS["tutorial_names_classification"].setup_task(args)
    task.load_dataset("valid")
    (model, variables), _ = (lambda e: (e[0][0], e[1]))(
        ckpt.load_model_ensemble(
            [os.path.join(save_dir, "checkpoint_last.pt")], task=task))
    ds = task.dataset("valid")
    batch = ds.collater([ds[i] for i in range(len(ds))])
    (logits,), _ = model.forward(
        {"params": variables["params"], "state": variables["state"]},
        {k: jnp.asarray(v) for k, v in batch["net_input"].items()},
        None, False)
    pred = np.argmax(np.asarray(logits), -1)
    acc = float((pred == batch["target"]).mean())
    assert acc > 0.9, acc
