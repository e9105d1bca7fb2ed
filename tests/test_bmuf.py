"""BMUF block update filter (reference tests/test_bmuf.py role)."""

import argparse

import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu.optim.bmuf import BMUF


def make_bmuf(**kw):
    args = argparse.Namespace(
        block_lr=kw.get("block_lr", 1.0),
        block_momentum=kw.get("block_momentum", 0.5),
        global_sync_iter=kw.get("global_sync_iter", 2),
        warmup_iterations=kw.get("warmup_iterations", 2),
        use_nbm=kw.get("use_nbm", False),
    )
    return BMUF(args)


def test_warmup_adopts_model():
    bmuf = make_bmuf()
    p = {"w": jnp.ones(4)}
    out = bmuf.step(p, 1)
    assert bmuf.global_params is None  # not yet at warmup end
    out = bmuf.step(p, 2)  # warmup end
    np.testing.assert_array_equal(np.asarray(bmuf.global_params["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["w"]), 1.0)


def test_block_filter_math():
    bmuf = make_bmuf(block_momentum=0.5, block_lr=1.0,
                     warmup_iterations=0, global_sync_iter=2)
    p0 = {"w": jnp.zeros(3)}
    bmuf.step(p0, 0)  # warmup end at 0: global = 0
    # local training moved params to 1.0 by update 2
    p = {"w": jnp.ones(3)}
    out = bmuf.step(p, 2)
    # g = 0 - 1 = -1; s = 0.5*0 + 1*(-1) = -1; new = 0 - (-1) = 1
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    # params move to 2.0 by update 4
    p = {"w": jnp.full(3, 2.0)}
    out = bmuf.step(p, 4)
    # g = 1 - 2 = -1; s = 0.5*(-1) + (-1) = -1.5; new = 1 + 1.5 = 2.5
    np.testing.assert_allclose(np.asarray(out["w"]), 2.5)


def test_non_sync_updates_passthrough():
    bmuf = make_bmuf(warmup_iterations=0, global_sync_iter=10)
    bmuf.step({"w": jnp.zeros(2)}, 0)
    p = {"w": jnp.ones(2)}
    out = bmuf.step(p, 3)  # not a sync iteration
    np.testing.assert_array_equal(np.asarray(out["w"]), 1.0)


def test_nesterov_variant():
    bmuf = make_bmuf(block_momentum=0.5, use_nbm=True,
                     warmup_iterations=0, global_sync_iter=1)
    bmuf.step({"w": jnp.zeros(1)}, 0)
    out = bmuf.step({"w": jnp.ones(1)}, 1)
    # s = -1; global = 1; nbm: params = 1 - 0.5*(-1) = 1.5
    np.testing.assert_allclose(np.asarray(out["w"]), 1.5)


def test_bmuf_end_to_end(tmp_path):
    """--use-bmuf through the train CLI."""
    import os

    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import TRANSLATION_ARGS, create_translation_data

    data_dir, save_dir = str(tmp_path / "d"), str(tmp_path / "s")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [data_dir, "--save-dir", save_dir,
         "--use-bmuf", "--warmup-iterations", "1", "--global-sync-iter", "1",
         ] + TRANSLATION_ARGS
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
