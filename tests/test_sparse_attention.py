"""Fixed factorized sparse attention vs the reference implementation
(fairseq/modules/sparse_multihead_attention.py): exact mask parity, forward
equivalence with ported weights, and the masked-LM wiring."""

import os
import sys

import numpy as np
import pytest

from fbk_fairseq_st_tpu.ops.sparse_attention import sparse_fixed_mask

REFERENCE = "/root/reference"


def _ref_sparse_cls():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    np.float = np.float64
    np.int = np.int64
    np.bool = np.bool_
    from fairseq.modules.sparse_multihead_attention import (
        SparseMultiheadAttention,
    )

    return SparseMultiheadAttention


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
@pytest.mark.parametrize(
    "tgt_len,stride,expressivity,bidirectional",
    [
        (64, 16, 4, True),
        (64, 16, 4, False),
        (100, 32, 8, True),
        (100, 32, 8, False),
        (33, 8, 4, True),
    ],
)
def test_mask_matches_reference(tgt_len, stride, expressivity, bidirectional):
    import torch

    cls = _ref_sparse_cls()
    ref = cls(
        embed_dim=16, num_heads=2, stride=stride, expressivity=expressivity,
        is_bidirectional=bidirectional, self_attention=True,
    )
    ref_mask = ref.buffered_sparse_mask(
        torch.zeros(1), tgt_len, tgt_len
    ).numpy()
    mine = sparse_fixed_mask(
        tgt_len, tgt_len, stride, expressivity, bidirectional
    )
    np.testing.assert_array_equal(mine, ref_mask)


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
def test_sparse_mha_forward_matches_reference():
    """Ported q/k/v/out weights + the sparse mask -> identical outputs."""
    import torch

    import jax
    import jax.numpy as jnp

    from fbk_fairseq_st_tpu.ops.attention import MHAConfig, init_mha, mha

    cls = _ref_sparse_cls()
    torch.manual_seed(0)
    ref = cls(
        embed_dim=16, num_heads=2, stride=8, expressivity=4,
        is_bidirectional=True, self_attention=True, dropout=0.0,
    )
    ref.eval()

    cfg = MHAConfig(embed_dim=16, num_heads=2, dropout=0.0)
    params = init_mha(jax.random.PRNGKey(0), cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for mine, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("out", "out_proj")):
        params[mine]["w"] = jnp.asarray(sd[f"{theirs}.weight"].T)
        params[mine]["b"] = jnp.asarray(sd[f"{theirs}.bias"])

    T = 24
    rng = np.random.RandomState(1)
    x = rng.randn(2, T, 16).astype(np.float32)

    # NOTE: the reference's SparseMultiheadAttention.forward never applies
    # its own sparse mask — multihead_attention.py:317 calls the BASE
    # class's static apply_sparse_mask, bypassing the subclass override. To
    # test the intended semantics we feed the reference's sparse mask
    # through the reference's own attn_mask path instead.
    ref_mask = ref.buffered_sparse_mask(torch.zeros(1), T, T)
    with torch.no_grad():
        ref_out, _ = ref(
            torch.tensor(x.transpose(1, 0, 2)),
            torch.tensor(x.transpose(1, 0, 2)),
            torch.tensor(x.transpose(1, 0, 2)),
            attn_mask=ref_mask,
        )
    ref_out = ref_out.numpy().transpose(1, 0, 2)

    mask = jnp.asarray(sparse_fixed_mask(T, T, 8, 4, True))
    out, _, _ = mha(params, cfg, jnp.asarray(x), attn_mask=mask)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-5, atol=2e-5)


def test_masked_lm_with_sparse_attention_trains(tmp_path):
    """--sparse-attention-stride wires through the masked_lm model."""
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_language_modeling import create_lm_data

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_lm_data(data_dir)
    train_cli.cli_main(
        [
            data_dir, "--save-dir", save_dir,
            "--task", "masked_lm",
            "--tokens-per-sample", "32",
            "--arch", "masked_lm",
            "--criterion", "masked_lm",
            "--optimizer", "adam", "--lr", "0.001",
            "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
            "--max-tokens", "128", "--max-epoch", "1",
            "--encoder-layers", "2",
            "--encoder-embed-dim", "16",
            "--encoder-ffn-embed-dim", "32",
            "--encoder-attention-heads", "2",
            "--sparse-attention-stride", "8",
            "--sparse-attention-expressivity", "4",
            "--log-format", "none",
        ]
    )
    assert "checkpoint_last.pt" in os.listdir(save_dir)
