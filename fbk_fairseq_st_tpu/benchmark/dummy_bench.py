"""dummy_lm / dummy_masked_lm tasks + dummy_model (reference
fairseq/benchmark/dummy_lm.py:18, dummy_masked_lm.py:18, dummy_model.py:18):
fixed synthetic batches and a pure-matmul residual stack so training-loop
throughput can be measured with zero data pipeline and zero attention cost.
"""

from __future__ import annotations

import jax
import numpy as np

from ..data.dictionary import Dictionary
from ..models.base import Model
from ..ops.core import init_linear, linear
from ..registry import (
    register_model,
    register_model_architecture,
    register_task,
)
from ..tasks.base import Task


class _FixedSequenceDataset:
    """dataset_size copies of one precomputed (source, target) pair —
    the reference's DummyDataset, as a collater-bearing dataset so the
    real batch iterator drives it."""

    def __init__(self, source: np.ndarray, target: np.ndarray, n: int,
                 pad: int):
        self.source = source
        self.target = target
        self.n = n
        self.pad = pad
        self._sizes = np.full((n,), len(source), np.int64)

    def __getitem__(self, index):
        return {"id": index, "source": self.source, "target": self.target}

    def __len__(self):
        return self.n

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        bsz = len(samples)
        if pad_to_bsz is not None:
            bsz = max(bsz, pad_to_bsz)
        src = np.tile(self.source, (bsz, 1))
        tgt = np.tile(self.target, (bsz, 1))
        lengths = np.full((bsz,), len(self.source), np.int64)
        return {
            "id": np.array(
                [s["id"] for s in samples]
                + [-1] * (bsz - len(samples)), np.int64
            ),
            "nsentences": len(samples),
            "ntokens": len(samples) * len(self.source),
            "net_input": {"src_tokens": src, "src_lengths": lengths},
            "target": tgt,
        }

    def num_tokens(self, index):
        return int(self._sizes[index])

    def size(self, index):
        return int(self._sizes[index])

    @property
    def sizes(self):
        return self._sizes

    def ordered_indices(self):
        return np.arange(self.n, dtype=np.int64)


class _DummyTaskBase(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", nargs="?", default="")
        parser.add_argument("--dict-size", default=49996, type=int)
        parser.add_argument("--dataset-size", default=100000, type=int)
        parser.add_argument(
            "--tokens-per-sample", default=512, type=int,
            help="max number of total tokens over all segments per sample",
        )

    def __init__(self, args, d):
        super().__init__(args)
        self.d = d
        self.args.max_source_positions = args.tokens_per_sample
        self.args.max_target_positions = args.tokens_per_sample

    @classmethod
    def setup_task(cls, args, **kwargs):
        d = Dictionary()
        for i in range(args.dict_size):
            d.add_symbol(f"word{i}")
        return cls(args, d)

    @property
    def source_dictionary(self):
        return self.d

    @property
    def target_dictionary(self):
        return self.d


@register_task("dummy_lm")
class DummyLMTask(_DummyTaskBase):
    """Reference dummy_lm.py:18-100: src = [pad+1, pad+2, ...],
    tgt = src shifted by one."""

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        t = self.args.tokens_per_sample
        seq = (np.arange(t + 1, dtype=np.int64) + self.d.pad() + 1) % len(
            self.d
        )
        self.datasets[split] = _FixedSequenceDataset(
            seq[:-1], seq[1:], self.args.dataset_size, self.d.pad()
        )


@register_task("dummy_masked_lm")
class DummyMaskedLMTask(_DummyTaskBase):
    """Reference dummy_masked_lm.py:18-100: ~15% of positions masked in the
    input; target is pad except at masked positions."""

    def __init__(self, args, d):
        super().__init__(args, d)
        self.mask_idx = d.add_symbol("<mask>")

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        t = self.args.tokens_per_sample
        pad = self.d.pad()
        seq = (np.arange(t, dtype=np.int64) + pad + 1) % len(self.d)
        mask = np.arange(2, t, 7)  # ~15%, reference dummy_masked_lm.py:41
        src = seq.copy()
        src[mask] = self.mask_idx
        tgt = np.full_like(seq, pad)
        tgt[mask] = seq[mask]
        self.datasets[split] = _FixedSequenceDataset(
            src, tgt, self.args.dataset_size, pad
        )


@register_model("dummy_model")
class DummyModel(Model):
    """Reference dummy_model.py:18-95: embed -> num_layers x (residual
    qkv-shaped linear block + residual FFN block) -> out_proj. No attention,
    no layernorm statistics worth modeling — a pure MXU load generator."""

    def __init__(self, vocab_size: int, embed_dim: int, num_layers: int):
        self.vocab_size = vocab_size
        self.embed_dim = embed_dim
        self.num_layers = num_layers

    @staticmethod
    def add_args(parser):
        parser.add_argument("--num-layers", type=int, default=24)
        parser.add_argument("--embed-dim", type=int, default=1024)

    @classmethod
    def build_model(cls, args, task):
        return cls(
            len(task.target_dictionary),
            getattr(args, "embed_dim", 1024),
            getattr(args, "num_layers", 24),
        )

    def init(self, key):
        e = self.embed_dim
        ks = jax.random.split(key, 4 * self.num_layers + 2)
        params = {
            "embed": jax.random.normal(ks[0], (self.vocab_size, e)) * e**-0.5,
            "layers_a": [
                {
                    "in_proj": init_linear(ks[4 * i + 1], e, 3 * e),
                    "skip": init_linear(ks[4 * i + 2], 3 * e, e),
                    "out_proj": init_linear(ks[4 * i + 3], e, e),
                }
                for i in range(self.num_layers)
            ],
            "layers_b": [
                {
                    "fc1": init_linear(ks[4 * i + 4], e, 4 * e),
                    "fc2": init_linear(
                        ks[(4 * i + 5) % len(ks)], 4 * e, e
                    ),
                }
                for i in range(self.num_layers)
            ],
            "out": init_linear(ks[-1], e, self.vocab_size),
        }
        return {"params": params, "state": {}}


    def forward(self, variables, batch, rng=None, training=False):
        p = variables["params"]
        x = p["embed"][batch["src_tokens"]]
        for la, lb in zip(p["layers_a"], p["layers_b"]):
            h = linear(la["in_proj"], x)
            h = linear(la["skip"], h)
            x = x + linear(la["out_proj"], h)
            h = jax.nn.relu(linear(lb["fc1"], x))
            x = x + linear(lb["fc2"], h)
        logits = linear(p["out"], x)
        return (logits, {}), {}


@register_model_architecture("dummy_model", "dummy_model")
def dummy_model_architecture(args):
    args.num_layers = getattr(args, "num_layers", 24)
    args.embed_dim = getattr(args, "embed_dim", 1024)
