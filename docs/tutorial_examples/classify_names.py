"""Tutorial: a custom task + model + criterion (docs/tutorial_classifying_names.md).

Classify surnames by language of origin — the framework's three extension
points in ~150 lines: a Task that reads `<split>.tsv` files of
``name<TAB>language`` rows into a char-level dataset, a pooled
char-embedding classifier Model, and a classification Criterion.

Run with ``--user-dir docs/tutorial_examples``:

    python -m fbk_fairseq_st_tpu.cli.train DATA --cpu \\
        --task tutorial_names_classification \\
        --arch tutorial_names_classifier \\
        --criterion tutorial_names_loss \\
        --optimizer adam --lr 1e-3 --lr-scheduler fixed \\
        --max-sentences 64 --max-epoch 3 --save-dir ckpts

Executed by tests/test_docs_examples.py, so the tutorial stays honest.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from fbk_fairseq_st_tpu.criterions.base import Criterion
from fbk_fairseq_st_tpu.data.datasets import Dataset
from fbk_fairseq_st_tpu.data.dictionary import Dictionary
from fbk_fairseq_st_tpu.models.base import Model
from fbk_fairseq_st_tpu.ops.core import (
    embedding,
    init_embedding,
    init_linear,
    linear,
)
from fbk_fairseq_st_tpu.registry import (
    register_criterion,
    register_model,
    register_model_architecture,
    register_task,
)
from fbk_fairseq_st_tpu.tasks.base import Task


# -- the dataset -------------------------------------------------------------

class NamesDataset(Dataset):
    """Char-id sequences + integer labels, with the fixed-shape collater
    contract: honor pad_to_src_len / pad_to_bsz so every batch lands on
    the shape-bucket grid (padded rows carry label -1, masked in the
    loss)."""

    def __init__(self, names, labels, dictionary):
        self.dictionary = dictionary
        self.items = [
            np.array([dictionary.index(c) for c in name], np.int32)
            for name in names
        ]
        self.labels = np.asarray(labels, np.int32)
        self._sizes = np.array([len(t) for t in self.items], np.int64)

    def __getitem__(self, index):
        return {"id": index, "source": self.items[index],
                "label": int(self.labels[index])}

    def __len__(self):
        return len(self.items)

    def num_tokens(self, index):
        return int(self._sizes[index])

    def num_tokens_vec(self, indices):
        return self._sizes[np.asarray(indices)]

    def size(self, index):
        return int(self._sizes[index])

    @property
    def sizes(self):
        return self._sizes

    def ordered_indices(self):
        return np.argsort(self._sizes, kind="mergesort").astype(np.int64)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        bsz = pad_to_bsz or len(samples)
        src_len = pad_to_src_len or max(len(s["source"]) for s in samples)
        pad = self.dictionary.pad()
        tokens = np.full((bsz, src_len), pad, np.int32)
        lengths = np.zeros((bsz,), np.int32)
        target = np.full((bsz,), -1, np.int32)  # -1 marks padding rows
        ids = np.zeros((bsz,), np.int64)
        for i, s in enumerate(samples):
            tokens[i, : len(s["source"])] = s["source"]
            lengths[i] = len(s["source"])
            target[i] = s["label"]
            ids[i] = s["id"]
        return {
            "id": ids,
            "net_input": {"src_tokens": tokens, "src_lengths": lengths},
            "target": target,
            "ntokens": int(lengths.sum()),
            "nsentences": len(samples),
        }


# -- the task ----------------------------------------------------------------

@register_task("tutorial_names_classification")
class NamesClassificationTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", help="dir with <split>.tsv files "
                                         "(name<TAB>language per line)")

    def __init__(self, args, dictionary, classes):
        super().__init__(args)
        self.dictionary = dictionary
        self.classes = classes  # sorted label names; index = class id

    @classmethod
    def setup_task(cls, args, **kwargs):
        # char-level dictionary + label inventory from the training split
        dictionary = Dictionary()
        classes = set()
        with open(os.path.join(args.data, "train.tsv")) as f:
            for line in f:
                name, label = line.rstrip("\n").split("\t")
                for ch in name:
                    dictionary.add_symbol(ch)
                classes.add(label)
        dictionary.finalize(padding_factor=8)
        return cls(args, dictionary, sorted(classes))

    def load_dataset(self, split, **kwargs):
        names, labels = [], []
        with open(os.path.join(self.args.data, f"{split}.tsv")) as f:
            for line in f:
                name, label = line.rstrip("\n").split("\t")
                names.append(name)
                labels.append(self.classes.index(label))
        self.datasets[split] = NamesDataset(names, labels, self.dictionary)

    @property
    def source_dictionary(self):
        return self.dictionary

    @property
    def target_dictionary(self):
        return self.dictionary  # criterions look here for the pad id


# -- the model -----------------------------------------------------------------

@register_model("tutorial_names_classifier")
class NamesClassifierModel(Model):
    def __init__(self, vocab, num_classes, embed_dim, hidden_dim, pad):
        self.vocab = vocab
        self.num_classes = num_classes
        self.embed_dim = embed_dim
        self.hidden_dim = hidden_dim
        self.pad = pad

    @staticmethod
    def add_args(parser):
        parser.add_argument("--embed-dim", type=int, metavar="N")
        parser.add_argument("--hidden-dim", type=int, metavar="N")

    @classmethod
    def build_model(cls, args, task):
        names_classifier_architecture(args)
        return cls(len(task.dictionary), len(task.classes),
                   args.embed_dim, args.hidden_dim, task.dictionary.pad())

    def init(self, key):
        k = jax.random.fold_in
        return {"params": {
            "embed": init_embedding(k(key, 0), self.vocab, self.embed_dim,
                                    self.pad),
            "fc1": init_linear(k(key, 1), self.embed_dim, self.hidden_dim),
            "fc2": init_linear(k(key, 2), self.hidden_dim,
                               self.num_classes),
        }, "state": {}}

    def forward(self, variables, batch, rng=None, training=False):
        p = variables["params"]
        tokens = batch["src_tokens"]
        x = embedding(p["embed"], tokens)  # (B, T, E)
        real = (tokens != self.pad)[..., None].astype(x.dtype)
        pooled = (x * real).sum(1) / jnp.maximum(real.sum(1), 1.0)
        h = jnp.tanh(linear(p["fc1"], pooled))
        return (linear(p["fc2"], h),), {}


@register_model_architecture("tutorial_names_classifier",
                             "tutorial_names_classifier")
def names_classifier_architecture(args):
    args.embed_dim = getattr(args, "embed_dim", 64)
    args.hidden_dim = getattr(args, "hidden_dim", 128)


# -- the criterion ---------------------------------------------------------------

@register_criterion("tutorial_names_loss")
class NamesLoss(Criterion):
    """Sentence-level CE. Returns an UN-normalized loss sum + sample_size;
    the fused step divides after psumming both across the data axis, so
    the gradient matches on any number of chips."""

    def __call__(self, model, variables, batch, rng=None, training=False):
        net_output, new_state = model.forward(variables, batch, rng,
                                              training)
        logits = net_output[0].astype(jnp.float32)  # (B, C)
        target = batch["target"]
        real = target >= 0  # padding rows carry -1
        lprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            lprobs, jnp.maximum(target, 0)[:, None], axis=-1)[:, 0]
        loss = jnp.sum(jnp.where(real, nll, 0.0))
        correct = jnp.sum(
            jnp.where(real, jnp.argmax(logits, -1) == target, False))
        sample_size = jnp.sum(real)
        # ntokens/nsentences stay host-side; the flat device batch carries
        # only net_input fields + target, so count from src_lengths
        logging_output = {
            "loss": loss,
            "ntokens": jnp.sum(batch["src_lengths"]),
            "nsentences": sample_size,
            "sample_size": sample_size,
            "n_correct": correct,
        }
        return loss, sample_size, logging_output, new_state

    @staticmethod
    def reduce_metrics(logging_outputs, metrics):
        Criterion.reduce_metrics(logging_outputs, metrics)
        n_correct = sum(log.get("n_correct", 0) for log in logging_outputs)
        total = sum(log.get("sample_size", 0) for log in logging_outputs)
        if total > 0:
            metrics.log_scalar(
                "accuracy", 100.0 * n_correct / total, total, round=1)
