"""Hub interface: load a trained model and translate/sample/score from
Python (reference fairseq/hub_utils.py:23-275).

    from fbk_fairseq_st_tpu.hub_utils import from_pretrained
    hub = from_pretrained('/ckpts', 'checkpoint_best.pt', data_name_or_path='/data-bin')
    hub.translate('hello world')
"""

from __future__ import annotations

import argparse
import copy
import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


# Named pretrained models (reference hub_utils/hubconf: the fork's
# published artifacts resolve by name). Zero-egress environment: entries
# map names to LOCAL paths — users register downloads once and every
# from_pretrained('name') after that loads the fork .pt directly (the
# torch->native conversion happens transparently below).
PRETRAINED_REGISTRY: Dict[str, Dict[str, Any]] = {}


def register_pretrained(name: str, path: str, checkpoint_file: str = "model.pt",
                        data_name_or_path: str = ".", **defaults) -> None:
    PRETRAINED_REGISTRY[name] = dict(
        path=path, checkpoint_file=checkpoint_file,
        data_name_or_path=data_name_or_path, **defaults,
    )


def _is_torch_checkpoint(path: str) -> bool:
    """Fork checkpoints are torch.save artifacts: zip archives (PK magic)
    or legacy torch serialization; native checkpoints are plain pickles
    (or sharded directories)."""
    if os.path.isdir(path):
        return False
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # torch >= 1.6 zipfile serialization
        return True
    # legacy (pre-zip) torch.save: a pickle stream that OPENS with the
    # torch magic number as a LONG1 opcode (0x8a). Native checkpoints are
    # plain pickles whose first opcode after PROTO is a FRAME/dict — never
    # LONG1 — so four bytes decide without deserializing gigabytes.
    return head[:1] == b"\x80" and head[2:3] == b"\x8a"


def _ensure_native(model_path: str) -> str:
    """Transparently convert a fork ``.pt`` to the native format, cached
    next to the original (or in a temp dir when that isn't writable),
    keyed by source mtime so re-downloads invalidate."""
    if not _is_torch_checkpoint(model_path):
        return model_path
    import tempfile

    from .utils.fairseq_interop import import_fairseq_checkpoint

    mtime = int(os.path.getmtime(model_path))
    base = os.path.basename(model_path)
    for cache_dir in (os.path.dirname(model_path),
                      os.path.join(tempfile.gettempdir(), "fbk_hub_cache")):
        converted = os.path.join(
            cache_dir, f".{base}.native.{mtime}.pt"
        )
        if os.path.exists(converted):
            return converted
        try:
            os.makedirs(cache_dir, exist_ok=True)
            import_fairseq_checkpoint(model_path, converted)
            logger.info(
                "converted fork checkpoint %s -> %s", model_path, converted
            )
            return converted
        except OSError:
            continue
    raise OSError(f"no writable cache location for converting {model_path}")


def from_pretrained(
    model_name_or_path: str,
    checkpoint_file: str = "model.pt",
    data_name_or_path: str = ".",
    **kwargs,
) -> "GeneratorHubInterface":
    from .registry import TASKS
    from .train import checkpoint as checkpoint_utils

    if model_name_or_path in PRETRAINED_REGISTRY:
        entry = dict(PRETRAINED_REGISTRY[model_name_or_path])
        model_name_or_path = entry.pop("path")
        checkpoint_file = entry.pop("checkpoint_file", checkpoint_file)
        data_name_or_path = entry.pop("data_name_or_path", data_name_or_path)
        for k, v in entry.items():
            kwargs.setdefault(k, v)

    model_path = _ensure_native(
        os.path.join(model_name_or_path, checkpoint_file)
    )
    state = checkpoint_utils.load_checkpoint_to_cpu(model_path)
    args = argparse.Namespace(**state["args"])
    if not os.path.isabs(data_name_or_path):
        data_name_or_path = os.path.join(model_name_or_path, data_name_or_path)
    args.data = data_name_or_path
    for k, v in kwargs.items():
        setattr(args, k, v)

    task = TASKS[args.task].setup_task(args)
    models, _ = checkpoint_utils.load_model_ensemble(
        [model_path], task=task
    )
    return GeneratorHubInterface(args, task, models)


class GeneratorHubInterface:
    def __init__(self, args, task, models):
        self.args = args
        self.task = task
        self.models = models
        # raw-text processing chain (reference hub_utils.py:150-200:
        # tokenize -> BPE -> binarize in, and the reverse out), built from
        # the checkpointed --tokenizer/--bpe args when present
        from .data.encoders import build_bpe, build_tokenizer

        self.tokenizer = build_tokenizer(args)
        self.bpe = build_bpe(args)

    @property
    def src_dict(self):
        return self.task.source_dictionary

    @property
    def tgt_dict(self):
        return self.task.target_dictionary

    def translate(self, sentences, beam: int = 5, verbose: bool = False, **kwargs) -> Any:
        return self.sample(sentences, beam, verbose, **kwargs)

    def sample(self, sentences, beam: int = 1, verbose: bool = False, **kwargs) -> Any:
        single = isinstance(sentences, str)
        if single:
            sentences = [sentences]
        tokenized = [self.encode(s) for s in sentences]
        hypos = self.generate(tokenized, beam, verbose, **kwargs)
        out = [self.decode(h[0]["tokens"]) for h in hypos]
        return out[0] if single else out

    def score(self, sentences, **kwargs):
        single = isinstance(sentences, str)
        if single:
            sentences = [sentences]
        hypos = self.generate(
            [self.encode(s) for s in sentences], score_reference=True, **kwargs
        )
        return hypos[0][0] if single else [h[0] for h in hypos]

    def generate(self, tokenized_sentences, beam: int = 5, verbose: bool = False,
                 score_reference: bool = False, **kwargs) -> List[List[Dict]]:
        gen_args = copy.copy(self.args)
        gen_args.beam = beam
        gen_args.score_reference = score_reference
        for k, v in kwargs.items():
            setattr(gen_args, k, v)
        generator = self.task.build_generator(self.models, gen_args)

        from .data.datasets import collate_tokens

        lengths = np.array([len(t) for t in tokenized_sentences], np.int64)
        src_tokens = collate_tokens(
            tokenized_sentences, self.src_dict.pad(), self.src_dict.eos(),
            left_pad=True,
        )
        sample = {
            "net_input": {"src_tokens": src_tokens, "src_lengths": lengths},
            "target": None,
            "id": np.arange(len(tokenized_sentences)),
        }
        if score_reference:
            sample["target"] = src_tokens  # scoring needs targets supplied
            sample["net_input"]["prev_output_tokens"] = src_tokens
        return self.task.inference_step(generator, self.models, sample)

    def encode(self, sentence: str) -> np.ndarray:
        sentence = self.tokenize(sentence)
        sentence = self.apply_bpe(sentence)
        return np.asarray(
            self.src_dict.encode_line(sentence, add_if_not_exist=False)
        )

    def decode(self, tokens) -> str:
        sentence = self.tgt_dict.string(tokens)
        sentence = self.remove_bpe(sentence)
        return self.detokenize(sentence)

    def tokenize(self, sentence: str) -> str:
        return self.tokenizer.encode(sentence) if self.tokenizer else sentence

    def detokenize(self, sentence: str) -> str:
        return self.tokenizer.decode(sentence) if self.tokenizer else sentence

    def apply_bpe(self, sentence: str) -> str:
        return self.bpe.encode(sentence) if self.bpe else sentence

    def remove_bpe(self, sentence: str) -> str:
        return self.bpe.decode(sentence) if self.bpe else sentence
