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


def from_pretrained(
    model_name_or_path: str,
    checkpoint_file: str = "model.pt",
    data_name_or_path: str = ".",
    **kwargs,
) -> "GeneratorHubInterface":
    from .registry import TASKS
    from .train import checkpoint as checkpoint_utils

    model_path = os.path.join(model_name_or_path, checkpoint_file)
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
        return np.asarray(
            self.src_dict.encode_line(sentence, add_if_not_exist=False)
        )

    def decode(self, tokens) -> str:
        return self.tgt_dict.string(tokens)
