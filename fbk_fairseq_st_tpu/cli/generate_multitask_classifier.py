"""Dump classifier-head probabilities per utterance.

Counterpart of examples/speech_recognition/generate_multitask_classifier.py
:21-148: for each utterance prints ``CLASS-<id>\t<prob0> <prob1> ...`` (and
the argmax class) from the multitask model's auxiliary classifier.
"""

from __future__ import annotations

import ast
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import options
from ..registry import TASKS
from ..train import checkpoint as checkpoint_utils
from ..utils.user_dir import import_user_module

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.generate_multitask_classifier")


def cli_main(input_args=None):
    parser = options.get_generation_parser(default_task="speech_recognition")
    args = options.parse_args_and_arch(parser, input_args)
    assert args.path is not None, "--path required!"
    import_user_module(args)
    if args.max_tokens is None and args.max_sentences is None:
        args.max_tokens = 12000

    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"),
        arg_overrides=ast.literal_eval(args.model_overrides),
        task=task,
    )
    model, variables = models[0]

    itr = task.get_batch_iterator(
        dataset=task.dataset(args.gen_subset),
        max_tokens=args.max_tokens,
        max_sentences=args.max_sentences,
        max_positions=task.max_positions(),
        ignore_invalid_inputs=args.skip_invalid_size_inputs_valid_test,
        required_batch_size_multiple=args.required_batch_size_multiple,
        # exact batch-max padding (no shape bucketing): the audio conv
        # frontend is padding-sensitive past the first BatchNorm (as in the
        # fork), so bucket padding would change decode output vs the fork
        bucket_shapes=False,
    ).next_epoch_itr(shuffle=False)

    classify = jax.jit(
        lambda src, lens: model.classify(variables, src, lens)
    )
    results = {}
    for sample in itr:
        if len(sample) == 0:
            continue
        probs = jax.device_get(
            classify(
                jnp.asarray(sample["net_input"]["src_tokens"]),
                jnp.asarray(sample["net_input"]["src_lengths"]),
            )
        )
        for i, sample_id in enumerate(np.asarray(sample["id"])):
            if int(sample_id) < 0:
                continue
            results[int(sample_id)] = probs[i]

    for sample_id in sorted(results):
        p = results[sample_id]
        pred = int(np.argmax(p)) if p.shape[-1] > 1 else int(p[0] > 0.5)
        print(
            "CLASS-{}\t{}\t{}".format(
                sample_id, pred, " ".join(f"{x:.4f}" for x in np.atleast_1d(p))
            )
        )
    return results


if __name__ == "__main__":
    cli_main()
