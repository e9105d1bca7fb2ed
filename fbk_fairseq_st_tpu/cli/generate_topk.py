"""Dump teacher top-k outputs for knowledge distillation.

Counterpart of scripts/generate_topk.py:14-92: teacher-forced forward pass
of a trained teacher; per target position, the top-k (logit, idx) pairs are
saved as TeacherOutputDatasets (``<split>.<tgt>.top{K}_{idx,out}``) in the
data directory — the inputs of speech_translation_with_transcription_kd.
"""

from __future__ import annotations

import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import options
from ..data.knowledge_distillation import TeacherOutputDataset
from ..registry import TASKS
from ..train import checkpoint as checkpoint_utils
from ..utils.user_dir import import_user_module

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.generate_topk")


def gen_outputs(args, task, models):
    dataset = task.dataset(args.gen_subset)
    logger.info(
        "{} {} {} examples".format(args.data, args.gen_subset, len(dataset))
    )
    model, variables = models[0]

    itr = task.get_batch_iterator(
        dataset=dataset,
        max_tokens=args.max_tokens,
        max_sentences=args.max_sentences,
        max_positions=task.max_positions(),
        ignore_invalid_inputs=args.skip_invalid_size_inputs_valid_test,
        required_batch_size_multiple=8,
        # exact batch-max padding (no shape bucketing): the audio conv
        # frontend is padding-sensitive past the first BatchNorm (as in the
        # fork), so bucket padding would change decode output vs the fork
        bucket_shapes=False,
    ).next_epoch_itr(shuffle=False)

    @jax.jit
    def teacher_forward(batch):
        (logits, _), _ = model.forward(variables, batch, training=False)
        topk_outs, topk_idx = jax.lax.top_k(
            logits.astype(jnp.float32), args.distill_topk
        )
        return topk_outs, topk_idx

    outputs = [None] * len(dataset)
    pad = task.target_dictionary.pad()
    for sample in itr:
        if "net_input" not in sample:
            continue
        assert sample["target"] is not None
        batch = {
            "src_tokens": jnp.asarray(sample["net_input"]["src_tokens"]),
            "src_lengths": jnp.asarray(sample["net_input"]["src_lengths"]),
            "prev_output_tokens": jnp.asarray(
                sample["net_input"]["prev_output_tokens"]
            ),
        }
        topk_outs, topk_idx = jax.device_get(teacher_forward(batch))
        targets = np.asarray(sample["target"])
        non_padding = targets != pad
        for i, id_s in enumerate(np.asarray(sample["id"])):
            if int(id_s) < 0:
                continue
            outputs[int(id_s)] = [
                topk_idx[i, non_padding[i]],
                topk_outs[i, non_padding[i]],
            ]
    return outputs


def save_expert_outputs(args, expert_outputs):
    logger.info("Start saving expert outputs..")
    tgt_lang = args.target_lang
    file_prefix = "{}.{}".format(args.gen_subset, tgt_lang)
    path = os.path.join(
        args.data, file_prefix + ".top{}_idx".format(args.distill_topk)
    )
    TeacherOutputDataset.save_bin(
        path, [o[0] for o in expert_outputs if o is not None], np.int32
    )
    logger.info("Written {}".format(path))
    path = os.path.join(
        args.data, file_prefix + ".top{}_out".format(args.distill_topk)
    )
    TeacherOutputDataset.save_bin(
        path, [o[1] for o in expert_outputs if o is not None], np.float32
    )
    logger.info("Written {}".format(path))


def cli_main(input_args=None):
    parser = options.get_generation_parser()
    parser.add_argument("--distill-topk", default=8, type=int)
    args = options.parse_args_and_arch(parser, input_args)
    assert args.path is not None, "--path required for generation!"
    import_user_module(args)
    if args.max_tokens is None and args.max_sentences is None:
        args.max_tokens = 12000

    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    import ast

    models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"),
        arg_overrides=ast.literal_eval(args.model_overrides),
        task=task,
    )
    assert len(models) == 1
    outputs = gen_outputs(args, task, models)
    save_expert_outputs(args, outputs)


if __name__ == "__main__":
    cli_main()
