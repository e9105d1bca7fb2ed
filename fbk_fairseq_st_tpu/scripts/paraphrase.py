#!/usr/bin/env python3
"""Pivot paraphrasing (reference examples/paraphraser/paraphrase.py:1-76):
translate each input line to the pivot language with a forward model, then
back with a mixture-of-experts backward model, emitting one paraphrase per
expert.

The reference loads hub-packaged pretrained models; here the two systems
are given explicitly as (data dir with dictionaries, checkpoint) pairs:

  python -m fbk_fairseq_st_tpu.scripts.paraphrase \\
      --fwd-data DATA1 --fwd-path ck1.pt -s en -t fr \\
      --bwd-data DATA2 --bwd-path ck2.pt --num-experts 10 [files...]
"""

from __future__ import annotations

import argparse
import fileinput
import logging
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
logger = logging.getLogger("paraphrase")


def _load(data, path, task_name, src, tgt, extra=None):
    from fbk_fairseq_st_tpu import options
    from fbk_fairseq_st_tpu.registry import TASKS
    from fbk_fairseq_st_tpu.train import checkpoint as checkpoint_utils

    parser = options.get_generation_parser(default_task=task_name)
    argv = [data, "--task", task_name, "-s", src, "-t", tgt,
            "--path", path, "--max-tokens", "2000"] + (extra or [])
    args = options.parse_args_and_arch(parser, argv)
    task = TASKS[args.task].setup_task(args)
    models, _ = checkpoint_utils.load_model_ensemble(
        path.split(":"), task=task
    )
    return args, task, models


def _translate(task, models, lines, beam, bos_token=None, max_len_b=200):
    from fbk_fairseq_st_tpu.generation import SequenceGenerator

    src_dict, tgt_dict = task.source_dictionary, task.target_dictionary
    rows = [
        np.asarray(src_dict.encode_line(line, add_if_not_exist=False))
        for line in lines
    ]
    width = max(len(r) for r in rows)
    src = np.full((len(rows), width), src_dict.pad(), np.int64)
    for i, r in enumerate(rows):
        src[i, : len(r)] = r
    gen = SequenceGenerator(tgt_dict, beam_size=beam, max_len_b=max_len_b)
    hypos = gen.generate(
        [models[0]],
        {
            "net_input": {
                "src_tokens": src,
                "src_lengths": np.array([len(r) for r in rows], np.int64),
            },
            "id": np.arange(len(rows)),
        },
        bos_token=bos_token,
    )
    return [tgt_dict.string(np.asarray(sent[0]["tokens"])) for sent in hypos]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fwd-data", required=True)
    parser.add_argument("--fwd-path", required=True)
    parser.add_argument("-s", "--source-lang", default="en")
    parser.add_argument("-t", "--pivot-lang", default="fr")
    parser.add_argument("--bwd-data", required=True)
    parser.add_argument("--bwd-path", required=True)
    parser.add_argument("--num-experts", type=int, default=10)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--cpu", action="store_true",
                        help="run on CPU (e.g. when the TPU is busy)")
    parser.add_argument("files", nargs="*", default=["-"],
                        help='input files; "-" for stdin')
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    logger.info("loading forward model from %s", args.fwd_path)
    _, fwd_task, fwd_models = _load(
        args.fwd_data, args.fwd_path, "translation",
        args.source_lang, args.pivot_lang,
    )
    logger.info("loading backward MoE model from %s", args.bwd_path)
    _, bwd_task, bwd_models = _load(
        args.bwd_data, args.bwd_path, "translation_moe",
        args.pivot_lang, args.source_lang,
        extra=["--method", "hMoEup", "--num-experts", str(args.num_experts)],
    )

    lines = [line.strip() for line in fileinput.input(args.files)]
    pivots = _translate(fwd_task, fwd_models, lines, args.beam)
    for line, pivot in zip(lines, pivots):
        paraphrases = []
        for expert in range(args.num_experts):
            out = _translate(
                bwd_task, bwd_models, [pivot], args.beam,
                bos_token=bwd_task.expert_index(expert),
            )[0]
            paraphrases.append(out)
        print(line)
        for p in paraphrases:
            print(" *", p)


if __name__ == "__main__":
    main()
