"""Generate CLI for dual-decoder models: prints transcript AND translation.

Counterpart of examples/speech_recognition/generate_dualdecoder.py: the
standard T-/H-/D-/P- records plus AUX-/AUXD- lines carrying the transcript
hypothesis each translation descends from.
"""

from __future__ import annotations

import ast
import logging
import math
import os
import sys

import numpy as np

from .. import options
from ..registry import TASKS
from ..scoring import bleu
from ..train import checkpoint as checkpoint_utils
from ..train.meters import StopwatchMeter
from ..utils.user_dir import import_user_module


def main(args):
    assert args.path is not None, "--path required for generation!"
    if args.results_path is not None:
        os.makedirs(args.results_path, exist_ok=True)
        output_path = os.path.join(
            args.results_path, "generate-{}.txt".format(args.gen_subset)
        )
        with open(output_path, "w", buffering=1, encoding="utf-8") as h:
            return _main(args, h)
    return _main(args, sys.stdout)


def _main(args, output_file):
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        level=logging.INFO,
        stream=sys.stdout,
    )
    logger = logging.getLogger("fbk_fairseq_st_tpu.cli.generate_dualdecoder")

    import_user_module(args)
    if args.max_tokens is None and args.max_sentences is None:
        args.max_tokens = 12000

    logger.info("loading model(s) from {}".format(args.path))
    overrides = ast.literal_eval(args.model_overrides)
    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"), arg_overrides=overrides, task=task
    )

    src_dict = task.source_dictionary
    tgt_dict = task.target_dictionary

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

    gen_timer = StopwatchMeter()
    generator = task.build_generator(models, args)
    scorer = bleu.Scorer(tgt_dict.pad(), tgt_dict.eos(), tgt_dict.unk())

    num_sentences = 0
    for sample in itr:
        if len(sample) == 0:
            continue
        gen_timer.start()
        hypos = task.inference_step(generator, models, sample)
        gen_timer.stop(sum(len(h[0]["tokens"]) for h in hypos if h))

        for i, sample_id in enumerate(np.asarray(sample["id"])):
            sample_id = int(sample_id)
            if sample_id < 0:
                continue
            has_target = sample["target"] is not None
            target_tokens = None
            if has_target:
                target_tokens = np.asarray(sample["target"][i])
                target_tokens = target_tokens[target_tokens != tgt_dict.pad()]
                target_str = tgt_dict.string(
                    target_tokens, args.remove_bpe, escape_unk=True
                )
                if not args.quiet:
                    print(f"T-{sample_id}\t{target_str}", file=output_file)

            for j, hypo in enumerate(hypos[i][: args.nbest]):
                hypo_str = tgt_dict.string(hypo["tokens"], args.remove_bpe)
                aux_str = src_dict.string(
                    hypo.get("transcript_tokens", []), args.remove_bpe
                )
                score = hypo["score"] / math.log(2)
                if not args.quiet:
                    print(f"H-{sample_id}\t{score}\t{hypo_str}", file=output_file)
                    print(f"D-{sample_id}\t{score}\t{hypo_str}", file=output_file)
                    print(
                        "P-{}\t{}".format(
                            sample_id,
                            " ".join(
                                f"{x:.4f}"
                                for x in (
                                    hypo["positional_scores"] / math.log(2)
                                ).tolist()
                            ),
                        ),
                        file=output_file,
                    )
                    print(f"AUX-{sample_id}\t{score}\t{aux_str}", file=output_file)
                    print(f"AUXD-{sample_id}\t{score}\t{aux_str}", file=output_file)
                if has_target and j == 0:
                    scorer.add(
                        target_tokens.astype(np.int32),
                        np.asarray(hypo["tokens"]).astype(np.int32),
                    )
            num_sentences += 1

    logger.info(
        "Translated {} sentences in {:.1f}s ({:.2f} sentences/s)".format(
            num_sentences, gen_timer.sum, num_sentences / max(gen_timer.sum, 1e-6)
        )
    )
    if num_sentences > 0:
        logger.info(
            "Generate {} with beam={}: {}".format(
                args.gen_subset, args.beam, scorer.result_string()
            )
        )
    return scorer


def cli_main(input_args=None):
    parser = options.get_generation_parser(
        default_task="speech_translation_dualdecoding"
    )
    args = options.parse_args_and_arch(parser, input_args)
    return main(args)


if __name__ == "__main__":
    cli_main()
