"""Generate CLI: batched decode + S/T/H/D/P records + corpus BLEU.

Counterpart of fairseq_cli/generate.py:23-269: loads the model ensemble from
checkpointed args, iterates the gen subset in fixed order, decodes with the
task's generator and prints the fork's record format (T-/H-/D-/P- lines; S-
only when a source dictionary exists — audio sources have none) and the
final "Generate ... BLEU" line so outputs diff cleanly against the fork.
"""

from __future__ import annotations

import ast
import logging
import math
import os
import sys

import numpy as np

from .. import options
from ..data.dictionary import post_process
from ..registry import TASKS
from ..scoring import bleu
from ..train import checkpoint as checkpoint_utils
from ..train.meters import StopwatchMeter, TimeMeter
from ..train.progress import progress_bar
from ..utils.user_dir import import_user_module


def main(args):
    assert args.path is not None, "--path required for generation!"
    assert (
        not args.sampling or args.nbest == args.beam
    ), "--sampling requires --nbest to be equal to --beam"

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
        stream=output_file if output_file is not sys.stdout else sys.stdout,
    )
    logger = logging.getLogger("fbk_fairseq_st_tpu.cli.generate")

    import_user_module(args)
    if args.max_tokens is None and args.max_sentences is None:
        args.max_tokens = 12000

    # load ensemble from checkpointed args
    logger.info("loading model(s) from {}".format(args.path))
    overrides = ast.literal_eval(args.model_overrides)
    # the task is set up from CLI args (needs `data` positional)
    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    models, _model_args = checkpoint_utils.load_model_ensemble(
        args.path.split(":"), arg_overrides=overrides, task=task
    )
    from ..quantization.weight_only import maybe_quantize_ensemble

    models = maybe_quantize_ensemble(models, args, logger)

    src_dict = getattr(task, "source_dictionary", None)
    tgt_dict = task.target_dictionary

    # --replace-unk (reference generate.py:91): alignment dictionary from
    # preprocess --alignfile, or {} to copy the aligned source token
    from ..utils.align_utils import load_align_dict, post_process_prediction

    align_dict = load_align_dict(args.replace_unk)

    # detokenization chain for D- lines (reference generate.py decode_fn)
    from ..data.encoders import build_bpe, build_tokenizer

    tokenizer = build_tokenizer(args)
    bpe = build_bpe(args)

    def decode_fn(x):
        if bpe is not None:
            x = bpe.decode(x)
        if tokenizer is not None:
            x = tokenizer.decode(x)
        return x

    itr = task.get_batch_iterator(
        dataset=task.dataset(args.gen_subset),
        max_tokens=args.max_tokens,
        max_sentences=args.max_sentences,
        max_positions=task.max_positions(),
        ignore_invalid_inputs=args.skip_invalid_size_inputs_valid_test,
        required_batch_size_multiple=args.required_batch_size_multiple,
        num_shards=args.num_shards,
        shard_id=args.shard_id,
        # exact batch-max padding (no shape bucketing): the audio conv
        # frontend is padding-sensitive past the first BatchNorm (as in the
        # fork), so bucket padding would change decode output vs the fork
        bucket_shapes=False,
    ).next_epoch_itr(shuffle=False)
    progress = progress_bar(
        itr,
        log_format=args.log_format,
        log_interval=args.log_interval,
        default_log_format="none",
    )

    gen_timer = StopwatchMeter()
    generator = task.build_generator(models, args)

    if args.sacrebleu:
        scorer = bleu.SacrebleuScorer()
    else:
        scorer = bleu.Scorer(tgt_dict.pad(), tgt_dict.eos(), tgt_dict.unk())

    num_sentences = 0
    wps_meter = TimeMeter()
    for sample in progress:
        if len(sample) == 0:
            continue
        prefix_tokens = None
        if args.prefix_size > 0:
            prefix_tokens = sample["target"][:, : args.prefix_size]

        gen_timer.start()
        hypos = task.inference_step(generator, models, sample, prefix_tokens)
        num_generated_tokens = sum(len(h[0]["tokens"]) for h in hypos if h)
        gen_timer.stop(num_generated_tokens)

        need_alignment = args.print_alignment or align_dict is not None
        if need_alignment and hasattr(models[0][0], "decoder"):
            from ..generation.alignment_utils import attach_alignments

            model0, variables0 = models[0]
            hypos = attach_alignments(
                model0, variables0, sample, hypos, tgt_dict.pad(), tgt_dict.eos()
            )

        for i, sample_id in enumerate(np.asarray(sample["id"])):
            sample_id = int(sample_id)
            if sample_id < 0:  # fixed-shape batch padding rows
                continue
            has_target = sample["target"] is not None
            target_tokens = None
            if has_target:
                target_tokens = np.asarray(sample["target"][i])
                target_tokens = target_tokens[target_tokens != tgt_dict.pad()]

            src_str = ""
            if src_dict is not None and "src_tokens" in sample["net_input"]:
                src = np.asarray(sample["net_input"]["src_tokens"][i])
                if src.ndim == 1:
                    src_str = src_dict.string(src, args.remove_bpe)
            target_str = (
                tgt_dict.string(
                    target_tokens, args.remove_bpe, escape_unk=True
                )
                if has_target
                else None
            )

            if not args.quiet:
                if src_str:
                    print(f"S-{sample_id}\t{src_str}", file=output_file)
                if has_target:
                    print(f"T-{sample_id}\t{target_str}", file=output_file)

            for j, hypo in enumerate(hypos[i][: args.nbest]):
                hypo_tokens, hypo_str, alignment = post_process_prediction(
                    hypo_tokens=hypo["tokens"],
                    src_str=src_str,
                    alignment=hypo.get("alignment"),
                    align_dict=align_dict,
                    tgt_dict=tgt_dict,
                    remove_bpe=args.remove_bpe,
                )
                detok_hypo_str = decode_fn(hypo_str)
                if not args.quiet:
                    score = hypo["score"] / math.log(2)  # convert to base 2
                    # original hypothesis (after tokenization and BPE)
                    print(f"H-{sample_id}\t{score}\t{hypo_str}", file=output_file)
                    # detokenized hypothesis
                    print(
                        f"D-{sample_id}\t{score}\t{detok_hypo_str}",
                        file=output_file,
                    )
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

                    if args.print_alignment and alignment is not None:
                        print(
                            "A-{}\t{}".format(sample_id, " ".join(alignment)),
                            file=output_file,
                        )

                    if args.print_step and hypo.get("steps") is not None:
                        print(
                            f"I-{sample_id}\t{hypo['steps']}", file=output_file
                        )

                    if getattr(args, "retain_iter_history", False):
                        for step, h_toks in enumerate(hypo.get("history", [])):
                            _, h_str, _ = post_process_prediction(
                                hypo_tokens=h_toks,
                                src_str=src_str,
                                alignment=None,
                                align_dict=None,
                                tgt_dict=tgt_dict,
                                remove_bpe=None,
                            )
                            print(
                                f"E-{sample_id}_{step}\t{h_str}",
                                file=output_file,
                            )

                if has_target and j == 0:
                    score_target = target_tokens
                    if align_dict is not None or args.remove_bpe is not None:
                        # score the post-processed words (reference
                        # generate.py:243-246)
                        score_target = np.asarray(
                            tgt_dict.encode_line(
                                target_str, add_if_not_exist=True
                            )
                        )
                    if args.sacrebleu:
                        scorer.add_string(target_str, detok_hypo_str)
                    else:
                        scorer.add(
                            np.asarray(score_target).astype(np.int32),
                            np.asarray(hypo_tokens).astype(np.int32),
                        )

            num_sentences += 1
        wps_meter.update(num_generated_tokens)
        progress.log({"wps": round(wps_meter.avg)})

    logger.info(
        "NOTE: hypothesis and token scores are output in base 2"
    )
    logger.info(
        "Translated {} sentences ({} tokens) in {:.1f}s ({:.2f} sentences/s, "
        "{:.2f} tokens/s)".format(
            num_sentences,
            gen_timer.n,
            gen_timer.sum,
            num_sentences / max(gen_timer.sum, 1e-6),
            1.0 / max(gen_timer.avg, 1e-9),
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
    parser = options.get_generation_parser()
    args = options.parse_args_and_arch(parser, input_args)
    return main(args)


if __name__ == "__main__":
    cli_main()
