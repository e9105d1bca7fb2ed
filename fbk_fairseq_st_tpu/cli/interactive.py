"""Interactive translation from stdin/file (reference
fairseq_cli/interactive.py): encode raw lines with the task's source
dictionary, decode in --buffer-size batches, print S-/H-/P- records in input
order."""

from __future__ import annotations

import ast
import logging
import sys
from collections import namedtuple

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
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.interactive")

Batch = namedtuple("Batch", "ids src_tokens src_lengths")


def buffered_read(input, buffer_size):
    buffer = []
    with (sys.stdin if input == "-" else open(input)) as h:
        for src_str in h:
            buffer.append(src_str.strip())
            if len(buffer) >= buffer_size:
                yield buffer
                buffer = []
    if buffer:
        yield buffer


def make_batches(lines, args, task, max_positions, encode_fn=None):
    from ..data.datasets import collate_tokens

    if encode_fn is not None:
        lines = [encode_fn(line) for line in lines]
    tokens = [
        np.asarray(
            task.source_dictionary.encode_line(line, add_if_not_exist=False)
        )
        for line in lines
    ]
    lengths = np.array([t.shape[0] for t in tokens], np.int64)
    src_tokens = collate_tokens(
        tokens, task.source_dictionary.pad(), task.source_dictionary.eos(),
        left_pad=True,
    )
    yield Batch(
        ids=np.arange(len(lines)), src_tokens=src_tokens, src_lengths=lengths
    )


def main(args):
    import_user_module(args)
    if args.buffer_size < 1:
        args.buffer_size = 1
    assert (
        not args.max_sentences or args.max_sentences <= args.buffer_size
    ), "--max-sentences/--batch-size cannot be larger than --buffer-size"

    task = TASKS[args.task].setup_task(args)
    models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"),
        arg_overrides=ast.literal_eval(args.model_overrides),
        task=task,
    )
    from ..quantization.weight_only import maybe_quantize_ensemble

    models = maybe_quantize_ensemble(models, args, logger)
    generator = task.build_generator(models, args)
    tgt_dict = task.target_dictionary

    # raw-text processing chain (reference fairseq_cli/interactive.py:
    # tokenize -> BPE on the way in, BPE -> detokenize on the way out)
    from ..data.encoders import build_bpe, build_tokenizer

    tokenizer = build_tokenizer(args)
    bpe = build_bpe(args)

    def encode_fn(x):
        if tokenizer is not None:
            x = tokenizer.encode(x)
        if bpe is not None:
            x = bpe.encode(x)
        return x

    def decode_fn(x):
        if bpe is not None:
            x = bpe.decode(x)
        if tokenizer is not None:
            x = tokenizer.decode(x)
        return x

    start_id = 0
    max_positions = task.max_positions()
    if args.input == "-":
        logger.info("Type the input sentence and press return:")
    for inputs in buffered_read(args.input, args.buffer_size):
        results = []
        for batch in make_batches(inputs, args, task, max_positions, encode_fn):
            sample = {
                "net_input": {
                    "src_tokens": batch.src_tokens,
                    "src_lengths": batch.src_lengths,
                },
                "target": None,
                "id": batch.ids,
            }
            translations = task.inference_step(generator, models, sample)
            for i, (idx, hypos) in enumerate(zip(batch.ids, translations)):
                results.append((start_id + int(idx), batch.src_tokens[i], hypos))

        for id_, src_tokens, hypos in sorted(results, key=lambda x: x[0]):
            src_str = task.source_dictionary.string(src_tokens, args.remove_bpe)
            print(f"S-{id_}\t{src_str}")
            for hypo in hypos[: args.nbest]:
                hypo_str = tgt_dict.string(hypo["tokens"], args.remove_bpe)
                # H- = tokenized hypothesis, D- = detokenized (reference
                # interactive.py:188-190)
                print(f"H-{id_}\t{hypo['score']}\t{hypo_str}")
                print(f"D-{id_}\t{hypo['score']}\t{decode_fn(hypo_str)}")
                print(
                    "P-{}\t{}".format(
                        id_,
                        " ".join(f"{x:.4f}" for x in hypo["positional_scores"]),
                    )
                )
        start_id += len(inputs)


def cli_main(input_args=None):
    parser = options.get_generation_parser(
        interactive=True, default_task="translation"
    )
    args = options.parse_args_and_arch(parser, input_args)
    main(args)


if __name__ == "__main__":
    cli_main()
