"""export_serving CLI: compile a checkpoint into a serving artifact.

The TPU-native counterpart of the reference's TorchScript/ONNX export
story: the whole beam decode (encoder, cached decoder, search loop) is
lowered ahead-of-time with ``jax.export`` for a fixed set of
(batch, src_len) shape buckets and written, with weights and
dictionaries, into one self-contained directory that
``serving.runtime.ServingModel`` (and the ``serve`` CLI) replays with no
model code or registry.

Usage:
    python -m fbk_fairseq_st_tpu.cli.export_serving DATA \\
        --task speech_translation --path ckpt.pt --beam 5 \\
        --serving-output exported/ --export-buckets 8x1500,16x3000

Composes with --quantize-weights int8 (the dequant traces into the
program; int8 payloads land in the weight files).
"""

from __future__ import annotations

import ast
import logging

from .. import options
from ..quantization.weight_only import maybe_quantize_ensemble
from ..registry import TASKS
from ..serving.export import export_artifact
from ..train import checkpoint as checkpoint_utils
from ..utils.user_dir import import_user_module

logger = logging.getLogger("fbk_fairseq_st_tpu.cli.export_serving")


def add_export_args(parser):
    group = parser.add_argument_group("serving export")
    group.add_argument("--serving-output", required=True, metavar="DIR",
                       help="artifact output directory")
    group.add_argument("--export-buckets", default="8x512",
                       metavar="BxS[,BxS...]",
                       help="static (batch x src_len) shape buckets to "
                            "compile; src_len is frames for audio tasks, "
                            "tokens for text tasks")
    group.add_argument("--export-platforms", default="cpu,tpu",
                       help="comma-separated jax.export lowering platforms")
    group.add_argument("--export-feat-dim", type=int, default=None,
                       help="audio feature dim override (default: the "
                            "checkpoint's input_feat_per_channel)")
    group.add_argument("--export-bos-token", default=None, metavar="SYM|ID",
                       help="decoder start token baked into the program "
                            "(a target-dict symbol or an integer id); "
                            "REQUIRED for tasks whose inference_step "
                            "injects one (multilingual lang tokens)")
    return group


def parse_buckets(spec: str):
    buckets = []
    for part in spec.split(","):
        b, s = part.lower().split("x")
        buckets.append((int(b), int(s)))
    return buckets


def main(args):
    logging.basicConfig(level=logging.INFO)
    import_user_module(args)
    assert args.path is not None, "--path required for export!"

    task = TASKS[args.task].setup_task(args)
    models, model_args = checkpoint_utils.load_model_ensemble(
        args.path.split(":"),
        arg_overrides=ast.literal_eval(args.model_overrides),
        task=task,
    )
    models = maybe_quantize_ensemble(models, args, logger)
    generator = task.build_generator(models, args)

    # tasks that customize inference_step inject a bos/prefix the exported
    # program can't know about (multilingual lang tokens, MoE expert
    # selection) — silently exporting bos=eos would serve the wrong
    # language; demand the explicit flag instead
    from ..tasks.base import Task as BaseTask

    bos_token = None
    if args.export_bos_token is not None:
        tgt = task.target_dictionary
        try:
            bos_token = int(args.export_bos_token)
        except ValueError:
            bos_token = tgt.index(args.export_bos_token)
            if bos_token == tgt.unk():
                raise ValueError(
                    f"--export-bos-token {args.export_bos_token!r} is not "
                    "in the target dictionary"
                )
    elif type(task).inference_step is not BaseTask.inference_step:
        raise ValueError(
            f"task {args.task!r} customizes inference_step (bos/prefix "
            "injection); pass --export-bos-token with the decoder start "
            "symbol (e.g. the target language token) to export it"
        )

    src_dict = getattr(task, "source_dictionary", None)
    if src_dict is None:
        feat_dim = args.export_feat_dim or getattr(
            model_args, "input_feat_per_channel", 40
        )
        src_spec = {
            "kind": "audio", "dtype": "float32", "suffix": [int(feat_dim)],
        }
    else:
        src_spec = {"kind": "tokens", "dtype": "int32"}

    buckets = parse_buckets(args.export_buckets)
    logger.info(
        "exporting %s for buckets %s to %s",
        args.path, buckets, args.serving_output,
    )
    meta = export_artifact(
        models,
        generator,
        buckets,
        args.serving_output,
        tgt_dict=task.target_dictionary,
        src_dict=src_dict,
        src_spec=src_spec,
        platforms=tuple(args.export_platforms.split(",")),
        bos_token=bos_token,
        remove_bpe=args.remove_bpe,
        provenance={
            "arch": getattr(model_args, "arch", None),
            "task": args.task,
            "checkpoint": args.path,
        },
    )
    logger.info(
        "wrote artifact: %d program(s), %d model(s), beam %d",
        len(meta["programs"]), meta["num_models"], meta["beam_size"],
    )
    return meta


def cli_main(input_args=None):
    parser = options.get_generation_parser()
    add_export_args(parser)
    args = options.parse_args_and_arch(parser, input_args)
    return main(args)


if __name__ == "__main__":
    cli_main()
