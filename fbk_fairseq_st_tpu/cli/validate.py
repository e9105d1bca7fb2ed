"""Validate CLI (reference fairseq_cli/validate.py): run the criterion over
the valid subset(s) of a trained checkpoint and print the aggregated stats."""

from __future__ import annotations

import logging
import sys

from .. import options
from ..registry import TASKS
from ..train import checkpoint as checkpoint_utils
from ..train import metrics
from ..train.progress import progress_bar
from ..train.trainer import Trainer
from ..utils.user_dir import import_user_module

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.validate")


def main(args):
    import_user_module(args)
    assert args.path is not None, "--path required for validation"

    # the validation parser has no optimization group; the Trainer still
    # builds an (unused) optimizer/scheduler
    if not hasattr(args, "lr"):
        args.lr = [0.0]
    if not hasattr(args, "clip_norm"):
        args.clip_norm = 0.0

    state = checkpoint_utils.load_checkpoint_to_cpu(args.path)
    import argparse

    model_args = argparse.Namespace(**state["args"])
    task = TASKS[args.task].setup_task(args)
    model = task.build_model(model_args)
    criterion = task.build_criterion(model_args)
    trainer = Trainer(args, task, model, criterion)
    trainer.load_trainer_state(
        {
            "params": state["model"],
            "model_state": state.get("model_state"),
            "opt_state": None,
            "lr_scheduler": None,
            "num_updates": state.get("num_updates", 0),
        },
        reset_optimizer=True,
        reset_lr_scheduler=True,
    )

    for subset in args.valid_subset.split(","):
        task.load_dataset(subset, combine=False)
        itr = task.get_batch_iterator(
            dataset=task.dataset(subset),
            max_tokens=args.max_tokens,
            max_sentences=args.max_sentences,
            max_positions=task.max_positions(),
            ignore_invalid_inputs=True,
            required_batch_size_multiple=args.required_batch_size_multiple,
            seed=args.seed,
        ).next_epoch_itr(shuffle=False)
        progress = progress_bar(
            itr,
            log_format=args.log_format,
            log_interval=args.log_interval,
            prefix=f"valid on '{subset}' subset",
            default_log_format="simple",
        )
        with metrics.aggregate(new_root=True) as agg:
            for sample in progress:
                trainer.valid_step(sample)
        progress.print(agg.get_smoothed_values(), tag=subset, step=0)


def cli_main(input_args=None):
    parser = options.get_validation_parser()
    args = options.parse_args_and_arch(parser, input_args)
    main(args)


if __name__ == "__main__":
    cli_main()
