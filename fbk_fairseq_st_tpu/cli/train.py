"""Train CLI: epoch loop, validate-and-save policy, early stopping.

Counterpart of fairseq_cli/train.py: main (:42), train (:157),
validate_and_save (:214), should_stop_early (:133 — --patience), stop
conditions on --max-epoch/--max-update and lr < --min-lr (:117).
The multi-process spawn path disappears: one process drives the whole TPU
mesh via pjit.
"""

from __future__ import annotations

import logging
import math
import os
import sys

import numpy as np

from .. import options
from ..data.iterators import DevicePrefetchIterator, GroupedIterator
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
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.train")

# preemption flag: set by the SIGTERM/SIGINT handler, checked at update
# boundaries (--save-on-interrupt). A dict so `train` sees main's writes.
_INTERRUPT = {"sig": None}


def _install_interrupt_handlers():
    """SIGTERM/SIGINT -> finish the in-flight update, checkpoint, exit 0.

    Preemptible TPU pods get SIGTERM with a grace window; the reference
    simply dies and loses everything since the last epoch/interval save.
    Returns the previous handlers for restoration (no-op off the main
    thread, where CPython forbids signal.signal).

    Multi-host caveat: each host checks its flag at its own update
    boundary. Pod preemption delivers SIGTERM to all hosts near-
    simultaneously, so they normally agree on the stopping update; in the
    rare race where one host slips one update ahead, the pickle format
    still yields a consistent checkpoint (process 0 writes its own view),
    while `--checkpoint-format sharded` would stall in its commit barrier
    until the grace kill — i.e. behave as if no save happened, never
    corrupt."""
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return {}

    def _handler(sig, frame):
        _INTERRUPT["sig"] = sig
        logger.info(
            "received signal %s: will checkpoint and exit at the next "
            "update boundary", sig,
        )

    return {
        s: signal.signal(s, _handler)
        for s in (signal.SIGTERM, signal.SIGINT)
    }


def _restore_interrupt_handlers(previous) -> None:
    import signal

    for sig, handler in previous.items():
        signal.signal(sig, handler)


def distributed_init(args) -> None:
    """Multi-host bring-up (counterpart of distributed_utils.py:79-143).

    Must run before the first JAX backend use: afterwards jax.devices() is
    the GLOBAL device list, jax.process_index()/process_count() identify
    this launcher, and the trainer's mesh spans every host. Batch formation
    stays host-global-iterator + process-local transfer (parallel/mesh.py
    place_global_array), so no other component changes for multi-host."""
    coord = getattr(args, "distributed_coordinator", None)
    init_method = getattr(args, "distributed_init_method", None)
    if coord is None and init_method:
        # reference-style --distributed-init-method tcp://HOST:PORT is an
        # alias for the coordinator address (env:// has no counterpart:
        # processes are launched explicitly)
        if init_method.startswith("tcp://"):
            coord = init_method[len("tcp://"):]
        elif "://" not in init_method:
            coord = init_method
        else:
            raise ValueError(
                "--distributed-init-method only supports tcp://HOST:PORT "
                f"here (got {init_method!r}); use --distributed-coordinator"
            )
    nproc = getattr(args, "distributed_num_processes", None)
    if coord is None and nproc is None:
        return
    import jax

    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if nproc is not None:
        kwargs["num_processes"] = nproc
    if getattr(args, "distributed_process_id", None) is not None:
        kwargs["process_id"] = args.distributed_process_id
    if getattr(args, "distributed_local_device_ids", None):
        kwargs["local_device_ids"] = [
            int(x) for x in args.distributed_local_device_ids.split(",")
        ]
    jax.distributed.initialize(**kwargs)
    if jax.process_index() != 0:
        # rank>0 logs silenced to warnings (reference
        # distributed_utils.py:105-108)
        logging.getLogger().setLevel(logging.WARNING)
    logger.info(
        "initialized multi-host training: process %d/%d, %d local + %d "
        "global devices",
        jax.process_index(), jax.process_count(),
        len(jax.local_devices()), len(jax.devices()),
    )


def main(args):
    import_user_module(args)
    assert (
        getattr(args, "max_tokens", None) is not None
        or getattr(args, "max_sentences", None) is not None
    ), "Must specify batch size either with --max-tokens or --max-sentences"

    distributed_init(args)
    np.random.seed(args.seed)
    checkpoint_utils.verify_checkpoint_directory(args.save_dir)

    # fresh global state per run (the reference gets this from one process
    # per run; here several CLI runs may share a process, e.g. in tests)
    metrics.reset()
    checkpoint_utils._manager.best = None
    for attr in ("best", "num_runs"):
        if hasattr(should_stop_early, attr):
            delattr(should_stop_early, attr)

    task = TASKS[args.task].setup_task(args)

    # load datasets
    for valid_sub_split in args.valid_subset.split(","):
        if not getattr(args, "disable_validation", False):
            task.load_dataset(valid_sub_split, combine=False, epoch=0)
    task.load_dataset(args.train_subset, combine=True, epoch=0)

    model = task.build_model(args)
    criterion = task.build_criterion(args)
    logger.info(f"model {args.arch}, criterion {criterion.__class__.__name__}")

    quantizer = None
    if getattr(args, "quantization_config_path", None):
        # in-training iterative PQ (reference fairseq_cli/train.py:81-94)
        from ..quantization.quantizer import Quantizer

        quantizer = Quantizer(
            args.quantization_config_path,
            max_epoch=getattr(args, "max_epoch", 0) or 0,
            max_update=getattr(args, "max_update", 0) or 0,
        )

    trainer = Trainer(args, task, model, criterion, quantizer=quantizer)
    if quantizer is not None:
        quantizer.set_trainer(trainer)
    n_params = sum(
        int(np.prod(p.shape))
        for p in _tree_leaves(trainer.params)
    )
    logger.info(f"num. model params: {n_params}")
    logger.info(
        "training on {} devices (mesh {})".format(
            trainer.mesh.devices.size, dict(trainer.mesh.shape)
        )
    )

    if hasattr(task, "set_trainer"):
        # semisupervised online back-translation reads live params
        task.set_trainer(trainer)

    extra_state, epoch_itr = checkpoint_utils.load_checkpoint(args, trainer, task)
    if quantizer is not None:
        # re-detect after restore: a quantized checkpoint's param tree
        # already carries w_codes for the completed stages
        quantizer.set_trainer(trainer)

    lr = trainer.get_lr()
    max_epoch = args.max_epoch or math.inf
    max_update = args.max_update or math.inf
    valid_losses = [None]
    valid_subsets = args.valid_subset.split(",")

    profile_dir = None
    if getattr(args, "profile", False):
        # XLA/TPU trace viewable in TensorBoard or Perfetto (replaces the
        # reference's torch.autograd profiler hooks)
        import jax

        profile_dir = os.path.join(args.save_dir, "profile")
        jax.profiler.start_trace(profile_dir)
        logger.info("jax.profiler trace -> {}".format(profile_dir))

    _INTERRUPT["sig"] = None
    prev_handlers = (
        _install_interrupt_handlers()
        if getattr(args, "save_on_interrupt", True)
        else {}
    )
    try:
        while (
            lr > args.min_lr
            and epoch_itr.epoch < max_epoch
            and trainer.get_num_updates() < max_update
        ):
            if hasattr(task, "set_epoch_updates"):
                task.set_epoch_updates(trainer.get_num_updates())
            valid_losses = train(args, trainer, task, epoch_itr, max_update)
            if _INTERRUPT["sig"] is not None:
                logger.info(
                    "exiting cleanly on signal %s (checkpoint saved)",
                    _INTERRUPT["sig"],
                )
                break
            if should_stop_early(args, valid_losses[0]):
                logger.info(
                    f"early stop since valid performance hasn't improved for "
                    f"last {args.patience} runs"
                )
                break
            lr = trainer.lr_step(epoch_itr.epoch, valid_losses[0])
            if trainer.get_num_updates() >= max_update:
                break
    finally:
        _restore_interrupt_handlers(prev_handlers)

    if profile_dir is not None:
        import jax

        jax.profiler.stop_trace()
        logger.info("profiler trace written to {}".format(profile_dir))

    checkpoint_utils.wait_for_async_writes()
    logger.info("done training")


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def should_stop_early(args, valid_loss) -> bool:
    if valid_loss is None or getattr(args, "patience", -1) <= 0:
        return False

    def is_better(a, b):
        return a > b if args.maximize_best_checkpoint_metric else a < b

    prev_best = getattr(should_stop_early, "best", None)
    if prev_best is None or is_better(valid_loss, prev_best):
        should_stop_early.best = valid_loss
        should_stop_early.num_runs = 0
        return False
    should_stop_early.num_runs = getattr(should_stop_early, "num_runs", 0) + 1
    return should_stop_early.num_runs >= args.patience


def train(args, trainer, task, epoch_itr, max_update):
    """Train for one epoch (reference fairseq_cli/train.py:157-212)."""
    itr = epoch_itr.next_epoch_itr(
        shuffle=(epoch_itr.epoch > args.curriculum),
    )
    if trainer.quantizer is not None:
        # epoch-scheduled iPQ stage boundaries (reference trainer.py:328)
        trainer.quantizer.begin_epoch(epoch_itr.epoch)
    update_freq = (
        args.update_freq[epoch_itr.epoch - 1]
        if epoch_itr.epoch <= len(args.update_freq)
        else args.update_freq[-1]
    )
    if getattr(args, "device_prefetch", 2) > 0:
        # overlap host->device batch transfer with the running step
        itr = DevicePrefetchIterator(
            itr, trainer.stage_sample,
            lookahead=getattr(args, "device_prefetch", 2),
        )
    # K>1 fuses K updates into one device dispatch (trainer.train_step_multi,
    # a lax.scan over K batches); requires update_freq 1 and no BMUF (both
    # need host work between updates). Validation/saving cadence then
    # quantizes to block boundaries (the '//' crossing checks below).
    spe = max(int(getattr(args, "steps_per_execution", 1) or 1), 1)
    use_spe = spe > 1 and update_freq == 1 and trainer.bmuf is None
    itr = GroupedIterator(itr, spe if use_spe else update_freq)
    progress = progress_bar(
        itr,
        log_format=args.log_format,
        log_interval=args.log_interval,
        epoch=epoch_itr.epoch,
        tensorboard_logdir=getattr(args, "tensorboard_logdir", None),
        default_log_format="simple",
    )

    valid_subsets = args.valid_subset.split(",")
    valid_losses = [None]
    with metrics.aggregate("train") as agg:
        for samples in progress:
            prev_updates = trainer.get_num_updates()
            with metrics.aggregate("train_inner"):
                log_output = (
                    trainer.train_step_multi(samples)
                    if use_spe
                    else trainer.train_step(samples)
                )
                if log_output is None:
                    continue
            num_updates = trainer.get_num_updates()
            if num_updates // args.log_interval > prev_updates // args.log_interval:
                stats = get_training_stats(
                    metrics.get_smoothed_values("train_inner")
                )
                progress.log(stats, tag="train_inner", step=num_updates)
                metrics.reset_meters("train_inner")

            valid_losses = validate_and_save(
                args, trainer, task, epoch_itr, valid_subsets,
                end_of_epoch=False, prev_updates=prev_updates,
            )
            if _INTERRUPT["sig"] is not None:
                # preemption: checkpoint NOW (no validation — the grace
                # window is short) and skip the end-of-epoch work; the
                # mid-epoch iterator position rides in the checkpoint, so
                # resume continues exactly here
                trainer.flush_logs()
                checkpoint_utils.save_checkpoint(
                    args, trainer, epoch_itr, None
                )
                return valid_losses
            if trainer.get_num_updates() >= max_update:
                break
        trainer.flush_logs()  # deferred log_sync_interval>1 outputs

    valid_losses = validate_and_save(
        args, trainer, task, epoch_itr, valid_subsets, end_of_epoch=True
    )
    stats = get_training_stats(metrics.get_smoothed_values("train"))
    progress.print(stats, tag="train", step=trainer.get_num_updates())
    metrics.reset_meters("train")
    return valid_losses


def validate_and_save(args, trainer, task, epoch_itr, valid_subsets, end_of_epoch,
                      prev_updates=None):
    """Reference fairseq_cli/train.py:214-253. ``prev_updates`` (the count
    before the last train call) makes the every-N-updates check a boundary
    CROSSING, so a steps-per-execution block that jumps the counter past a
    multiple of save_interval_updates still triggers the save."""
    num_updates = trainer.get_num_updates()
    si = args.save_interval_updates
    crossed_save = (
        si > 0
        and num_updates > 0
        and (
            num_updates % si == 0
            if prev_updates is None
            else num_updates // si > prev_updates // si
        )
    )
    do_save = (
        (
            end_of_epoch
            and epoch_itr.epoch % args.save_interval == 0
        )
        or crossed_save
    )
    do_validate = (
        (
            (not end_of_epoch and do_save)
            or (end_of_epoch and epoch_itr.epoch % args.validate_interval == 0)
        )
        and not getattr(args, "disable_validation", False)
    )

    valid_losses = [None]
    if do_validate or do_save:
        # drain deferred logging outputs first: the NaN check runs there,
        # so a checkpoint can never persist params from an undetected
        # non-finite update, and saved metrics state is current
        trainer.flush_logs()
    if do_validate:
        valid_losses = validate(args, trainer, task, epoch_itr, valid_subsets)
    if do_save:
        checkpoint_utils.save_checkpoint(args, trainer, epoch_itr, valid_losses[0])
    return valid_losses


def validate(args, trainer, task, epoch_itr, subsets):
    """Reference fairseq_cli/train.py:255-294."""
    valid_losses = []
    for subset in subsets:
        itr = task.get_batch_iterator(
            dataset=task.dataset(subset),
            max_tokens=getattr(args, "max_tokens_valid", None) or args.max_tokens,
            max_sentences=getattr(args, "max_sentences_valid", None)
            or args.max_sentences,
            max_positions=task.max_positions(),
            ignore_invalid_inputs=True,
            required_batch_size_multiple=args.required_batch_size_multiple,
            seed=args.seed,
        ).next_epoch_itr(shuffle=False)
        progress = progress_bar(
            itr,
            log_format=args.log_format,
            log_interval=args.log_interval,
            epoch=epoch_itr.epoch,
            prefix=f"valid on '{subset}' subset",
            tensorboard_logdir=getattr(args, "tensorboard_logdir", None),
            default_log_format="simple",
        )
        with metrics.aggregate(new_root=True) as agg:
            for sample in progress:
                trainer.valid_step(sample)
        stats = get_valid_stats(args, trainer, agg.get_smoothed_values())
        progress.print(stats, tag=subset, step=trainer.get_num_updates())
        valid_losses.append(stats[args.best_checkpoint_metric])
    return valid_losses


def get_training_stats(stats):
    if "nll_loss" in stats and "ppl" not in stats:
        from ..criterions.base import get_perplexity

        stats["ppl"] = get_perplexity(stats["nll_loss"])
    stats["wall"] = round(metrics.get_meter("default", "wall").elapsed_time, 0)
    return stats


def get_valid_stats(args, trainer, stats):
    if "nll_loss" in stats and "ppl" not in stats:
        from ..criterions.base import get_perplexity

        stats["ppl"] = get_perplexity(stats["nll_loss"])
    stats["num_updates"] = trainer.get_num_updates()
    key = "best_" + args.best_checkpoint_metric
    if hasattr(checkpoint_utils._manager, "best") and checkpoint_utils._manager.best is not None:
        best_function = max if args.maximize_best_checkpoint_metric else min
        stats[key] = best_function(
            checkpoint_utils._manager.best, stats[args.best_checkpoint_metric]
        )
    return stats


def cli_main(input_args=None):
    parser = options.get_training_parser()
    args = options.parse_args_and_arch(parser, input_args)
    main(args)


if __name__ == "__main__":
    cli_main()
