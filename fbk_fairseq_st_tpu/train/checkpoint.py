"""Checkpoint save/load with the reference's rotation & reset semantics.

Counterpart of fairseq/checkpoint_utils.py: ``save_checkpoint`` decides which
of checkpoint{epoch}.pt / checkpoint_{updates}.pt / checkpoint_best.pt /
checkpoint_last.pt to write (:23-115, incl. --keep-last-epochs /
--keep-interval-updates / --keep-best-checkpoints GC and
maximize_best_checkpoint_metric), ``load_checkpoint`` restores training state
incl. the mid-epoch iterator position and honors the --reset-* flags
(:118-163).

Formats (--checkpoint-format):
  * ``pickle`` (default): a single ``.pt`` file, pickled dict {args, model
    (params), model_state, opt_state, lr_scheduler,
    extra_state{train_iterator, val_loss, metrics}} — same logical layout
    as the reference's torch.save dict, numpy arrays instead of tensors;
    keeps fork-style tooling (averaging, inspection) trivial.
  * ``sharded``: a ``.pt`` DIRECTORY of per-shard array files + manifest
    (train/sharded_checkpoint.py) — each host writes only the shards it
    owns, no whole-tree gather; ``--async-checkpoint`` moves the file IO to
    a background thread. Readers (load_checkpoint_to_cpu and everything
    above it) handle both formats transparently.
"""

from __future__ import annotations

import collections
import logging
import os
import pickle
import re
import tempfile
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from . import metrics

logger = logging.getLogger(__name__)


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_state(filename: str, state: Dict[str, Any]) -> None:
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, filename)


def load_checkpoint_to_cpu(path: str) -> Dict[str, Any]:
    from .sharded_checkpoint import is_sharded_checkpoint, load_sharded

    if is_sharded_checkpoint(path):
        return load_sharded(path)
    with open(path, "rb") as f:
        return pickle.load(f)


class CheckpointManager:
    """Stateful best-tracking (reference save_checkpoint.best attribute)."""

    def __init__(self):
        self.best: Optional[float] = None


_manager = CheckpointManager()
_async_writer = None


def wait_for_async_writes() -> None:
    """Block until any in-flight async checkpoint write lands (call before
    reading a just-written checkpoint or at training exit)."""
    if _async_writer is not None:
        _async_writer.wait()


def _remove_checkpoint(path: str) -> None:
    from .sharded_checkpoint import clear_path

    clear_path(path)


def save_checkpoint(args, trainer, epoch_itr, val_loss) -> None:
    """Reference checkpoint_utils.py:23-115."""
    if getattr(args, "no_save", False):
        return
    best_function = max if getattr(args, "maximize_best_checkpoint_metric", False) else min
    prev_best = _manager.best if _manager.best is not None else val_loss
    if val_loss is not None:
        _manager.best = best_function(val_loss, prev_best)

    save_dir = args.save_dir
    os.makedirs(save_dir, exist_ok=True)

    end_of_epoch = epoch_itr.end_of_epoch()
    epoch = epoch_itr.epoch
    updates = trainer.get_num_updates()

    checkpoint_conds = collections.OrderedDict()
    save_interval = getattr(args, "save_interval", 1)
    save_interval_updates = getattr(args, "save_interval_updates", 0)
    checkpoint_conds[f"checkpoint{epoch}.pt"] = (
        end_of_epoch
        and not getattr(args, "no_epoch_checkpoints", False)
        and epoch % save_interval == 0
    )
    checkpoint_conds[f"checkpoint_{epoch}_{updates}.pt"] = (
        not end_of_epoch
        and save_interval_updates > 0
        and updates % save_interval_updates == 0
    )
    checkpoint_conds["checkpoint_best.pt"] = val_loss is not None and (
        _manager.best is None or val_loss == _manager.best
    )
    if val_loss is not None and getattr(args, "keep_best_checkpoints", -1) > 0:
        checkpoint_conds[
            "checkpoint.best_{}_{:.2f}.pt".format(
                getattr(args, "best_checkpoint_metric", "loss"), val_loss
            )
        ] = _manager.best is None or val_loss == _manager.best
    checkpoint_conds["checkpoint_last.pt"] = not getattr(
        args, "no_last_checkpoints", False
    )

    # --checkpoint-suffix (reference checkpoint_utils.py:48): every file
    # name gets the suffix before .pt — the reference's per-model-part
    # naming scheme for TP partitions, usable for any side-by-side runs
    suffix = getattr(args, "checkpoint_suffix", "") or ""
    if suffix:
        checkpoint_conds = collections.OrderedDict(
            (fn[: -len(".pt")] + suffix + ".pt", cond)
            for fn, cond in checkpoint_conds.items()
        )

    extra_state = {
        "train_iterator": epoch_itr.state_dict(),
        "val_loss": val_loss,
        "metrics": metrics.state_dict(),
    }
    if _manager.best is not None:
        extra_state["best"] = _manager.best

    sharded = getattr(args, "checkpoint_format", "pickle") == "sharded"
    if sharded:
        # keep device arrays as-is: each host writes only its own shards
        state = {
            "args": vars(args) if not isinstance(args, dict) else args,
            "model": trainer.params,
            "model_state": trainer.model_state,
            "opt_state": trainer.train_state["opt_state"],
            "lr_scheduler": trainer.lr_scheduler.state_dict(),
            "num_updates": trainer.get_num_updates(),
            "extra_state": extra_state,
        }
    else:
        fetched = trainer.state_for_checkpoint()  # ONE device->host fetch
        state = {
            "args": vars(args) if not isinstance(args, dict) else args,
            "model": _to_numpy(fetched.pop("params")),
            **{
                k: _to_numpy(v) if k in ("model_state", "opt_state") else v
                for k, v in fetched.items()
            },
            "extra_state": extra_state,
        }

    checkpoints = [
        os.path.join(save_dir, fn) for fn, cond in checkpoint_conds.items() if cond
    ]

    def _collect_garbage():
        # retention GC only on process 0: concurrent per-host rmtree of the
        # same shared-filesystem paths can throw or leave partial deletes
        if jax.process_index() != 0:
            return
        sfx = re.escape(getattr(args, "checkpoint_suffix", "") or "")
        keep_interval_updates = getattr(args, "keep_interval_updates", -1)
        if keep_interval_updates > 0:
            found = checkpoint_paths(
                save_dir, pattern=r"checkpoint_\d+_(\d+)" + sfx + r"\.pt"
            )
            for old_chk in found[keep_interval_updates:]:
                _remove_checkpoint(old_chk)
        keep_last_epochs = getattr(args, "keep_last_epochs", -1)
        if keep_last_epochs > 0:
            found = checkpoint_paths(
                save_dir, pattern=r"checkpoint(\d+)" + sfx + r"\.pt"
            )
            for old_chk in found[keep_last_epochs:]:
                _remove_checkpoint(old_chk)
        keep_best = getattr(args, "keep_best_checkpoints", -1)
        if keep_best > 0:
            found = checkpoint_paths(
                save_dir,
                pattern=r"checkpoint\.best_{}_(\d+\.?\d*){}\.pt".format(
                    getattr(args, "best_checkpoint_metric", "loss"), sfx
                ),
            )
            if not getattr(args, "maximize_best_checkpoint_metric", False):
                found = found[::-1]
            for old_chk in found[keep_best:]:
                _remove_checkpoint(old_chk)

    if checkpoints:
        if sharded:
            from .sharded_checkpoint import AsyncCheckpointWriter, save_sharded

            if getattr(args, "async_checkpoint", False):
                global _async_writer
                if _async_writer is None:
                    _async_writer = AsyncCheckpointWriter()
                # device->host snapshot is synchronous; file IO (incl. the
                # extra-name copies) and the retention GC run in the
                # background once the new files exist
                _async_writer.save(
                    checkpoints, state, on_complete=_collect_garbage
                )
                logger.info(
                    "async checkpoint save started: {} (epoch {} @ {} "
                    "updates)".format(checkpoints[0], epoch, updates)
                )
                return
            else:
                # extra-name copies happen inside the commit protocol:
                # process 0 only, tmp+rename atomic, behind the shard
                # barriers (ADVICE r02 medium)
                save_sharded(checkpoints, state)
        else:
            # pickle format gathers the whole tree on every process; only
            # process 0 may touch the shared filesystem
            if jax.process_index() == 0:
                save_state(checkpoints[0], state)
                import shutil

                for cp in checkpoints[1:]:
                    # streaming copy to a tmp name + atomic rename: a crash
                    # mid-copy must never leave a truncated checkpoint_last.pt
                    shutil.copyfile(checkpoints[0], cp + ".tmp")
                    os.replace(cp + ".tmp", cp)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                # other hosts must not read checkpoint_last.pt mid-copy
                multihost_utils.sync_global_devices("pickle_ckpt_committed")
        logger.info(
            "saved checkpoint {} (epoch {} @ {} updates)".format(
                checkpoints[0], epoch, updates
            )
        )

    # retention GC; under async checkpointing ONLY the writer thread runs
    # it (after its files land) — a concurrent main-thread pass would race
    # the in-flight writer's deferred GC on the same paths
    if not (sharded and getattr(args, "async_checkpoint", False)):
        _collect_garbage()


def checkpoint_paths(path: str, pattern: str = r"checkpoint(\d+)\.pt") -> List[str]:
    """Checkpoints in *path* matching *pattern*, descending by the float
    capture group (reference checkpoint_utils.py checkpoint_paths)."""
    pt_regexp = re.compile(pattern)
    entries = []
    for f in os.listdir(path):
        m = pt_regexp.fullmatch(f)
        if m is not None:
            idx = float(m.group(1)) if len(m.groups()) > 0 else 0
            entries.append((idx, m.group(0)))
    return [os.path.join(path, x[1]) for x in sorted(entries, reverse=True)]


def merge_partial_state(init_tree, ckpt_tree, _path=""):
    """Non-strict model restore (--allow-partial-restore, the FBK fork's
    reference options.py:464 / checkpoint_utils.py:138): keep the fresh
    initialization for params the checkpoint lacks, drop checkpoint params
    the model lacks, and fail loudly on shape mismatches (torch's
    strict=False would too).

    Returns (merged_tree, missing_names, unexpected_names)."""
    merged, missing, unexpected = {}, [], []
    ckpt = ckpt_tree if isinstance(ckpt_tree, dict) else {}
    for k, v in init_tree.items():
        name = _path + str(k)
        if isinstance(v, dict):
            sub = ckpt.get(k)
            if not isinstance(sub, dict):
                merged[k] = v
                missing.append(name)
            else:
                m, mi, un = merge_partial_state(v, sub, name + ".")
                merged[k] = m
                missing += mi
                unexpected += un
        elif k in ckpt and not isinstance(ckpt[k], dict):
            got, want = getattr(ckpt[k], "shape", ()), getattr(v, "shape", ())
            if got != want:
                raise ValueError(
                    f"partial restore: param '{name}' has shape {got} in "
                    f"the checkpoint but {want} in the model"
                )
            merged[k] = ckpt[k]
        else:
            merged[k] = v
            missing.append(name)
    for k in ckpt:
        if k not in init_tree:
            unexpected.append(_path + str(k))
    return merged, missing, unexpected


def load_checkpoint(args, trainer, task) -> tuple:
    """Load checkpoint_last (or --restore-file) and restore iterator state.

    Returns (extra_state, epoch_itr). Reference checkpoint_utils.py:118-163.
    """
    reset_optimizer = getattr(args, "reset_optimizer", False)
    reset_lr_scheduler = getattr(args, "reset_lr_scheduler", False)
    reset_meters = getattr(args, "reset_meters", False)
    reset_dataloader = getattr(args, "reset_dataloader", False)

    restore_file = getattr(args, "restore_file", "checkpoint_last.pt")
    suffix = getattr(args, "checkpoint_suffix", "") or ""
    if suffix and restore_file == "checkpoint_last.pt":
        # reference checkpoint_utils.py:126: the default restore name picks
        # up the suffix so suffixed runs resume from their own files
        restore_file = "checkpoint_last" + suffix + ".pt"
    if os.path.isabs(restore_file):
        checkpoint_path = restore_file
    else:
        checkpoint_path = os.path.join(args.save_dir, restore_file)

    extra_state = None
    wait_for_async_writes()
    if os.path.exists(checkpoint_path):
        state = load_checkpoint_to_cpu(checkpoint_path)
        if getattr(args, "allow_partial_restore", False):
            state["model"], missing, unexpected = merge_partial_state(
                trainer.params, state["model"]
            )
            if missing:
                logger.warning(
                    "partial restore: %d params missing from the checkpoint "
                    "keep their fresh initialization: %s",
                    len(missing), ", ".join(missing[:8]),
                )
            if unexpected:
                logger.warning(
                    "partial restore: %d checkpoint params have no "
                    "counterpart in the model and were dropped: %s",
                    len(unexpected), ", ".join(unexpected[:8]),
                )
            if (missing or unexpected) and state.get("opt_state") is not None:
                # the saved moments were laid out for the checkpoint's
                # param tree, which does not match this model — a fresh
                # optimizer is the only consistent choice (pass
                # --reset-optimizer explicitly to silence this)
                if not reset_optimizer:
                    logger.warning(
                        "partial restore changed the param tree; resetting "
                        "the optimizer state"
                    )
                    reset_optimizer = True
        trainer.load_trainer_state(
            {
                "params": state["model"],
                "model_state": state.get("model_state"),
                "opt_state": None if reset_optimizer else state.get("opt_state"),
                "lr_scheduler": None
                if reset_lr_scheduler
                else state.get("lr_scheduler"),
                "num_updates": 0 if reset_optimizer else state.get("num_updates", 0),
            },
            reset_optimizer=reset_optimizer,
            reset_lr_scheduler=reset_lr_scheduler,
        )
        extra_state = state.get("extra_state")
        if extra_state is not None and "best" in extra_state and not reset_meters:
            _manager.best = extra_state["best"]
        if extra_state is not None and not reset_meters:
            if extra_state.get("metrics"):
                metrics.load_state_dict(extra_state["metrics"])
        logger.info(
            "loaded checkpoint {} ({} updates)".format(
                checkpoint_path, trainer.get_num_updates()
            )
        )
    else:
        logger.info("no existing checkpoint found {}".format(checkpoint_path))

    # build the epoch iterator, restoring mid-epoch position
    epoch = 0
    if extra_state is not None and not reset_dataloader:
        epoch = extra_state["train_iterator"]["epoch"]
    epoch_itr = get_train_iterator(args, trainer, task, epoch=epoch)
    if extra_state is not None and not reset_dataloader:
        epoch_itr.load_state_dict(extra_state["train_iterator"])
    return extra_state, epoch_itr


def get_train_iterator(args, trainer, task, epoch: int = 0):
    return task.get_batch_iterator(
        dataset=task.dataset(getattr(args, "train_subset", "train")),
        max_tokens=getattr(args, "max_tokens", None),
        max_sentences=getattr(args, "max_sentences", None),
        max_positions=task.max_positions(),
        ignore_invalid_inputs=True,
        required_batch_size_multiple=getattr(args, "required_batch_size_multiple", 8),
        seed=getattr(args, "seed", 1),
        num_shards=1,
        shard_id=0,
        epoch=epoch,
    )


def verify_checkpoint_directory(save_dir: str) -> None:
    """Write-probe (reference checkpoint_utils.py:488-499)."""
    os.makedirs(save_dir, exist_ok=True)
    try:
        with tempfile.NamedTemporaryFile(dir=save_dir, prefix="dummy", delete=True):
            pass
    except OSError as e:
        logger.error(f"Unable to access checkpoint save directory: {save_dir}")
        raise e


def prune_layers(params, args):
    """LayerDrop pruning: keep only --{encoder,decoder}-layers-to-keep in
    the loaded tree (reference checkpoint_utils.prune_state_dict). A model
    trained with LayerDrop stays usable after removing whole layers."""

    def subset(tree, keep):
        if isinstance(tree, dict):
            return {
                k: (
                    [v[i] for i in keep]
                    if k == "layers" and isinstance(v, list)
                    else subset(v, keep)
                )
                for k, v in tree.items()
            }
        return tree

    for side in ("encoder", "decoder"):
        spec = getattr(args, f"{side}_layers_to_keep", None)
        if not spec:
            continue
        keep = sorted(int(x) for x in str(spec).split(","))
        if side in params:
            params = dict(params)
            params[side] = subset(params[side], keep)
            setattr(args, f"{side}_layers", len(keep))
            setattr(args, f"{side}_layers_to_keep", None)
    return params


def load_model_ensemble_and_task(filenames: List[str], arg_overrides=None, task=None):
    """Rebuild models from checkpointed args (reference
    checkpoint_utils.py:181-215)."""
    import argparse

    from .. import registry
    from ..registry import TASKS

    ensemble = []
    args = None
    for filename in filenames:
        state = load_checkpoint_to_cpu(filename)
        args = argparse.Namespace(**state["args"])
        if arg_overrides is not None:
            for k, v in arg_overrides.items():
                setattr(args, k, v)
        params = jax.tree_util.tree_map(np.asarray, state["model"])
        if getattr(args, "encoder_layers_to_keep", None) or getattr(
            args, "decoder_layers_to_keep", None
        ):
            params = prune_layers(params, args)
        if task is None:
            task = TASKS[args.task].setup_task(args)
        model = registry.build_model(args, task)
        variables = {
            "params": params,
            "state": state.get("model_state") or {},
        }
        ensemble.append((model, variables))
    return ensemble, args, task


def load_model_ensemble(filenames: List[str], arg_overrides=None, task=None):
    ensemble, args, _task = load_model_ensemble_and_task(
        filenames, arg_overrides, task
    )
    return ensemble, args


def average_checkpoints(inputs: List[str]) -> Dict[str, Any]:
    """Offline checkpoint averaging (reference
    scripts/average_checkpoints.py:15-64): arithmetic mean of every model
    param across the input checkpoints; other fields from the last."""
    params_sum = None
    state = None
    for path in inputs:
        state = load_checkpoint_to_cpu(path)
        p = state["model"]
        if params_sum is None:
            params_sum = jax.tree_util.tree_map(
                lambda x: np.asarray(x, dtype=np.float64), p
            )
        else:
            params_sum = jax.tree_util.tree_map(
                lambda a, b: a + np.asarray(b, dtype=np.float64), params_sum, p
            )
    n = len(inputs)
    state["model"] = jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32), params_sum
    )
    return state
