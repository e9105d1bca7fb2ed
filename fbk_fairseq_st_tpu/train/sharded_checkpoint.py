"""Sharded + async checkpointing (SURVEY §5's TPU checkpoint plan).

The pickle format (train/checkpoint.py) gathers the WHOLE state tree to one
host — fine at one chip, ruinous at a real mesh. This module writes an
orbax-style sharded layout without leaving the repo:

    <name>.pt/                  (a directory; callers keep fork-style names)
      meta.pkl                  args / scheduler / extra_state + manifest
      arrays/<key>.<leaf>.<shard>.npy   one file per DISTINCT global shard

The manifest enumerates every leaf's COMPLETE global shard layout (from the
sharding's devices_indices_map), identical on all processes; each process
writes only the shard files it owns (addressable replica-0 shards), into a
SHARED tmp dir with process-0-prepares / write / process-0-commits barriers
(multihost_utils.sync_global_devices) — so a multi-host mesh saves without
any cross-host gather and without clobbering other hosts' files. Restore
validates that shard volumes tile each leaf exactly (no silent holes);
placement on the *current* mesh is the trainer's job (``load_trainer_state``
re-places with its init-time shardings — see trainer.py).

Async mode snapshots device shards to host memory synchronously (that is
the unavoidable device->host copy) and performs file IO on a background
thread, so training resumes while bytes hit disk — the orbax
AsyncCheckpointer pattern.
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

_MANIFEST = "meta.pkl"
_ARRAYS = "arrays"


def is_sharded_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, _MANIFEST)
    )


def _flatten(tree) -> List[Tuple[str, Any]]:
    from ..parallel.mesh import _path_str

    return [
        (_path_str(path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    ]


def _index_to_tuples(index, shape) -> Tuple[Tuple[int, int], ...]:
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return tuple(out)


def save_sharded(paths, state: Dict[str, Any], array_keys=("model", "model_state", "opt_state")) -> None:
    """Write *state* as a sharded checkpoint directory (plus extra-name
    copies such as checkpoint_last.pt when *paths* lists several names).

    Leaves under *array_keys* may be jax.Arrays (possibly sharded across the
    mesh) or numpy arrays; everything else goes into the manifest pickle.
    """
    if isinstance(paths, str):
        paths = [paths]
    snapshot = _snapshot(state, array_keys)
    _write_snapshot(paths, snapshot)


def _snapshot(state: Dict[str, Any], array_keys) -> Dict[str, Any]:
    """Device->host copy of OWNED shards + the GLOBAL manifest.

    The manifest enumerates every distinct shard of every leaf from the
    array's sharding metadata (``devices_indices_map``), not just the
    shards addressable on this process — every process therefore computes
    the identical, complete manifest, and shard file names derive from the
    (deterministic) sorted shard index, never from device ids. This
    process's payload contains only the shards it owns (an addressable
    replica-0 copy), so a multi-host save writes each shard exactly once
    with no cross-host gather.
    """
    manifest: Dict[str, Any] = {
        "meta": {k: v for k, v in state.items() if k not in array_keys},
        "trees": {},
    }
    shard_payload: List[Tuple[str, np.ndarray]] = []
    for key in array_keys:
        tree = state.get(key)
        if tree is None:
            manifest["trees"][key] = None
            continue
        treedef = jax.tree_util.tree_structure(tree)
        leaves = []
        for leaf_id, (leaf_path, leaf) in enumerate(_flatten(tree)):
            entry = {
                "path": leaf_path,
                "shape": tuple(getattr(leaf, "shape", ())),
                "dtype": str(np.dtype(getattr(leaf, "dtype", np.float32))),
                "shards": [],
            }
            if isinstance(leaf, jax.Array) and leaf.ndim > 0:
                # complete global shard list, identical on every process
                index_map = leaf.sharding.devices_indices_map(leaf.shape)
                distinct = sorted(
                    {
                        _index_to_tuples(idx, leaf.shape)
                        for idx in index_map.values()
                    }
                )
                shard_ids = {idx: i for i, idx in enumerate(distinct)}
                for idx in distinct:
                    fname = f"{key}.{leaf_id}.{shard_ids[idx]}.npy"
                    entry["shards"].append({"index": idx, "file": fname})
                # payload: only shards owned by this process (replica 0)
                for shard in leaf.addressable_shards:
                    if shard.replica_id != 0:
                        continue
                    idx = _index_to_tuples(shard.index, leaf.shape)
                    fname = f"{key}.{leaf_id}.{shard_ids[idx]}.npy"
                    shard_payload.append((fname, np.asarray(shard.data)))
            else:
                arr = np.asarray(jax.device_get(leaf))
                idx = tuple((0, d) for d in arr.shape)
                fname = f"{key}.{leaf_id}.0.npy"
                entry["shards"].append({"index": idx, "file": fname})
                if jax.process_index() == 0:
                    shard_payload.append((fname, arr))
            leaves.append(entry)
        manifest["trees"][key] = {"treedef": treedef, "leaves": leaves}
    return {"manifest": manifest, "shards": shard_payload}


def clear_path(path: str) -> None:
    """Remove a checkpoint file OR sharded checkpoint directory."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.lexists(path):
        os.remove(path)


class FsBarrier:
    """Cross-process barrier over the shared checkpoint filesystem.

    The synchronous save path barriers with
    ``multihost_utils.sync_global_devices`` — a device collective, safe
    because it runs on the main thread between training steps. The ASYNC
    writer thread must never issue device collectives: the main thread keeps
    launching training-step collectives concurrently, and two collective
    streams interleaved in different orders across hosts deadlock the mesh
    (orbax coordinates async commits out-of-band for the same reason).

    Protocol per barrier point: every process drops a zero-byte sentinel
    ``b<seq>.<name>.<process>``; the primary waits for all of them and then
    writes ``b<seq>.<name>.DONE``; non-primaries wait for the DONE marker
    only (so the primary can later GC sentinel files without a lost-wakeup
    race). Sentinels of save *seq* are deleted by the primary at the start
    of save *seq+1* — reaching save seq+1's first barrier proves every
    process finished all of save seq's barriers.
    """

    def __init__(self, root: str, seq: int, timeout: float = 600.0,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.root = root
        self.seq = seq
        self.timeout = timeout
        self.index = (
            jax.process_index() if process_index is None else process_index
        )
        self.count = (
            jax.process_count() if process_count is None else process_count
        )

    def _prefix(self, name: str) -> str:
        return "b{:08d}.{}".format(self.seq, name)

    def __call__(self, name: str) -> None:
        if self.count == 1:
            return
        os.makedirs(self.root, exist_ok=True)
        prefix = self._prefix(name)
        open(os.path.join(self.root, f"{prefix}.{self.index}"), "w").close()
        done = os.path.join(self.root, f"{prefix}.DONE")
        deadline = time.monotonic() + self.timeout
        if self.index == 0:
            while True:
                present = [
                    f for f in os.listdir(self.root)
                    if f.startswith(prefix + ".") and not f.endswith(".DONE")
                ]
                if len(present) >= self.count:
                    break
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"checkpoint barrier {prefix!r}: only "
                        f"{len(present)}/{self.count} processes arrived"
                    )
                time.sleep(0.05)
            open(done, "w").close()
        else:
            while not os.path.exists(done):
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"checkpoint barrier {prefix!r}: no DONE marker "
                        f"from process 0"
                    )
                time.sleep(0.05)

    def gc_older(self) -> None:
        """Primary-only: delete sentinels from saves before *seq* (safe once
        this save's first barrier has been passed by every process)."""
        if self.index != 0 or not os.path.isdir(self.root):
            return
        cur = "b{:08d}.".format(self.seq)
        for f in os.listdir(self.root):
            if f.startswith("b") and f < cur:
                try:
                    os.remove(os.path.join(self.root, f))
                except OSError:
                    pass


def _default_barrier():
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.sync_global_devices
    return lambda name: None


def _write_snapshot(paths, snapshot: Dict[str, Any], barrier=None) -> None:
    """Commit a snapshot to ``paths[0]`` and copy it to the extra names.

    Multi-process protocol (shared filesystem, orbax-style): process 0
    prepares the shared tmp dir; after a barrier every process writes ITS
    OWN shard files into it; after a second barrier process 0 alone writes
    the manifest, atomically renames, and makes the extra-name copies
    (checkpoint_last.pt etc.) via tmp-dir + os.replace so a crash mid-copy
    never leaves a truncated checkpoint; a final barrier keeps other hosts
    from reading a half-committed name. Single-process reduces to
    prepare/write/rename with no barriers.
    """
    if isinstance(paths, str):
        paths = [paths]
    if barrier is None:
        barrier = _default_barrier()

    path = paths[0]
    tmp = path + ".tmp"
    is_primary = jax.process_index() == 0
    if is_primary:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(os.path.join(tmp, _ARRAYS), exist_ok=True)
    barrier("ckpt_tmp_ready")
    for fname, arr in snapshot["shards"]:
        np.save(os.path.join(tmp, _ARRAYS, fname), arr)
    barrier("ckpt_shards_written")
    if is_primary:
        with open(os.path.join(tmp, _MANIFEST), "wb") as f:
            pickle.dump(
                snapshot["manifest"], f, protocol=pickle.HIGHEST_PROTOCOL
            )
        clear_path(path)
        os.replace(tmp, path)
        for extra in paths[1:]:
            clear_path(extra + ".tmp")  # leftover from a crashed save
            shutil.copytree(path, extra + ".tmp")
            clear_path(extra)
            os.replace(extra + ".tmp", extra)
    barrier("ckpt_committed")


def load_sharded(path: str) -> Dict[str, Any]:
    """Assemble a sharded checkpoint into host numpy trees (placement on the
    running mesh happens in the trainer)."""
    with open(os.path.join(path, _MANIFEST), "rb") as f:
        manifest = pickle.load(f)
    out = dict(manifest["meta"])
    for key, tree_info in manifest["trees"].items():
        if tree_info is None:
            out[key] = None
            continue
        leaves = []
        for entry in tree_info["leaves"]:
            arr = np.empty(entry["shape"], np.dtype(entry["dtype"]))
            covered = 0
            for shard in entry["shards"]:
                data = np.load(
                    os.path.join(path, _ARRAYS, shard["file"])
                )
                sl = tuple(slice(a, b) for a, b in shard["index"])
                if arr.ndim == 0:
                    arr = data.reshape(())
                else:
                    arr[sl] = data
                covered += int(
                    np.prod([b - a for a, b in shard["index"]])
                    if shard["index"] else 1
                )
            # rectangular partitions: volumes must tile the leaf exactly,
            # so a hole (missing shard entry) cannot yield silent garbage
            if arr.ndim > 0 and covered != arr.size:
                raise ValueError(
                    f"sharded checkpoint leaf {entry['path']!r} is "
                    f"incomplete: shards cover {covered} of {arr.size} "
                    "elements"
                )
            leaves.append(arr)
        out[key] = jax.tree_util.tree_unflatten(tree_info["treedef"], leaves)
    return out


class AsyncCheckpointWriter:
    """One background writer: the device->host snapshot happens on the
    caller's thread, file IO on the worker. A new save waits for the
    previous write (single in-flight checkpoint, orbax-style). Cross-host
    coordination uses :class:`FsBarrier` — never device collectives — so the
    main thread's training collectives can keep running concurrently."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._seq = 0  # saves are issued in lockstep on every process

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, paths, state: Dict[str, Any], array_keys=("model", "model_state", "opt_state"), on_complete=None) -> None:
        if isinstance(paths, str):
            paths = [paths]
        self.wait()
        snapshot = _snapshot(state, array_keys)
        seq = self._seq
        self._seq += 1
        barrier = FsBarrier(
            os.path.join(os.path.dirname(paths[0]), ".ckpt_sync"), seq
        )

        def _run():
            try:
                _write_snapshot(paths, snapshot, barrier=barrier)
                barrier.gc_older()
                if jax.process_index() == 0:
                    logger.info(
                        "async checkpoint written: %s", ", ".join(paths)
                    )
                    if on_complete is not None:
                        # retention GC: primary only, after files exist —
                        # concurrent per-host rmtree of shared paths races
                        on_complete()
            except BaseException as e:  # surfaced at the next wait()
                self._error = e

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()
