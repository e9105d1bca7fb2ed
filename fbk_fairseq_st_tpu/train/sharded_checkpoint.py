"""Sharded + async checkpointing (SURVEY §5's TPU checkpoint plan).

The pickle format (train/checkpoint.py) gathers the WHOLE state tree to one
host — fine at one chip, ruinous at a real mesh. This module writes an
orbax-style sharded layout without leaving the repo:

    <name>.pt/                  (a directory; callers keep fork-style names)
      meta.pkl                  args / scheduler / extra_state + manifest
      arrays/<leaf>.<shard>.npy one file per addressable shard (replica 0)

Each process writes only the shards it owns (``addressable_shards`` with
``replica_id == 0``), so a multi-host mesh never all-gathers params to save.
The manifest records every leaf's path, shape, dtype, and each shard's
index, so restore can assemble on any topology; placement on the *current*
mesh is the trainer's job (``load_trainer_state`` re-places with its
init-time shardings — see trainer.py).

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
    flat = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        flat.append(("/".join(parts), leaf))
    return flat


def _index_to_tuples(index, shape) -> Tuple[Tuple[int, int], ...]:
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return tuple(out)


def save_sharded(path: str, state: Dict[str, Any], array_keys=("model", "model_state", "opt_state")) -> None:
    """Write *state* as a sharded checkpoint directory.

    Leaves under *array_keys* may be jax.Arrays (possibly sharded across the
    mesh) or numpy arrays; everything else goes into the manifest pickle.
    """
    snapshot = _snapshot(state, array_keys)
    _write_snapshot(path, snapshot)


def _snapshot(state: Dict[str, Any], array_keys) -> Dict[str, Any]:
    """Device->host copy of owned shards + manifest (synchronous part)."""
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
                for shard in leaf.addressable_shards:
                    if shard.replica_id != 0:
                        continue  # one replica writes
                    idx = _index_to_tuples(shard.index, leaf.shape)
                    fname = f"{key}.{leaf_id}.{shard.device.id}.npy"
                    entry["shards"].append({"index": idx, "file": fname})
                    shard_payload.append((fname, np.asarray(shard.data)))
            else:
                arr = np.asarray(jax.device_get(leaf))
                idx = tuple((0, d) for d in arr.shape)
                fname = f"{key}.{leaf_id}.full.npy"
                entry["shards"].append({"index": idx, "file": fname})
                shard_payload.append((fname, arr))
            leaves.append(entry)
        manifest["trees"][key] = {"treedef": treedef, "leaves": leaves}
    return {"manifest": manifest, "shards": shard_payload}


def _write_snapshot(path: str, snapshot: Dict[str, Any]) -> None:
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, _ARRAYS), exist_ok=True)
    for fname, arr in snapshot["shards"]:
        np.save(os.path.join(tmp, _ARRAYS, fname), arr)
    with open(os.path.join(tmp, _MANIFEST), "wb") as f:
        pickle.dump(snapshot["manifest"], f, protocol=pickle.HIGHEST_PROTOCOL)
    if os.path.exists(path):
        shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
    os.replace(tmp, path)


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
            for shard in entry["shards"]:
                data = np.load(
                    os.path.join(path, _ARRAYS, shard["file"])
                )
                sl = tuple(slice(a, b) for a, b in shard["index"])
                if arr.ndim == 0:
                    arr = data.reshape(())
                else:
                    arr[sl] = data
            leaves.append(arr)
        out[key] = jax.tree_util.tree_unflatten(tree_info["treedef"], leaves)
    return out


class AsyncCheckpointWriter:
    """One background writer: the device->host snapshot happens on the
    caller's thread, file IO on the worker. A new save waits for the
    previous write (single in-flight checkpoint, orbax-style)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

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

        def _run():
            try:
                _write_snapshot(paths[0], snapshot)
                for extra in paths[1:]:
                    if os.path.isdir(extra):
                        shutil.rmtree(extra)
                    elif os.path.lexists(extra):
                        os.remove(extra)
                    shutil.copytree(paths[0], extra)
                logger.info("async checkpoint written: %s", ", ".join(paths))
                if on_complete is not None:
                    on_complete()  # e.g. retention GC, after files exist
            except BaseException as e:  # surfaced at the next wait()
                self._error = e

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()
