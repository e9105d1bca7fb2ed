"""Debugger entry point (reference fairseq/pdb.py).

The reference serializes pdb stdin across distributed ranks; under SPMD
there is a single controller process, so this reduces to a stdin-redirecting
pdb that keeps working when stdio has been captured."""

from __future__ import annotations

import multiprocessing
import os
import pdb
import sys

__all__ = ["set_trace"]

_stdin = [None]
_stdin_lock = multiprocessing.Lock()
try:
    _stdin_fd = sys.stdin.fileno()
except Exception:
    _stdin_fd = None


class MultiprocessingPdb(pdb.Pdb):
    """A Pdb serialized across processes (one controller at a time)."""

    def interaction(self, *args, **kwargs):
        _stdin_lock.acquire()
        try:
            if _stdin_fd is not None:
                if not _stdin[0]:
                    _stdin[0] = os.fdopen(_stdin_fd)
                stdin = sys.stdin
                sys.stdin = _stdin[0]
            try:
                pdb.Pdb.interaction(self, *args, **kwargs)
            finally:
                if _stdin_fd is not None:
                    sys.stdin = stdin
        finally:
            _stdin_lock.release()


def set_trace():
    MultiprocessingPdb().set_trace(sys._getframe().f_back)
