"""On-demand compilation + ctypes loading of the native components.

`load_library('libbleu')` compiles fbk_fairseq_st_tpu/native/libbleu.cpp to a
shared object under native/_build/ (once, cached by mtime) and returns the
ctypes CDLL — or None when no toolchain is available, in which case callers
fall back to their pure-Python twins.
"""

from __future__ import annotations

import ctypes
import logging
import os
import shutil
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_CACHE: dict = {}


def _compiler() -> Optional[str]:
    for cc in ("c++", "g++", "clang++"):
        if shutil.which(cc):
            return cc
    return None


def load_library(name: str) -> Optional[ctypes.CDLL]:
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_HERE, f"{name}.cpp")
        out = os.path.join(_BUILD_DIR, f"{name}.so")
        lib = None
        try:
            if os.path.exists(src):
                if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
                    cc = _compiler()
                    if cc is None:
                        raise RuntimeError("no C++ compiler found")
                    os.makedirs(_BUILD_DIR, exist_ok=True)
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", "-std=c++14", src, "-o", out],
                        check=True,
                        capture_output=True,
                    )
                lib = ctypes.CDLL(out)
        except Exception as e:  # fall back to the Python twin
            logger.debug(f"native {name} unavailable ({e}); using Python fallback")
            lib = None
        _CACHE[name] = lib
        return lib
