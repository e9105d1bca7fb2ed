"""--user-dir dynamic import of out-of-tree components (reference
fairseq/utils.py:344-358) — how application layers register their own
tasks/models/criterions without forking the framework."""

from __future__ import annotations

import importlib
import os
import sys


def import_user_module(args) -> None:
    module_path = getattr(args, "user_dir", None)
    if module_path is None:
        return
    module_path = os.path.abspath(module_path)
    if not os.path.exists(module_path):
        raise FileNotFoundError(module_path)
    module_parent, module_name = os.path.split(module_path)
    if module_name not in sys.modules:
        sys.path.insert(0, module_parent)
        importlib.import_module(module_name)
