"""Optimizer / LR-scheduler registry package."""

from . import lr_schedulers, optimizers  # noqa: F401
from .lr_schedulers import LRScheduler  # noqa: F401
from .optimizers import Optimizer  # noqa: F401
