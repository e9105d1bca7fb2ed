"""Criterion registry package."""

from .base import Criterion  # noqa: F401
from . import ctc, label_smoothed_cross_entropy  # noqa: F401
