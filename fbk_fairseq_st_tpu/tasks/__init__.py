"""Task registry package. Tasks are registered on import."""

from .base import Task  # noqa: F401
from . import speech_recognition, speech_translation_ctc  # noqa: F401
