"""Tutorial components, importable as a --user-dir package
(docs/tutorial_simple_gru.md, docs/tutorial_classifying_names.md)."""

from . import classify_names  # noqa: F401
from . import simple_gru  # noqa: F401
