"""Native (C++) runtime components, built on demand and loaded via ctypes.

Counterpart of the reference's clib/ (libbleu, libnat); the TPU compute path
never goes through here — these serve host-side scoring and target-prep, with
pure-Python/NumPy fallbacks when no compiler is available.
"""

from .build import load_library  # noqa: F401
