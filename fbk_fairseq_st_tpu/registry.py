"""String -> component registries with argparse integration.

Mirrors the reference's registry-driven dependency injection
(fairseq/registry.py:12-62 and fairseq/models/__init__.py:26-98): every
component family (task, model, criterion, optimizer, lr scheduler, tokenizer,
bpe) is a name -> class mapping; classes contribute CLI flags through a
``add_args(parser)`` classmethod; model *architectures* are named preset
functions that back-fill defaults onto the parsed args namespace
(reference @register_model_architecture, fairseq/models/__init__.py:124-159).

Only the CLI edge of the framework touches these argparse namespaces; the
functional JAX core consumes frozen dataclass configs derived from them.
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Dict, Optional


class Registry:
    """A named registry of components.

    Each entry is a class (or factory). Classes may define
    ``add_args(parser)`` to contribute CLI flags and ``build_<kind>`` hooks.
    """

    def __init__(self, kind: str, default: Optional[str] = None):
        self.kind = kind
        self.default = default
        self._entries: Dict[str, Any] = {}

    def register(self, name: str) -> Callable[[Any], Any]:
        def wrapper(cls):
            if name in self._entries:
                raise ValueError(
                    f"Cannot register duplicate {self.kind} ({name})"
                )
            self._entries[name] = cls
            cls.registered_name = name
            return cls

        return wrapper

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __getitem__(self, name: str) -> Any:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind}: {name!r}. "
                f"Available: {sorted(self._entries)}"
            )
        return self._entries[name]

    def get(self, name: str, default=None):
        return self._entries.get(name, default)

    def keys(self):
        return self._entries.keys()

    def items(self):
        return self._entries.items()

    def add_args(self, name: str, parser: argparse.ArgumentParser) -> None:
        cls = self[name]
        if hasattr(cls, "add_args"):
            cls.add_args(parser)


# The global registries (reference: fairseq/registry.py REGISTRIES plus the
# special-cased model/arch registries in fairseq/models/__init__.py).
TASKS = Registry("task")
MODELS = Registry("model")
CRITERIONS = Registry("criterion", default="cross_entropy")
OPTIMIZERS = Registry("optimizer", default="adam")
LR_SCHEDULERS = Registry("lr_scheduler", default="fixed")
TOKENIZERS = Registry("tokenizer")
BPES = Registry("bpe")

# arch name -> (model name, preset_fn mutating args)
ARCHITECTURES: Dict[str, Any] = {}
# model name -> list of arch names (for CLI help)
ARCH_MODEL_INV: Dict[str, list] = {}


def register_task(name: str):
    return TASKS.register(name)


def register_model(name: str):
    return MODELS.register(name)


def register_criterion(name: str):
    return CRITERIONS.register(name)


def register_optimizer(name: str):
    return OPTIMIZERS.register(name)


def register_lr_scheduler(name: str):
    return LR_SCHEDULERS.register(name)


def register_model_architecture(model_name: str, arch_name: str):
    """Register an architecture preset for *model_name*.

    The decorated function mutates an args namespace, filling in defaults —
    identical contract to the reference (fairseq/models/__init__.py:124-159)
    so checkpointed args reconstruct identically.
    """

    def wrapper(fn):
        if model_name not in MODELS:
            raise ValueError(
                f"Cannot register architecture {arch_name} for unknown model "
                f"{model_name}"
            )
        if arch_name in ARCHITECTURES:
            raise ValueError(f"Cannot register duplicate architecture {arch_name}")
        ARCHITECTURES[arch_name] = (model_name, fn)
        ARCH_MODEL_INV.setdefault(model_name, []).append(arch_name)
        return fn

    return wrapper


def apply_architecture(args: argparse.Namespace) -> None:
    """Back-fill arch defaults onto *args* (two-pass parse, step 2)."""
    arch = getattr(args, "arch", None)
    if arch is None:
        return
    if arch not in ARCHITECTURES:
        if arch in MODELS:  # bare model name: defaults applied in build_model
            return
        raise KeyError(
            f"Unknown architecture: {arch!r}. Available: {sorted(ARCHITECTURES)}"
        )
    _, preset = ARCHITECTURES[arch]
    preset(args)


def build_model(args: argparse.Namespace, task):
    """Build a model from parsed args (reference models/__init__.py:47-56)."""
    arch = getattr(args, "arch", None)
    if arch in ARCHITECTURES:
        model_name, _ = ARCHITECTURES[arch]
    elif arch in MODELS:
        model_name = arch
    else:
        raise KeyError(f"--arch {arch!r} is not a registered architecture")
    return MODELS[model_name].build_model(args, task)
