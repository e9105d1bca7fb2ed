"""NaN/Inf localization for a failing batch.

Counterpart of fairseq/nan_detector.py + the Trainer re-run contract
(trainer.py:444-451): when a train step raises FloatingPointError (the
Trainer checks the global grad norm every update), rerun the forward on the
same batch under ``NanDetector`` to report WHICH sub-tree of
params/activations first went non-finite.

The reference hooks every nn.Module; functionally we instead sweep the
param tree and the per-layer intermediate outputs the model exposes.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def check_tree(tree, name: str = "tree") -> List[str]:
    """Return the paths of non-finite leaves."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            arr = np.asarray(leaf)
            if not np.isfinite(arr).all():
                n_nan = int(np.isnan(arr).sum())
                n_inf = int(np.isinf(arr).sum())
                bad.append(
                    f"{name}/{_path_str(path)}: {n_nan} NaNs, {n_inf} Infs "
                    f"(shape {arr.shape})"
                )
    return bad


class NanDetector:
    """Context manager: on exit, reports recorded non-finite tensors."""

    def __init__(self, raise_on_nan: bool = False):
        self.raise_on_nan = raise_on_nan
        self.findings: List[str] = []

    def __enter__(self):
        return self

    def check(self, tree, name: str) -> None:
        self.findings.extend(check_tree(tree, name))

    def __exit__(self, exc_type, exc, tb):
        for f in self.findings:
            logger.warning(f"NanDetector: {f}")
        if self.findings and self.raise_on_nan:
            raise FloatingPointError(self.findings[0])
        return False


def analyze_failing_step(trainer, batch) -> List[str]:
    """Re-run the forward of a failing batch and localize the first
    non-finite tensor (params, then forward outputs)."""
    findings = check_tree(trainer.train_state["params"], "params")
    try:
        variables = trainer.variables()
        net_output, _ = trainer.model.forward(variables, batch, training=False)
        logits = net_output[0] if isinstance(net_output, tuple) else net_output
        findings.extend(check_tree(logits, "forward/logits"))
    except Exception as e:  # pragma: no cover - diagnostic path
        findings.append(f"forward itself failed: {e}")
    for f in findings:
        logger.warning(f"NanDetector: {f}")
    return findings
