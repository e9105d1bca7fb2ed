"""fbk_fairseq_st_tpu — a TPU-native speech-translation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
mgaido91/FBK-fairseq-ST (direct speech-to-text translation and ASR):
registry-driven tasks/models/criterions, fixed-shape bucketed data
pipelines over fairseq-compatible binary datasets, a single pjit-sharded
train step, and jitted while-loop beam search.
"""

__version__ = "0.1.0"

from . import registry  # noqa: F401


def _register_all():
    """Import all component modules so their registry decorators run."""
    from . import benchmark, criterions, models, optim, tasks  # noqa: F401


_register_all()
