"""TPU-native serving export: ahead-of-time compiled decode artifacts.

The TPU answer to the reference's TorchScript/ONNX serving exports
(fairseq/models/fairseq_model.py make_generation_fast_ /
examples' onnx export paths): ``export.export_artifact`` lowers the
entire jitted beam-search program (encoder + cached decoder + search) to
StableHLO with ``jax.export`` for a set of static shape buckets, and
``runtime.ServingModel`` replays it with no model code, no registry, no
checkpoint args — the artifact directory is self-contained (programs +
weights + dictionaries + metadata).
"""

from .export import export_artifact  # noqa: F401
from .runtime import ServingModel  # noqa: F401
