"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding behavior (pjit over a Mesh) is validated without TPU
hardware, mirroring how the reference tests multi-rank behavior in-process
on CPU/Gloo (reference tests/test_bmuf.py).

NOTE: the environment exports JAX_PLATFORMS=axon (a tunneled real TPU), so
we must override — not setdefault — before jax initializes, and pin fp32
matmul precision so numerical-equivalence tests are not subject to bf16
MXU rounding.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache for the whole suite. The cache is keyed
# by the HLO fingerprint, so it has no semantic effect — but many tests
# compile IDENTICAL programs (resume tests re-run the same train step,
# equivalence tests train pairs of same-config models, multi-process spawn
# tests compile one program per process), and a cache hit is ~7x cheaper
# than the compile (measured: a 107s 8-device train CLI run replays in
# 15s). Set as an env var (not just jax.config) so the multihost spawn
# subprocesses inherit it. Repeat suite runs on a developer box get the
# full benefit; a fresh CI box still saves the in-run duplicates.
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache"),
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Suite time budgets (hard targets; measured round 3 on this 1-CPU box:
# full = 78 min with a COLD compilation cache / 420 tests; warm-cache
# repeat runs are several times faster — see the cache note above):
#   * `pytest -m quick`        <= 100 s  (~95 tests, broad smoke)
#   * `pytest -m "not slow"`   <= 60 min cold (everything but multi-minute runs)
#   * `pytest` (full)          <= 80 min cold (adds `slow`: 2-process
#     multihost spawns ~4 min, DP trajectory ~4 min, corpus parity ~1.5 min)
# Keep new tests inside these budgets: share trained fixtures across
# modules (tests/test_binaries.py::trained_dir pattern) instead of
# retraining, and mark anything over ~2 min `slow`.
#
# quick smoke subset: `pytest -m quick` gives a ~1 minute broad signal on
# this 1-CPU box. Modules chosen to touch every layer: data IO, metrics,
# generation, CTC decode, and one real preprocess->train->generate CLI pass.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

QUICK_MODULES = {
    "test_dictionary",
    "test_indexed_dataset",
    "test_metrics_meters",
    "test_ctc_beam_decoder",
    "test_ops",
    "test_sequence_generator",
    "test_cli_tools",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast smoke subset covering every layer"
    )
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (multi-process spawns, "
        "corpus-scale rehearsals)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__.rsplit(".", 1)[-1]
        if module in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
