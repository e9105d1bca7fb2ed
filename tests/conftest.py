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
