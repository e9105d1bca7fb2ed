"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding behavior (pjit over a Mesh) is validated without TPU
hardware, mirroring how the reference tests multi-rank behavior in-process
on CPU/Gloo (reference tests/test_bmuf.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
