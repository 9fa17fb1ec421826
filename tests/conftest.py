"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of "multi-node tests without a cluster":
sharding/pjit paths are exercised exactly as on a v5e-8 slice, just on host
CPU devices (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
