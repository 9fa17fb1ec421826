"""Test configuration: virtual 8-device CPU mesh + persistent compile cache.

The 8 virtual CPU devices are the TPU-world equivalent of "multi-node tests
without a cluster": sharding/pjit paths are exercised exactly as on a v5e-8
slice (SURVEY.md §4).

This machine has a single host core, so XLA compiles are expensive; the
persistent compilation cache makes repeated test runs cheap.
"""

import os

# The image pins JAX_PLATFORMS=axon (remote TPU) for every process via
# sitecustomize; tests must run on the local CPU backend, so override the
# platform through jax.config (which wins as long as no device has been
# touched yet) rather than env setdefault.
# AGENDA_TPU_TESTS=1 keeps the real TPU backend instead, for the @tpu-marked
# strict-tolerance tests: AGENDA_TPU_TESTS=1 pytest -m tpu tests/
_ON_TPU = os.environ.get("AGENDA_TPU_TESTS") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if not _ON_TPU:
    assert jax.default_backend() == "cpu", jax.default_backend()
