"""Test config: run all tests on a virtual 8-device CPU mesh.

This is the TPU-native substitute for multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths compile and execute against 8
host devices exactly as they would against 8 TPU chips.

Note: the axon sitecustomize force-registers the TPU backend ahead of the
JAX_PLATFORMS env var, so we override via jax.config *after* import (this wins
as long as it happens before the first backend use, which conftest guarantees).
"""

import os

# Escape hatch for TPU-gated kernel tests: LIDARNERF_TPU_TESTS=1 keeps the
# real backend so test_block_hash_tpu.py (kernel-vs-oracle on hardware) runs.
# The host-device-count flag must NOT be set in that mode — it hangs the
# remote-TPU (axon) backend's init.
_TPU_MODE = os.environ.get("LIDARNERF_TPU_TESTS", "") == "1"

if not _TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the suite's cost is dominated by XLA CPU
    # compiles of the same train/render programs on every run. Caching them
    # under the repo keeps repeat runs (the common case: every push) fast;
    # a cold run pays the usual compile time once.
    _cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
