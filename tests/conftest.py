"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Real-TPU execution is exercised by bench.py; unit tests run on the CPU
backend so sharding/collective code paths are testable without a pod
(SURVEY.md §4.7).  The axon sitecustomize pre-selects the TPU platform
via jax.config, so we override it back here before any backend
initialization.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Test shapes are stable across runs; persist compiled programs so a
# rerun only pays CPU-backend XLA compiles for programs that changed.
# Partitioned per machine fingerprint: foreign-machine AOT entries make
# cpu_aot_loader spew feature-mismatch errors (tpulc/utils/cachedir.py).
from tpulc.utils.cachedir import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir(os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap in-process XLA/LLVM state growth: after ~200 big CPU-backend
    compiles in one process the executable serializer aborts (observed
    as 'Fatal Python error: Aborted' in compilation_cache.put).  Module-
    scoped clearing keeps each module's jits shared while bounding the
    live-executable set; the persistent disk cache makes cross-module
    re-hits cheap."""
    yield
    jax.clear_caches()
