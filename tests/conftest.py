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
