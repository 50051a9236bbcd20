"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding is tested on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), per SURVEY.md §4's strategy
for testing distribution without a pod.

Note: this environment pre-imports jax and registers a remote TPU backend via
sitecustomize, so ``JAX_PLATFORMS`` env vars are already consumed — the
platform must be overridden through ``jax.config`` before any backend is
initialized (XLA_FLAGS is still read lazily at CPU-client creation).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# allow float64 decoder configs in tests for tight oracle comparison
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
