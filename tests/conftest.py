"""Test configuration: force a virtual 8-device CPU platform so sharding /
pjit tests run without TPU hardware (mirrors the reference's absence of
multi-GPU CI by doing better: single-host multi-device tests via XLA CPU).
"""

import os

# Tests run on a virtual 8-device CPU mesh for determinism and f32 numerics.
# The session's sitecustomize imports jax at interpreter startup (before this
# file runs), so env vars alone are too late — use jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
