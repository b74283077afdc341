"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's lack of a test cluster (`SURVEY.md` section 4): the
TPU-native analog of "test multi-node without a cluster" is an 8-way
host-platform device count, letting `jax.sharding` tests exercise real
collective lowering without TPU hardware.
"""

import os

os.environ.pop("JAX_PLATFORMS", None)  # sandbox pins this to the TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
