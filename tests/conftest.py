"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment preloads an `axon` TPU PJRT plugin via sitecustomize and
pins ``jax_platforms``; override it through jax.config BEFORE any backend
initialization so tests run on a fast local 8-device CPU mesh
(SURVEY.md §4: distributed tests without a cluster).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
