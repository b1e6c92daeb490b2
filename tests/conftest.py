"""Test harness: force CPU with an 8-device virtual mesh.

Mirrors the reference's MockCommunicator strategy (SURVEY.md §4: every
distributed path unit-testable single-process) — on JAX this is simply a
virtual CPU mesh via xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU is attached
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin for every process; tests
# must run on the virtual CPU mesh, so override at config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
