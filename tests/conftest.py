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
# NOTE on CPU matmul precision: the backend's DEFAULT-precision dot takes
# the avx512-bf16 oneDNN fast path on this host (~4e-4 relative error).
# Parity-anchor tests that need true f32 matmuls opt in per-module with
# the `f32_matmuls` fixture below — globally forcing "highest" blows the
# fast tier's time budget (measured r4).

# Persistent compilation cache: most of the suite's wall time is XLA CPU
# compiles; repeat runs (the common case for the CI driver) hit the
# cache and the fast tier drops under the time budget (VERDICT r2 #9).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: breadth/integration tests (skip with -m 'not slow')"
    )


_SLOW_FILES = (
    "breadth", "vlm_breadth", "audio_lmm", "encoder_breadth",
    "moe_breadth", "gemma3n", "gemma4", "qwen3_next", "minimax_kimi",
    "hybrid_ssm", "misc_archs", "nemotron_parse",
    # r3 re-tier (VERDICT r2 #9): heavy engine-integration modules move
    # to the slow tier so `pytest -m "not slow"` fits the driver budget
    # (<8 min warm; the persistent compile cache above covers repeats)
    "test_ssm", "spec_decode", "spec_grammar", "spec_extra",
    "ragged_attention", "deepseek", "whisper", "hf_parity",
    "multihost_2proc", "mrope",
)


def pytest_collection_modifyitems(config, items):
    """Split fast/slow (reference SURVEY §4 test classification).

    Tiers:
      fast:  pytest -m "not slow"        (~6-8 min warm-cache)
      slow:  pytest -m slow              (breadth + heavy integration)
      full:  pytest tests/               (everything)
    """
    for item in items:
        fname = item.fspath.basename
        if any(s in fname for s in _SLOW_FILES):
            item.add_marker(pytest.mark.slow)


import pytest  # noqa: E402


@pytest.fixture
def f32_matmuls():
    """True-f32 matmuls for greedy-exact HF parity anchors (the CPU
    default-precision dot uses the avx512-bf16 fast path, ~4e-4 error)."""
    with jax.default_matmul_precision("highest"):
        yield
