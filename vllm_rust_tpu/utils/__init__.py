"""Small shared utilities.

TPU-native rebuild of vllm-rust (reference: /root/reference). This module has
no reference counterpart; it collects helpers used across the engine.
"""

from __future__ import annotations

import bisect
import functools
import os
from typing import Sequence


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the nearest multiple of ``m``."""
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def pick_bucket(x: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= x; buckets must be sorted ascending.

    Raises ValueError when x exceeds the largest bucket — callers are expected
    to cap work (scheduler token budget) below the top bucket.
    """
    i = bisect.bisect_left(buckets, x)
    if i == len(buckets):
        raise ValueError(f"value {x} exceeds largest bucket {buckets[-1]}")
    return buckets[i]


@functools.cache
def jax_platform() -> str:
    import jax

    return jax.default_backend()


def on_tpu() -> bool:
    # The 'axon' platform is a tunneled TPU chip; treat it as TPU.
    return jax_platform() in ("tpu", "axon")


def interpret_kernels() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    On CPU (tests, virtual meshes) Pallas TPU kernels must be interpreted.
    Can be forced with VLLM_TPU_INTERPRET=1.
    """
    if os.environ.get("VLLM_TPU_INTERPRET") == "1":
        return True
    return not on_tpu()
