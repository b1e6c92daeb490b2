"""Quantized-linear parameter containers.

Reference: quantization/config.rs:147 QuantizedLinear trait objects. Here
a quantized linear's parameters are a pytree dataclass whose `method`
field is static metadata (so jit can dispatch on it without tracing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("qweight", "scales", "zs", "bias", "aux"),
    meta_fields=("method",),
)
@dataclass
class QuantLinear:
    """Packed quantized linear weights.

    Layout contract for 4-bit methods (awq/gptq after repack):
      qweight: uint8 [K/2, N] — low nibble = w[k], high nibble = w[k + K/2]
               (K-half packing: unpack yields two lane-aligned tiles, no
               lane interleave needed in the kernel)
      scales:  [K/g, N] bf16 — per-group scale
      zs:      [K/g, N] bf16 — per-group zero*scale (w = q*s - zs)
    For int8/fp8 methods qweight is [K, N] in the storage dtype and zs may
    be None. `aux` carries any per-format extras.
    """

    qweight: jax.Array
    scales: jax.Array
    zs: jax.Array | None = None
    bias: jax.Array | None = None
    aux: dict = field(default_factory=dict)
    method: str = "awq"

    @property
    def in_features(self) -> int:
        for key in ("q8g", "q4g"):  # int8/int4 group images (ops/)
            if key in self.aux:
                g, gs, _ = self.aux[key].shape
                return g * gs
        if self.method in ("awq", "gptq"):
            return 2 * self.qweight.shape[0]
        return self.qweight.shape[0]

    @property
    def out_features(self) -> int:
        for key in ("q8g", "q4g"):
            if key in self.aux:
                return self.aux[key].shape[2]
        return self.qweight.shape[1]

    @property
    def group_size(self) -> int:
        return self.in_features // self.scales.shape[0]
