"""Quantization stack.

Reference: crates/core/src/quantization/ (23 formats behind the
QuantizationConfig/QuantizedLinear traits, config.rs:110,147). Each
format provides: detection (from checkpoint config), a host-side weight
transformer (checkpoint packing -> TPU kernel layout), and an apply fn
(fused dequant+matmul Pallas kernel) registered by name.
"""

from .registry import (
    apply_quantized_linear,
    detect_quantization,
    register_quant_method,
)
from .types import QuantLinear

__all__ = [
    "QuantLinear",
    "apply_quantized_linear",
    "detect_quantization",
    "register_quant_method",
]
