"""Quantization stack.

Reference: crates/core/src/quantization/ (23 formats behind the
QuantizationConfig/QuantizedLinear traits, config.rs:110,147). Here each
format provides: a detection hook (from checkpoint config/files), a weight
transformer (raw checkpoint tensors -> packed device payload), and an
apply fn (fused dequant+matmul — Pallas kernels for the hot shapes).
"""

from .registry import (
    QuantMethod,
    apply_quantized_linear,
    detect_quantization,
    register_quant_method,
)

__all__ = [
    "QuantMethod",
    "apply_quantized_linear",
    "detect_quantization",
    "register_quant_method",
]
