"""Quant method registry + dispatch.

Reference: quantization/config.rs:15-64 QuantizationMethod enum +
detection.rs:16 auto-detection. A quantized linear is a QuantLinear
whose static `method` field routes to the registered apply fn (a fused
dequant-matmul kernel).
"""

from __future__ import annotations

from typing import Callable

import jax

from .types import QuantLinear

_METHODS: dict[str, Callable[[jax.Array, QuantLinear], jax.Array]] = {}


def register_quant_method(name: str):
    def deco(fn):
        _METHODS[name] = fn
        return fn

    return deco


def _ensure_loaded():
    import importlib

    for mod in ("awq", "gptq", "fp8", "int8", "gguf", "compressed_tensors"):
        try:
            importlib.import_module(f".{mod}", __package__)  # registers itself
        except ImportError:
            pass


def apply_quantized_linear(x: jax.Array, p: QuantLinear) -> jax.Array:
    if p.method not in _METHODS:
        _ensure_loaded()
    if p.method not in _METHODS:
        raise ValueError(f"unknown quant method {p.method}; have {sorted(_METHODS)}")
    return _METHODS[p.method](x, p)


def detect_quantization(hf_config: dict, model_dir: str | None = None) -> str | None:
    """Detect quant method from config.json quantization_config (reference
    loader.rs:308 is_quantized + quantization/detection.rs). Vendor
    formats (modelopt/quark/...) normalize in formats_extra.resolve_method."""
    from .formats_extra import resolve_method

    return resolve_method(hf_config)
