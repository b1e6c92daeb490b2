"""Quant method registry + dispatch.

Reference: quantization/config.rs:15-64 QuantizationMethod enum +
detection.rs:16 auto-detection. A quantized linear's params dict carries
`{"quant": "<method>", ...payload...}`; `apply_quantized_linear` routes to
the registered kernel.
"""

from __future__ import annotations

from typing import Callable, Protocol

import jax


class QuantMethod(Protocol):
    name: str

    def apply(self, x: jax.Array, params: dict) -> jax.Array: ...


_METHODS: dict[str, Callable[[jax.Array, dict], jax.Array]] = {}


def register_quant_method(name: str):
    def deco(fn):
        _METHODS[name] = fn
        return fn

    return deco


def _ensure_loaded():
    if _METHODS:
        return
    import importlib

    for mod in ("awq", "gguf", "fp8", "int8", "gptq"):
        try:
            importlib.import_module(f".{mod}", __package__)  # registers itself
        except ImportError:
            pass


def apply_quantized_linear(x: jax.Array, params: dict, method: str) -> jax.Array:
    _ensure_loaded()
    if method not in _METHODS:
        raise ValueError(f"unknown quant method {method}; have {sorted(_METHODS)}")
    return _METHODS[method](x, params)


def detect_quantization(hf_config: dict, model_dir: str | None = None) -> str | None:
    """Detect quant method from config.json quantization_config (reference
    loader.rs:308 is_quantized + quantization/detection.rs)."""
    qc = hf_config.get("quantization_config")
    if qc:
        method = qc.get("quant_method", "").lower()
        if method in ("awq", "gptq", "fp8", "compressed-tensors", "bitsandbytes"):
            return method
    return None
