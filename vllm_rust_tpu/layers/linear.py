"""Linear application protocol.

Params for a linear are a dict: {"weight": [in, out] (pre-transposed at
load time from HF's [out, in]), "bias": [out] (optional)}. Quantized
formats store their own payloads and register an apply fn via
quantization/registry.py — the same split as the reference's
QuantizedLinear trait (crates/core/src/quantization/config.rs:147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(x: jax.Array, params: dict) -> jax.Array:
    """x: [..., in] @ weight [in, out] (+ bias).

    Dense path: a plain MXU matmul in the params' dtype. Quantized params
    (marked with a "quant" key) are dispatched to the format's kernel.
    """
    quant = params.get("quant")
    if quant is not None:
        from ..quantization.registry import apply_quantized_linear

        return apply_quantized_linear(x, params, quant)
    out = x @ params["weight"]
    b = params.get("bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
