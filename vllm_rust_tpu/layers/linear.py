"""Linear application protocol.

Dense params are a dict {"weight": [in, out] (pre-transposed at load from
HF's [out, in]), "bias": [out] (optional)}. Quantized linears are
QuantLinear pytree dataclasses dispatched through the quant registry —
the same split as the reference's QuantizedLinear trait
(crates/core/src/quantization/config.rs:147).
"""

from __future__ import annotations

import jax

from ..quantization.types import QuantLinear


def linear(x: jax.Array, params) -> jax.Array:
    """x: [..., in] @ weight [in, out] (+ bias)."""
    if isinstance(params, QuantLinear):
        from ..quantization.registry import apply_quantized_linear

        return apply_quantized_linear(x, params)
    out = x @ params["weight"]
    b = params.get("bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
