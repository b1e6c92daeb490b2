"""Linear application protocol.

Dense params are a dict {"weight": [in, out] (pre-transposed at load from
HF's [out, in]), "bias": [out] (optional)}. Quantized linears are
QuantLinear pytree dataclasses dispatched through the quant registry —
the same split as the reference's QuantizedLinear trait
(crates/core/src/quantization/config.rs:147).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

from ..quantization.types import QuantLinear

# Ambient per-token LoRA slot indices ([T] i32, -1 = no adapter), set by the
# jitted step around the model call (trace-time context; the value is a
# tracer during jit). Reference: per-request LoraContext threaded through
# model forwards (lora/linear.rs) — the context variable avoids changing
# every layer signature.
_LORA_IDX: contextvars.ContextVar = contextvars.ContextVar("lora_idx", default=None)


@contextlib.contextmanager
def lora_context(idx):
    tok = _LORA_IDX.set(idx)
    try:
        yield
    finally:
        _LORA_IDX.reset(tok)


def _apply_lora(x: jax.Array, out: jax.Array, lora: dict) -> jax.Array:
    """out += scale_a * (x @ A_a) @ B_a for each token's adapter slot.

    Masked loop over the (static, small) adapter slots — the TPU analogue
    of the reference's per-adapter sub-batch split (helpers.rs:1098
    mixed-LoRA decode batches)."""
    idx = _LORA_IDX.get()
    if idx is None:
        return out
    a_stack, b_stack, scale = lora["A"], lora["B"], lora["scale"]
    n_slots = a_stack.shape[0]
    acc = out.astype(jnp.float32)
    for a in range(n_slots):
        mask = (idx == a).astype(x.dtype)[:, None]
        delta = ((x * mask) @ a_stack[a]) @ b_stack[a]
        acc = acc + delta.astype(jnp.float32) * scale[a]
    return acc.astype(out.dtype)


def linear(x: jax.Array, params) -> jax.Array:
    """x: [..., in] @ weight [in, out] (+ bias)."""
    if isinstance(params, QuantLinear):
        from ..quantization.registry import apply_quantized_linear

        out = apply_quantized_linear(x, params)
        return out
    out = x @ params["weight"]
    lora = params.get("lora")
    if lora is not None:
        out = _apply_lora(x, out, lora)
    b = params.get("bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
