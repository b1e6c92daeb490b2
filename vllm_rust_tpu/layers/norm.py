"""RMSNorm.

Reference: crates/core/src/layers/normalization.rs:33 (RmsNorm) and the
fused CUDA kernels layernorm.cu / qknorm_rope.cu. On TPU no custom kernel
is needed: XLA fuses the reduction + scale into adjacent ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    *,
    weight_offset: float = 0.0,
) -> jax.Array:
    """y = x / rms(x) * (weight + offset).

    ``weight_offset=1.0`` covers Gemma-style (1+w) scaling. Statistics in
    float32 regardless of input dtype (matches reference numerics).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32) + weight_offset
    return (y * w).astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-5,
    *,
    weight_offset: float = 0.0,
) -> jax.Array:
    """Classic LayerNorm (mean-centered) with optional affine.

    ``weight_offset=1.0`` covers Nemotron's LayerNorm1p ((1+w) scaling).
    Reference: the LayerNorm branches of layers/normalization.rs.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * (weight.astype(jnp.float32) + weight_offset)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
