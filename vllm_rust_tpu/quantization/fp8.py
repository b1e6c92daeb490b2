"""FP8 weight quantization (w8a16).

Reference: quantization/fp8.rs (Fp8Linear :205) + fp8_gemm.cu /
fp8_quant.cu. TPU design: fp8_e4m3 is a native dtype — weights stay in
fp8 HBM (half the bf16 footprint) and upcast-fused into the matmul by
XLA; no custom kernel needed for the w8a16 path. Scale granularities:
per-tensor [1,1], per-output-channel [1,N], or block-wise [K/bs, N/bs]
(DeepSeek-style 128x128 blocks, weight_scale_inv).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .registry import register_quant_method
from .types import QuantLinear


def load_fp8_linear(
    weight: np.ndarray,  # [N, K] fp8 (torch layout)
    weight_scale: np.ndarray | None = None,
    weight_scale_inv: np.ndarray | None = None,
    bias: np.ndarray | None = None,
) -> QuantLinear:
    scale = weight_scale if weight_scale is not None else weight_scale_inv
    if scale is None:
        scale = np.ones((), np.float32)
    scale = np.asarray(scale, np.float32)
    w = np.asarray(weight)
    if w.dtype != np.uint8 and w.dtype.name not in ("float8_e4m3fn", "float8_e4m3"):
        raise ValueError(f"fp8 weight has dtype {w.dtype}")
    qt = jnp.asarray(w.view(np.uint8).T).view(jnp.float8_e4m3fn)  # [K, N]
    if scale.ndim == 0:
        s = jnp.full((1, 1), float(scale), jnp.float32)
    elif scale.ndim == 1:  # per-output-channel [N]
        s = jnp.asarray(scale)[None, :]
    else:  # block-wise [N/bs, K/bs] (torch layout) -> [K/bs, N/bs]
        s = jnp.asarray(scale.T)
    return QuantLinear(
        qweight=qt,
        scales=s,
        zs=None,
        bias=jnp.asarray(bias, jnp.bfloat16) if bias is not None else None,
        method="fp8",
    )


@register_quant_method("fp8")
def apply_fp8(x, p: QuantLinear):
    k, n = p.qweight.shape
    w = p.qweight.astype(jnp.float32)
    sk, sn = p.scales.shape
    if (sk, sn) == (1, 1) or sk == 1:
        w = w * p.scales  # per-tensor / per-channel broadcast
    else:  # block-wise
        bk, bn = k // sk, n // sn
        w = (
            w.reshape(sk, bk, sn, bn) * p.scales[:, None, :, None]
        ).reshape(k, n)
    y = x.astype(jnp.float32) @ w
    y = y.astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y
