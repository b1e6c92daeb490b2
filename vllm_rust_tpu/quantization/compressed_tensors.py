"""compressed-tensors checkpoints (llm-compressor / vLLM ecosystem).

Reference: quantization/compressed_tensors.rs. Supported schemes:
  - pack-quantized, 4-bit symmetric group/channel (W4A16): weight_packed
    int32 [out, in/8] (8 nibbles per word, low nibble first) +
    weight_scale [out, in/g] -> the fused w4a16 kernel. Signed q in
    [-8, 7] stored biased: unsigned nibble u = q + 8, so
    w = u*s - 8s (zs = 8*scale) maps EXACTLY onto the kernel layout.
  - int-quantized, 8-bit symmetric (W8A16 weights-only): weight int8
    [out, in] + weight_scale [out] or [out, in/g] -> the fused w8a16
    kernel (per-channel scales broadcast to per-16 groups).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .registry import register_quant_method
from .types import QuantLinear


@register_quant_method("compressed_tensors_w4")
def apply_ct_w4(x, p: QuantLinear):
    from .awq import apply_awq

    return apply_awq(x, p)


@register_quant_method("int8_col")
def apply_int8_col(x, p: QuantLinear):
    """Per-column symmetric int8 (used for the lm_head: halves the
    biggest dense read of a decode step; ops/int8_group.py)."""
    from ..ops.int8_group import lm_head_int8_matmul

    t_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = lm_head_int8_matmul(x2, p.qweight, p.scales)
    out = out.reshape(*t_shape, -1)
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out


def quantize_lm_head(params: dict) -> dict:
    """Post-load transform: replace a dense params["lm_head"]["weight"]
    with an int8_col QuantLinear. No-op for tied embeddings (no lm_head
    entry) or already-quantized heads."""
    import jax.numpy as jnp

    from ..ops.int8_group import quantize_lm_head_int8

    head = params.get("lm_head")
    if not isinstance(head, dict) or "weight" not in head:
        return params
    q8, scale = quantize_lm_head_int8(np.asarray(head["weight"]))
    params["lm_head"] = QuantLinear(
        qweight=jnp.asarray(q8),
        scales=jnp.asarray(scale),
        bias=head.get("bias"),
        method="int8_col",
    )
    return params


def unpack_int32_nibbles(packed: np.ndarray) -> np.ndarray:
    """int32 [R, C/8] -> uint8 [R, C], low nibble first."""
    p = np.asarray(packed).astype(np.uint32)
    cols = []
    for i in range(8):
        cols.append(((p >> (4 * i)) & 0xF).astype(np.uint8))
    return np.stack(cols, axis=-1).reshape(p.shape[0], -1)


def load_ct_packed_linear(
    weight_packed: np.ndarray,  # int32 [out, in/8]
    weight_scale: np.ndarray,  # [out, in/g] or [out, 1]
    weight_zero_point: np.ndarray | None,
    bias: np.ndarray | None,
) -> QuantLinear:
    from .awq import make_w4a16_linear

    u = unpack_int32_nibbles(weight_packed)  # [out, in] biased nibbles
    n_out, n_in = u.shape
    s_raw = np.asarray(weight_scale, np.float32)
    if s_raw.ndim == 1:
        s_raw = s_raw[:, None]
    groups = s_raw.shape[1]
    g = n_in // groups
    # K-major layouts for the kernel
    q = np.ascontiguousarray(u.T)  # [K, N]
    s = np.ascontiguousarray(s_raw.T)  # [K/g, N]
    if weight_zero_point is not None:
        zp = np.asarray(weight_zero_point, np.float32)
        if zp.ndim == 1:
            zp = zp[:, None]
        z = np.ascontiguousarray(zp.T) + 8.0
    else:
        z = np.full_like(s, 8.0)  # symmetric: stored nibble = q + 8
    return make_w4a16_linear(q, s, z * s, bias, "compressed_tensors_w4")


def load_ct_int8_linear(
    weight: np.ndarray,  # int8 [out, in]
    weight_scale: np.ndarray,  # [out] | [out, 1] | [out, in/g]
    bias: np.ndarray | None,
) -> QuantLinear:
    from ..ops.pallas.int8_matmul import prepare_tiled_scales_w8

    w = np.asarray(weight, np.int8)
    n_out, n_in = w.shape
    s_raw = np.asarray(weight_scale, np.float32).reshape(n_out, -1)
    if s_raw.shape[1] == 1:
        # per-channel -> broadcast to per-16 K-groups (exact)
        s = np.broadcast_to(s_raw.T, (n_in // 16, n_out)).copy()
    else:
        g = n_in // s_raw.shape[1]
        reps = max(1, g // 16)
        s = np.repeat(s_raw.T, reps, axis=0)
    qt = np.ascontiguousarray(w.T)
    aux = {}
    tiled = prepare_tiled_scales_w8(s, None, n_in)
    if tiled is not None:
        aux = {
            "s_tiled": jnp.asarray(tiled[0]),
            "zs_tiled": jnp.asarray(tiled[1]),
        }
    return QuantLinear(
        qweight=jnp.asarray(qt),
        scales=jnp.asarray(s),
        zs=None,
        bias=jnp.asarray(bias) if bias is not None else None,
        aux=aux,
        method="gguf_i8",  # same fused w8a16 apply path
    )
