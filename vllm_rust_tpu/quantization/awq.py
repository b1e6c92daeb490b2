"""AWQ 4-bit weight-only quantization.

Reference: quantization/awq.rs (AwqLinear :400) + awq_gemv.cu. AWQ
checkpoints store, per linear (HF names relative to the layer):
  qweight: int32 [K, N/8]  — 8 int4 along N per int32, order [0,2,4,6,1,3,5,7]
  qzeros:  int32 [K/g, N/8] — same packing
  scales:  f16   [K/g, N]

At load we unpack once on host and repack to the TPU kernel layout
(K-half nibble packing, see ops/pallas/quant_matmul.py): the checkpoint
format never reaches the device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..layers import linear as linear_mod
from ..ops.pallas.quant_matmul import quant_matmul_w4a16
from .registry import register_quant_method
from .types import QuantLinear

# AWQ's interleaved nibble order within each int32
_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def unpack_awq_int32(packed: np.ndarray) -> np.ndarray:
    """[R, C/8] int32 -> [R, C] uint8 (values 0..15), AWQ nibble order."""
    r, c8 = packed.shape
    shifts = np.arange(8, dtype=np.uint32) * 4
    # nibble i of each int32 is column (8*j + _AWQ_ORDER[i])
    nibbles = (
        (packed[:, :, None].astype(np.uint32) >> shifts[None, None, :]) & 0xF
    ).astype(np.uint8)  # [R, C/8, 8] in packed order
    out = np.empty((r, c8, 8), np.uint8)
    out[:, :, _AWQ_ORDER] = nibbles
    return out.reshape(r, c8 * 8)


def repack_k_half(q: np.ndarray) -> np.ndarray:
    """[K, N] uint8 int4 values -> [K/2, N] uint8 K-half nibble packing."""
    k, n = q.shape
    assert k % 2 == 0
    half = k // 2
    return (q[:half] | (q[half:] << 4)).astype(np.uint8)


def make_w4a16_linear(
    q: np.ndarray,  # [K, N] uint8 int4 values
    s: np.ndarray,  # [K/g, N] f32 scales
    zs: np.ndarray,  # [K/g, N] f32 zero*scale
    bias: np.ndarray | None,
    method: str,
) -> QuantLinear:
    """Shared packer for all 4-bit grouped formats.

    Default image (r5): NATIVE s4 (ops/int4_group.py) — jnp.int4 weights
    feed the MXU dot through an in-pipeline s4->s8 widen at the HBM rate
    of the int4 bytes (2.15x the int8 image wall time, same numerics;
    benchmarks/int4_native_ab.py). Fallbacks:
      VLLM_TPU_W4_SERVE=int8 — r4's int8-group image (q - zero folded
        into s8 codes; ops/int8_group.py)
      VLLM_TPU_W4_KERNEL=1   — the Pallas w4a16 unpack kernel (VPU
        dequant; kept for geometries/ablations)
    """
    import os

    serve = os.environ.get("VLLM_TPU_W4_SERVE", "int4")
    if (
        serve == "int4"
        and os.environ.get("VLLM_TPU_W4_KERNEL", "0") != "1"
    ):
        from ..ops.int4_group import prepare_int4_group

        img4 = prepare_int4_group(
            q, s.astype(np.float32), zs.astype(np.float32)
        )
        if img4 is not None:
            aux = {
                "q4g": img4["q4g"],
                "sg": jnp.asarray(img4["sg"]),
                "zg4": jnp.asarray(img4["zg"]),
            }
            return QuantLinear(
                qweight=jnp.asarray(
                    np.zeros((1, 1), np.int8)
                ),  # placeholder; shape props come from aux
                scales=jnp.asarray(s.astype(jnp.bfloat16)),
                zs=jnp.asarray(zs.astype(jnp.bfloat16)),
                bias=jnp.asarray(bias) if bias is not None else None,
                aux=aux,
                method=method,
            )

    if os.environ.get("VLLM_TPU_W4_KERNEL", "0") != "1":
        from ..ops.int8_group import prepare_int8_group

        img = prepare_int8_group(q, s.astype(np.float32), zs.astype(np.float32))
        if img is not None:
            aux = {"q8g": jnp.asarray(img["q8g"]), "sg": jnp.asarray(img["sg"])}
            if "zg" in img:
                aux["zg"] = jnp.asarray(img["zg"])
            return QuantLinear(
                # keep the canonical packed image OFF device: a 1-byte
                # placeholder satisfies the pytree; in/out feature props
                # come from aux when q8g is present
                qweight=jnp.asarray(img["q8g"].reshape(-1, q.shape[1])[:1, :1]),
                scales=jnp.asarray(s.astype(jnp.bfloat16)),
                zs=jnp.asarray(zs.astype(jnp.bfloat16)),
                bias=jnp.asarray(bias) if bias is not None else None,
                aux=aux,
                method=method,
            )

    from ..ops.pallas.quant_matmul import prepare_tiled_scales

    kp = q.shape[0] // 2
    s_bf = s.astype(jnp.bfloat16)
    zs_bf = zs.astype(jnp.bfloat16)
    aux = {}
    tiled = prepare_tiled_scales(s_bf, zs_bf, kp)
    if tiled is not None:
        aux = {"s_tiled": jnp.asarray(tiled[0]), "zs_tiled": jnp.asarray(tiled[1])}
    return QuantLinear(
        qweight=jnp.asarray(repack_k_half(q)),
        scales=jnp.asarray(s_bf),
        zs=jnp.asarray(zs_bf),
        bias=jnp.asarray(bias) if bias is not None else None,
        aux=aux,
        method=method,
    )


def load_awq_linear(
    qweight: np.ndarray,  # int32 [K, N/8]
    qzeros: np.ndarray,  # int32 [K/g, N/8]
    scales: np.ndarray,  # f16 [K/g, N]
    bias: np.ndarray | None = None,
) -> QuantLinear:
    q = unpack_awq_int32(qweight)  # [K, N] 0..15
    z = unpack_awq_int32(qzeros)  # [K/g, N]
    s = scales.astype(np.float32)
    zs = z.astype(np.float32) * s
    return make_w4a16_linear(q, s, zs, bias, "awq")


@register_quant_method("awq")
def apply_awq(x, p: QuantLinear):
    t_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if "q4g" in p.aux:
        from ..ops.int4_group import int4_group_matmul

        out = int4_group_matmul(
            x2, p.aux["q4g"], p.aux["sg"], p.aux["zg4"]
        )
    elif "q8g" in p.aux:
        from ..ops.int8_group import int8_group_matmul

        out = int8_group_matmul(
            x2, p.aux["q8g"], p.aux["sg"], p.aux.get("zg")
        )
    else:
        out = quant_matmul_w4a16(
            x2,
            p.qweight,
            p.scales,
            p.zs,
            p.aux.get("s_tiled"),
            p.aux.get("zs_tiled"),
        )
    out = out.reshape(*t_shape, -1).astype(x.dtype)
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out
