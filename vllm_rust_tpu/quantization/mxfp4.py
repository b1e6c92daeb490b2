"""MXFP4 (OCP microscaling FP4) dequantization — the GPT-OSS MoE format.

Reference: quantization/mxfp4.rs + mxfp4_gemm.cu. Format: values are
FP4-E2M1 codes (two per byte, low nibble first) in 32-element blocks,
each block scaled by an E8M0 exponent byte (2^(b-127)).

Checkpoint layout (HF gpt-oss MXFP4):
  {p}_blocks  uint8 [..., rows, K/32, 16]
  {p}_scales  uint8 [..., rows, K/32]

TPU note: every FP4 value times 2 is an integer in [-12, 12], so MXFP4
maps EXACTLY onto the int8+group-scale representation (scale' = 2^(b-128))
and can run through the fused w8a16 kernel; the load-time bf16 dequant
below is the general-correctness path.
"""

from __future__ import annotations

import numpy as np

# FP4-E2M1 value table: sign bit 3; codes 0..7 = 0, .5, 1, 1.5, 2, 3, 4, 6
FP4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    np.float32,
)


def dequant_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """blocks uint8 [..., G, 16] + scales uint8 [..., G] -> f32 [..., G*32].

    Nibble order: low nibble is element 2j, high nibble 2j+1 (interleaved,
    matching the HF unpack)."""
    blocks = np.asarray(blocks, np.uint8)
    scales = np.asarray(scales, np.uint8)
    lo = FP4_VALUES[blocks & 0xF]
    hi = FP4_VALUES[blocks >> 4]
    vals = np.stack([lo, hi], axis=-1).reshape(*blocks.shape[:-1], 32)
    exp = np.ldexp(
        np.float32(1.0), scales.astype(np.int32) - 127
    )  # E8M0: 2^(b-127)
    out = vals * exp[..., None]
    return out.reshape(*blocks.shape[:-2], blocks.shape[-2] * 32)


def mxfp4_to_int8_grouped(
    blocks: np.ndarray, scales: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact int8 repack: q = 2*fp4 (ints in [-12, 12]),
    scale' = 2^(b-128). Returns (q int8 [..., G*32], s f32 [..., G])."""
    blocks = np.asarray(blocks, np.uint8)
    doubled = (FP4_VALUES * 2).astype(np.int8)
    lo = doubled[blocks & 0xF]
    hi = doubled[blocks >> 4]
    q = np.stack([lo, hi], axis=-1).reshape(
        *blocks.shape[:-2], blocks.shape[-2] * 32
    )
    s = np.ldexp(np.float32(1.0), scales.astype(np.int32) - 128)
    return q, s
