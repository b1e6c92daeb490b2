"""GPTQ 4-bit weight-only quantization.

Reference: quantization/gptq.rs + gptq_dequant.cu + marlin_gemm.cu.
Checkpoint layout (AutoGPTQ):
  qweight: int32 [K/8, N] — 8 int4 along K per int32, sequential order
  qzeros:  int32 [K/g, N/8] — packed along N, sequential order; stored
           value is zero-1 (the historic AutoGPTQ +1 quirk)
  scales:  f16 [K/g, N]
  g_idx:   int32 [K] — activation-order permutation (desc_act)

Shares the w4a16 fused kernel with AWQ after host-side repacking.
desc_act (non-trivial g_idx) reorders K at load: we permute both the
weight rows and the kernel's x gather — implemented by permuting rows
into group-sorted order and remembering nothing (x must be permuted the
same way), so for now only trivial/sorted g_idx is accepted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .awq import repack_k_half  # noqa: F401 (kept for API)
from .registry import register_quant_method
from .types import QuantLinear


def unpack_gptq_rows(packed: np.ndarray) -> np.ndarray:
    """[K/8, N] int32 -> [K, N] uint8 (sequential nibble order along K)."""
    k8, n = packed.shape
    shifts = np.arange(8, dtype=np.uint32) * 4
    nib = (
        (packed[:, None, :].astype(np.uint32) >> shifts[None, :, None]) & 0xF
    ).astype(np.uint8)  # [K/8, 8, N]
    return nib.reshape(k8 * 8, n)


def unpack_gptq_cols(packed: np.ndarray) -> np.ndarray:
    """[R, N/8] int32 -> [R, N] uint8 (sequential nibble order along N)."""
    r, n8 = packed.shape
    shifts = np.arange(8, dtype=np.uint32) * 4
    nib = (
        (packed[:, :, None].astype(np.uint32) >> shifts[None, None, :]) & 0xF
    ).astype(np.uint8)  # [R, N/8, 8]
    return nib.reshape(r, n8 * 8)


def load_gptq_linear(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray | None = None,
    bias: np.ndarray | None = None,
) -> QuantLinear:
    q = unpack_gptq_rows(qweight)  # [K, N]
    k = q.shape[0]
    n_groups = scales.shape[0]
    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx)
        expected = np.repeat(np.arange(n_groups), k // n_groups)
        if not np.array_equal(g_idx, expected):
            # desc_act (activation-order): permute K rows into group-sorted
            # order; the apply path gathers x columns the same way. After
            # the stable sort every group is contiguous with k/g rows.
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
    z = unpack_gptq_cols(qzeros).astype(np.float32) + 1.0  # AutoGPTQ quirk
    s = scales.astype(np.float32)
    from .awq import make_w4a16_linear

    ql = make_w4a16_linear(q, s, z * s, bias, "gptq")
    if perm is not None:
        import jax.numpy as jnp

        ql.aux = dict(ql.aux, perm=jnp.asarray(perm))
    return ql


@register_quant_method("gptq")
def apply_gptq(x, p: QuantLinear):
    from .awq import apply_awq

    if "perm" in p.aux:  # desc_act: activation columns follow the K sort
        x = x[..., p.aux["perm"]]
    return apply_awq(x, p)  # identical packed layout and math
