"""Grouped-int8 weight matmul on native MXU s8 dots (the TPU w4/w8 path).

Why this exists (measured on the attached v5e, benchmarks/micro.py):
  - The MXU consumes int8 operands natively: an s8 dot streams weights at
    ~450-700 GB/s, i.e. at HBM speed of the int8 bytes.
  - Any *in-kernel* dequant (int4 unpack, int8->bf16 cast applied to the
    weight tile) is VPU elementwise work per weight, which saturates
    around ~200 GB/s — slower than just reading 2x the bytes into the
    MXU. int4-in-HBM is therefore a LOSS on TPU decode; int8-in-HBM with
    scales applied to the *accumulator* is the speed-of-light plan.

So every grouped 4/8-bit format (AWQ, GPTQ, compressed-tensors w4,
GGUF K-quants after int8 repack) is served from an int8 image:

    q8[k, n]  = q[k, n] - zero[g(k), n]          (exact, |q8| <= 15)
    out[t, n] = sum_g s[g, n] * sum_{k in g} x[t, k] * q8[k, n]

evaluated as a G-batched s8 dot with the group scale applied to the
[T, N] group accumulator (the Marlin factoring, lowered to XLA instead
of a hand kernel — XLA fuses the scale+reduce epilogue into the dot).
Formats whose zero is not an integer multiple of the scale keep a float
zero term:  out -= (per-group x sums) @ zg, one tiny [T,G]x[G,N] matmul.

Reference counterpart: the AWQ-Marlin / MMVQ CUDA kernel family
(crates/core/kernels/awq_gemv.cu, marlin_tile_mma.cu; SURVEY.md §6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Below this group size the G-batched dot degrades (K-extent per dot too
# small for the MXU); such formats stay on the Pallas w8 kernel.
MIN_GROUP = 64
# Above this token count, dequant-to-bf16 + one dense dot is compute-bound
# and avoids any risk of a [G, T, N] materialization at prefill sizes.
DENSE_T = 256


def prepare_int8_group(
    q: np.ndarray,  # [K, N] integer codes (uint8 0..15 or int8)
    s: np.ndarray,  # [G, N] f32 group scales
    zs: np.ndarray | None,  # [G, N] f32 zero*scale, or None (symmetric)
) -> dict | None:
    """Build the int8-group image {q8g, sg, zg?} or None if unsupported.

    q8g: [G, gs, N] int8, sg: [G, N] f32, zg: [G, N] f32 only when the
    zero-point is not an integer multiple of the scale.
    """
    k, n = q.shape
    groups = s.shape[0]
    if k % groups != 0:
        return None
    gs = k // groups
    if gs < MIN_GROUP or gs % 8 != 0:
        return None

    s = np.asarray(s, np.float32)
    q = np.asarray(q).astype(np.int32)
    if zs is None:
        z_int = np.zeros_like(s, dtype=np.int32)
        zg = None
    else:
        zs = np.asarray(zs, np.float32)
        safe_s = np.where(s == 0.0, 1.0, s)
        z_real = zs / safe_s
        z_int = np.rint(z_real).astype(np.int32)
        resid = zs - z_int * s
        tol = 1e-4 * max(np.abs(s).max(), 1e-20)
        zg = None if np.abs(resid).max() <= tol else resid
    q8 = q - z_int.repeat(gs, axis=0)
    if q8.min() < -127 or q8.max() > 127:
        return None
    out = {
        "q8g": q8.astype(np.int8).reshape(groups, gs, n),
        "sg": s,
    }
    if zg is not None:
        out["zg"] = zg.astype(np.float32)
    return out


def int8_group_matmul(
    x: jax.Array,  # [T, K] bf16/f32
    q8g: jax.Array,  # [G, gs, N] int8
    sg: jax.Array,  # [G, N] f32
    zg: jax.Array | None = None,  # [G, N] f32 residual zero (rare)
) -> jax.Array:
    t, k = x.shape
    groups, gs, n = q8g.shape
    assert k == groups * gs, (k, groups, gs)
    x = x.astype(jnp.bfloat16)

    if t > DENSE_T:
        # prefill: dequant fused into one dense MXU dot (compute-bound)
        w = q8g.astype(jnp.bfloat16) * sg[:, None, :].astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            x,
            w.reshape(k, n),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        xg = x.reshape(t, groups, gs).transpose(1, 0, 2)  # [G, T, gs]
        y = lax.dot_general(
            xg,
            q8g,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, T, N]
        out = (y * sg[:, None, :].astype(jnp.float32)).sum(0)
    if zg is not None:
        xsum = x.reshape(t, groups, gs).sum(-1).astype(jnp.float32)
        out = out - xsum @ zg
    return out.astype(jnp.bfloat16)


def quantize_lm_head_int8(
    w: np.ndarray | jax.Array,  # [H, V] dense head weight
) -> tuple[np.ndarray, np.ndarray]:
    """Per-column symmetric int8 image of the lm_head (halves the single
    biggest dense read of a decode step; see benchmarks/micro.py)."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=0)
    scale = np.where(amax == 0.0, 1.0, amax / 127.0)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def lm_head_int8_matmul(
    x: jax.Array,  # [S, H]
    q8: jax.Array,  # [H, V] int8
    scale: jax.Array,  # [V] f32
) -> jax.Array:
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        q8,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y * scale[None, :]
