"""Grouped-int4 weight matmul: native s4 operands on the MXU path (r5).

Round-4's serve default was the int8-group image (ops/int8_group.py):
int8-in-HBM at ~700 GB/s beats any in-kernel VPU dequant. r5 measured
the missing variant (benchmarks/int4_native_ab.py): a NATIVE jnp.int4
weight fed through `astype(int8)` into the same mixed/int dot streams
the int4 bytes at HBM rate — XLA lowers the s4->s8 widen into the dot's
operand pipeline instead of a VPU elementwise pass. Half the bytes, no
Pallas kernel, and identical numerics to the int8-group path (the
activation stays bf16; only the weight container narrows).

Math (AWQ/GPTQ grouped affine, w = q * s - zs, q in 0..15):
    w = (q - 8) * s - (zs - 8 s)
    out[t, n] = sum_g s[g, n] * (x_g @ (q - 8)_g)[t, n]
              - xsum[t, g] @ (zs - 8 s)[g, n]
with (q - 8) in [-8, 7] stored as s4. Unlike the int8 image (which
folds the integer zero-point into the codes — out of s4 range), the
zero stays in the epilogue matmul: one [T,G]x[G,N] f32 dot, negligible.

Boundary caveat: the axon plugin's device_put RECURSES when relayouting
an s4 array at a jit boundary, so serve arrays must be born on device
via a jitted cast (pack_q4) and then keep a stable layout. Verified by
benchmarks/int4_layout_probe.py; quantization/awq.py falls back to the
int8 image if the probe pattern ever breaks.

Reference counterpart: the AWQ-Marlin / MMVQ CUDA kernel family
(crates/core/kernels/awq_gemv.cu, marlin_tile_mma.cu; SURVEY.md §6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..compat import apply_s4_shard_arg_patch

# s4 arrays cross a jit boundary every engine step; without the shim the
# axon plugin recurses on a spurious relayout (see compat.py)
apply_s4_shard_arg_patch()

# Same serve-path gates as the int8 image (ops/int8_group.py)
MIN_GROUP = 64
DENSE_T = 256


@jax.jit
def _cast_s4(q8: jax.Array) -> jax.Array:
    """int8 codes in [-8, 7] -> native s4 array, born on device (the
    plugin cannot host-transfer or relayout s4; see module docstring)."""
    return q8.astype(jnp.int4)


def prepare_int4_group(
    q: np.ndarray,  # [K, N] integer codes (uint8/int 0..15)
    s: np.ndarray,  # [G, N] f32 group scales
    zs: np.ndarray | None,  # [G, N] f32 zero*scale, or None (symmetric q-8)
) -> dict | None:
    """Build the s4 serve image {q4g (device s4 [G, gs, N]), sg, zg} or
    None if the shape does not fit the grouped-dot plan."""
    k, n = q.shape
    groups = s.shape[0]
    if k % groups != 0:
        return None
    gs = k // groups
    if gs < MIN_GROUP or gs % 8 != 0:
        return None
    q = np.asarray(q).astype(np.int32)
    if q.min() < 0 or q.max() > 15:
        return None
    s = np.asarray(s, np.float32)
    # recenter to s4 range; zero term goes to the epilogue
    q4 = (q - 8).astype(np.int8).reshape(groups, gs, n)
    if zs is None:
        zg = (-8.0 * s).astype(np.float32)
    else:
        zg = (np.asarray(zs, np.float32) - 8.0 * s).astype(np.float32)
    q4g = _cast_s4(jnp.asarray(q4))
    return {"q4g": q4g, "sg": s, "zg": zg}


def int4_group_matmul(
    x: jax.Array,  # [T, K] bf16/f32
    q4g: jax.Array,  # [G, gs, N] s4 (codes - 8)
    sg: jax.Array,  # [G, N] f32
    zg: jax.Array,  # [G, N] f32 (zs - 8 s)
) -> jax.Array:
    t, k = x.shape
    groups, gs, n = q4g.shape
    assert k == groups * gs, (k, groups, gs)
    x = x.astype(jnp.bfloat16)

    if t > DENSE_T:
        # prefill: dequant into one dense MXU dot (compute-bound there)
        w = q4g.astype(jnp.bfloat16) * sg[:, None, :].astype(jnp.bfloat16)
        out = lax.dot_general(
            x,
            w.reshape(k, n),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        xg = x.reshape(t, groups, gs).transpose(1, 0, 2)  # [G, T, gs]
        y = lax.dot_general(
            xg,
            q4g.astype(jnp.int8),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, T, N]
        out = (y * sg[:, None, :].astype(jnp.float32)).sum(0)
    xsum = x.reshape(t, groups, gs).sum(-1).astype(jnp.float32)
    out = out - xsum @ zg
    return out.astype(jnp.bfloat16)
