"""Fused 4-bit dequant + matmul Pallas kernel (w4a16, grouped scales).

TPU-native replacement for the reference's weight-only quant GEMV/GEMM
CUDA kernels (awq_gemv.cu, marlin_tile_mma.cu, gptq_dequant.cu — the
kernels behind its entire AWQ/GPTQ perf story, SURVEY.md §6). Decode is
HBM-bandwidth-bound: reading int4 weights moves 4x fewer bytes than
bf16, so the fused kernel's ceiling is ~4x the dense decode ceiling.

Layout (produced by quantization/awq.py repack):
  qweight uint8 [K/2, N]: low nibble = w[k, n], high nibble = w[k+K/2, n]
  scales / zs  bf16 [K/g, N]:  w = q * s - zs   (zs = zero * s)

K-half packing keeps both unpacked tiles lane-aligned — no in-kernel
shuffles, just mask/shift on the VPU, then two bf16 MXU matmuls per
packed tile. Scales/zs are pre-tiled at load time into sublane-aligned
[2*nk, TH, N] stripes (low-half tiles then high-half tiles) so every
block spec satisfies Mosaic's (8, 128) alignment — no dynamic row
slicing in the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_kernels

TILE_H = 8  # scale-tile height (sublane alignment)


def choose_block(total: int, candidates=(512, 256, 128)) -> int | None:
    for c in candidates:
        if total % c == 0:
            return c
    return None


def kernel_plan(kp: int, n: int, g: int) -> tuple[int, int] | None:
    """(block_kp, block_n) for a layer shape, or None → dense fallback.
    Deterministic: load-time scale tiling and apply-time tiling agree."""
    block_n = choose_block(n)
    block_kp = choose_block(kp, (512, 256, 128))
    if (
        block_n is None
        or block_kp is None
        or block_kp % g != 0
        or block_kp // g > TILE_H
        or (2 * kp // g) % 2 != 0
        or kp % block_kp != 0
    ):
        return None
    return block_kp, block_n


def prepare_tiled_scales(
    scales: np.ndarray, zs: np.ndarray, kp: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """[K/g, N] -> [2*nk, TILE_H, N] (lo tiles, then hi tiles), zero-pad."""
    n_groups, n = scales.shape
    k_full = 2 * kp
    g = k_full // n_groups
    plan = kernel_plan(kp, n, g)
    if plan is None:
        return None
    block_kp, _ = plan
    gph = block_kp // g
    nk = kp // block_kp
    half = n_groups // 2

    def tile(a):
        out = np.zeros((2 * nk, TILE_H, n), a.dtype)
        for ki in range(nk):
            out[ki, :gph] = a[ki * gph : (ki + 1) * gph]
            out[nk + ki, :gph] = a[half + ki * gph : half + (ki + 1) * gph]
        return out

    return tile(np.asarray(scales)), tile(np.asarray(zs))


def _kernel(x_ref, qw_ref, s_lo_ref, s_hi_ref, zs_lo_ref, zs_hi_ref,
            out_ref, acc_ref, *, bkp: int, groups_per_half: int):
    """Grid: (N//bn, Kp//bkp); Kp = K/2 packed rows; ki is the reduction."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic lacks int8 vector shifts and uint8->bf16 casts: widen to
    # int32, then convert. The weight path is CAST-ONLY — scales and
    # zeros are applied to the [T, bn] group accumulator instead of the
    # [bkp, bn] weight tile (Marlin-style factoring):
    #   out = Σ_g  s_g ⊙ (x_g @ q_g)  -  (Σ_{k∈g} x_k) ⊙ zs_g
    qw = qw_ref[...].astype(jnp.int32)  # [bkp, bn]
    lo = (qw & 0xF).astype(jnp.bfloat16)
    hi = ((qw >> 4) & 0xF).astype(jnp.bfloat16)

    g_rows = bkp // groups_per_half
    x_lo = x_ref[:, pl.ds(k * bkp, bkp)]  # [T, bkp] bf16
    x_hi = x_ref[:, pl.ds((nk + k) * bkp, bkp)]
    s_lo = s_lo_ref[0]  # [TILE_H, bn]
    s_hi = s_hi_ref[0]
    zs_lo = zs_lo_ref[0]
    zs_hi = zs_hi_ref[0]
    for g in range(groups_per_half):
        rows = slice(g * g_rows, (g + 1) * g_rows)  # static slice
        xg_lo = x_lo[:, rows]
        xg_hi = x_hi[:, rows]
        mm_lo = jnp.dot(xg_lo, lo[rows, :], preferred_element_type=jnp.float32)
        mm_hi = jnp.dot(xg_hi, hi[rows, :], preferred_element_type=jnp.float32)
        xsum_lo = jnp.sum(xg_lo.astype(jnp.float32), axis=1, keepdims=True)
        xsum_hi = jnp.sum(xg_hi.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += (
            mm_lo * s_lo[g, :][None, :].astype(jnp.float32)
            - xsum_lo * zs_lo[g, :][None, :].astype(jnp.float32)
        )
        acc_ref[...] += (
            mm_hi * s_hi[g, :][None, :].astype(jnp.float32)
            - xsum_hi * zs_hi[g, :][None, :].astype(jnp.float32)
        )

    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def quant_matmul_w4a16(
    x: jax.Array,  # [T, K] bf16/f32
    qweight: jax.Array,  # [K/2, N] uint8
    scales: jax.Array,  # [K/g, N] bf16 (canonical)
    zs: jax.Array,  # [K/g, N] bf16
    s_tiled: jax.Array | None = None,  # [2*nk, TILE_H, N] (load-time tiling)
    zs_tiled: jax.Array | None = None,
) -> jax.Array:
    """Fused grouped dequant-matmul; dense-reference fallback for shapes
    the kernel cannot tile (tiny test layers) or when tiles are absent."""
    t, k_full = x.shape
    kp, n = qweight.shape
    assert k_full == 2 * kp, (k_full, kp)
    g = k_full // scales.shape[0]

    plan = kernel_plan(kp, n, g)
    if plan is None or s_tiled is None or zs_tiled is None:
        return quant_matmul_w4a16_ref(x, qweight, scales, zs)
    block_kp, block_n = plan
    x = x.astype(jnp.bfloat16)
    return _quant_matmul_pallas_gph(
        x,
        qweight,
        s_tiled,
        zs_tiled,
        block_n=block_n,
        block_kp=block_kp,
        gph=block_kp // g,
    )


@functools.partial(jax.jit, static_argnames=("block_n", "block_kp", "gph"))
def _quant_matmul_pallas_gph(x, qweight, s_tiled, zs_tiled, *, block_n, block_kp, gph):
    t, k_full = x.shape
    kp, n = qweight.shape
    nk = kp // block_kp

    kernel = functools.partial(_kernel, bkp=block_kp, groups_per_half=gph)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // block_n, nk),
            in_specs=[
                pl.BlockSpec((t, k_full), lambda ni, ki: (0, 0)),  # x whole
                pl.BlockSpec((block_kp, block_n), lambda ni, ki: (ki, ni)),
                pl.BlockSpec((1, TILE_H, block_n), lambda ni, ki: (ki, 0, ni)),
                pl.BlockSpec(
                    (1, TILE_H, block_n), lambda ni, ki: (ki + nk, 0, ni)
                ),
                pl.BlockSpec((1, TILE_H, block_n), lambda ni, ki: (ki, 0, ni)),
                pl.BlockSpec(
                    (1, TILE_H, block_n), lambda ni, ki: (ki + nk, 0, ni)
                ),
            ],
            out_specs=pl.BlockSpec((t, block_n), lambda ni, ki: (0, ni)),
            scratch_shapes=[pltpu.VMEM((t, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_kernels(),
    )(x, qweight, s_tiled, s_tiled, zs_tiled, zs_tiled)


def quant_matmul_w4a16_ref(
    x: jax.Array, qweight: jax.Array, scales: jax.Array, zs: jax.Array
) -> jax.Array:
    """Dense reference: unpack + dequant + matmul (correctness anchor)."""
    kp, n = qweight.shape
    k = 2 * kp
    g = k // scales.shape[0]
    lo = (qweight & 0xF).astype(jnp.bfloat16)
    hi = (qweight >> 4).astype(jnp.bfloat16)
    q = jnp.concatenate([lo, hi], axis=0)  # [K, N]
    s = jnp.repeat(scales, g, axis=0)
    z = jnp.repeat(zs, g, axis=0)
    w = q * s - z
    return (x.astype(jnp.bfloat16) @ w).astype(jnp.bfloat16)
