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
packed tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_kernels


def _choose_block(total: int, candidates=(512, 256, 128)) -> int | None:
    for c in candidates:
        if total % c == 0:
            return c
    return None


def _kernel(x_ref, qw_ref, s_lo_ref, s_hi_ref, zs_lo_ref, zs_hi_ref,
            out_ref, acc_ref, *, bkp: int, groups_per_half: int):
    """Grid: (N//bn, Kp//bkp); Kp = K/2 packed rows; ki is the reduction."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qw = qw_ref[...]  # [bkp, bn] uint8
    lo = (qw & 0xF).astype(jnp.bfloat16)
    hi = (qw >> 4).astype(jnp.bfloat16)

    g_rows = bkp // groups_per_half
    x_lo = x_ref[:, pl.ds(k * bkp, bkp)]  # [T, bkp] bf16
    x_hi = x_ref[:, pl.ds((nk + k) * bkp, bkp)]
    for g in range(groups_per_half):
        rows = slice(g * g_rows, (g + 1) * g_rows)  # static slice
        w_lo = lo[rows, :] * s_lo_ref[g, :][None, :] - zs_lo_ref[g, :][None, :]
        w_hi = hi[rows, :] * s_hi_ref[g, :][None, :] - zs_hi_ref[g, :][None, :]
        acc_ref[...] += jnp.dot(
            x_lo[:, rows], w_lo, preferred_element_type=jnp.float32
        )
        acc_ref[...] += jnp.dot(
            x_hi[:, rows], w_hi, preferred_element_type=jnp.float32
        )

    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_kp"))
def _quant_matmul_pallas(x, qweight, scales, zs, *, block_n, block_kp):
    t, k_full = x.shape
    kp, n = qweight.shape
    n_groups = scales.shape[0]
    g = k_full // n_groups
    groups_per_half = block_kp // g
    nk = kp // block_kp  # K-reduction grid size (static)

    kernel = functools.partial(
        _kernel, bkp=block_kp, groups_per_half=groups_per_half
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // block_n, nk),
            in_specs=[
                pl.BlockSpec((t, k_full), lambda ni, ki: (0, 0)),  # x whole
                pl.BlockSpec((block_kp, block_n), lambda ni, ki: (ki, ni)),
                pl.BlockSpec(
                    (groups_per_half, block_n), lambda ni, ki: (ki, ni)
                ),
                pl.BlockSpec(
                    (groups_per_half, block_n), lambda ni, ki: (ki + nk, ni)
                ),
                pl.BlockSpec(
                    (groups_per_half, block_n), lambda ni, ki: (ki, ni)
                ),
                pl.BlockSpec(
                    (groups_per_half, block_n), lambda ni, ki: (ki + nk, ni)
                ),
            ],
            out_specs=pl.BlockSpec((t, block_n), lambda ni, ki: (0, ni)),
            scratch_shapes=[pltpu.VMEM((t, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_kernels(),
    )(x, qweight, scales, scales, zs, zs)


def quant_matmul_w4a16(
    x: jax.Array,  # [T, K] bf16/f32
    qweight: jax.Array,  # [K/2, N] uint8
    scales: jax.Array,  # [K/g, N] bf16
    zs: jax.Array,  # [K/g, N] bf16
) -> jax.Array:
    """Fused grouped dequant-matmul; falls back to the dense reference for
    shapes the kernel cannot tile (tiny test layers)."""
    t, k_full = x.shape
    kp, n = qweight.shape
    assert k_full == 2 * kp, (k_full, kp)
    g = k_full // scales.shape[0]

    block_n = _choose_block(n)
    block_kp = _choose_block(kp, (512, 256, 128))
    if (
        block_n is None
        or block_kp is None
        or block_kp % g != 0
        or (kp // g) % (block_kp // g) != 0
    ):
        return quant_matmul_w4a16_ref(x, qweight, scales, zs)
    x = x.astype(jnp.bfloat16)
    return _quant_matmul_pallas(
        x, qweight, scales, zs, block_n=block_n, block_kp=block_kp
    )


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
