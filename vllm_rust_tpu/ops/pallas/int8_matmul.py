"""Fused int8 dequant + matmul Pallas kernel (w8a16, grouped scale/zero).

One kernel serves the ENTIRE GGUF family: every GGML block format is
exactly `w = s_g * q - z_g` with q int8 and per-16 (or coarser) group
scale/zero (quantization/gguf_file.py dequant_int8_grouped), so K-quants
and I-quants all decode at int8 HBM bandwidth — the TPU counterpart of
the reference's per-format MMVQ CUDA kernels (iq_dequant.cu q8_1 MMVQ,
gguf_cuda.rs; ADR 0025: 0.41 -> 21.5 tok/s was this kernel's fight).

Layout:
  qweight int8 [K, N]
  scales / zs f32 [K/g, N] -> load-time reshape to [nk, gpb, N] stripes
  (gpb = block_k // g rows per K-tile; zero-padded to sublane multiple).

Same Marlin-style factoring as quant_matmul.py: the weight path is a
cast-only int8->bf16 tile; scales/zeros are applied to the [T, bn] group
accumulator:  out = sum_g s_g * (x_g @ q_g) - (sum_{k in g} x_k) * z_g.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_kernels

from .quant_matmul import choose_block

SUBLANE = 8


def kernel_plan_w8(k: int, n: int, g: int) -> tuple[int, int, int] | None:
    """(block_k, block_n, gpb_padded) or None -> dense fallback."""
    block_n = choose_block(n)
    block_k = choose_block(k, (512, 256, 128))
    if block_n is None or block_k is None or block_k % g != 0:
        return None
    gpb = block_k // g
    gpb_pad = max(SUBLANE, -(-gpb // SUBLANE) * SUBLANE)
    return block_k, block_n, gpb_pad


def prepare_tiled_scales_w8(
    scales: np.ndarray, zs: np.ndarray | None, k: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """[K/g, N] -> [nk, gpb_pad, N] f32 stripes (zs=None -> zeros)."""
    n_groups, n = scales.shape
    g = k // n_groups
    plan = kernel_plan_w8(k, n, g)
    if plan is None:
        return None
    block_k, _, gpb_pad = plan
    gpb = block_k // g
    nk = k // block_k

    def tile(a):
        out = np.zeros((nk, gpb_pad, n), np.float32)
        out[:, :gpb] = np.asarray(a, np.float32).reshape(nk, gpb, n)
        return out

    z = np.zeros_like(scales) if zs is None else zs
    return tile(scales), tile(z)


def _kernel(x_ref, qw_ref, s_ref, z_ref, out_ref, acc_ref, *, bk: int,
            gpb: int, has_z: bool):
    """Grid: (N//bn, K//bk); ki is the reduction dimension."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Cast-only weight path (int8 -> int32 -> bf16; Mosaic lacks direct
    # int8->bf16 vector casts), scales on the group accumulator.
    qw = qw_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # [bk, bn]
    x = x_ref[:, pl.ds(ki * bk, bk)]  # [T, bk] bf16
    s = s_ref[0]  # [gpb_pad, bn] f32
    z = z_ref[0]
    g_rows = bk // gpb
    for g in range(gpb):
        rows = slice(g * g_rows, (g + 1) * g_rows)  # static slice
        xg = x[:, rows]
        mm = jnp.dot(xg, qw[rows, :], preferred_element_type=jnp.float32)
        acc_ref[...] += mm * s[g, :][None, :]
        if has_z:
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc_ref[...] -= xsum * z[g, :][None, :]

    @pl.when(ki == pl.num_programs(1) - 1)
    def _done():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def quant_matmul_w8a16(
    x: jax.Array,  # [T, K] bf16/f32
    qweight: jax.Array,  # [K, N] int8
    scales: jax.Array,  # [K/g, N] f32 (canonical)
    zs: jax.Array | None = None,  # [K/g, N] f32
    s_tiled: jax.Array | None = None,  # [nk, gpb_pad, N] (load-time tiling)
    zs_tiled: jax.Array | None = None,
    has_z: bool = False,
) -> jax.Array:
    """Fused grouped int8 dequant-matmul; dense-reference fallback for
    shapes the kernel cannot tile (tiny test layers)."""
    t, k = x.shape
    kw, n = qweight.shape
    assert k == kw, (k, kw)
    g = k // scales.shape[0]

    plan = kernel_plan_w8(k, n, g)
    if plan is None or s_tiled is None or zs_tiled is None:
        return quant_matmul_w8a16_ref(x, qweight, scales, zs)
    block_k, block_n, gpb_pad = plan
    return _w8a16_pallas(
        x.astype(jnp.bfloat16),
        qweight,
        s_tiled,
        zs_tiled,
        block_n=block_n,
        block_k=block_k,
        gpb=block_k // g,
        has_z=has_z,
    )


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "gpb", "has_z")
)
def _w8a16_pallas(x, qweight, s_tiled, zs_tiled, *, block_n, block_k, gpb,
                  has_z):
    t, k = x.shape
    _, n = qweight.shape
    nk = k // block_k
    gpb_pad = s_tiled.shape[1]

    kernel = functools.partial(_kernel, bk=block_k, gpb=gpb, has_z=has_z)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // block_n, nk),
            in_specs=[
                pl.BlockSpec((t, k), lambda ni, ki: (0, 0)),  # x whole
                pl.BlockSpec((block_k, block_n), lambda ni, ki: (ki, ni)),
                pl.BlockSpec((1, gpb_pad, block_n), lambda ni, ki: (ki, 0, ni)),
                pl.BlockSpec((1, gpb_pad, block_n), lambda ni, ki: (ki, 0, ni)),
            ],
            out_specs=pl.BlockSpec((t, block_n), lambda ni, ki: (0, ni)),
            scratch_shapes=[pltpu.VMEM((t, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_kernels(),
    )(x, qweight, s_tiled, zs_tiled)


def quant_matmul_w8a16_ref(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zs: jax.Array | None,
) -> jax.Array:
    """Dense reference: dequant + matmul (correctness anchor)."""
    k, n = qweight.shape
    g = k // scales.shape[0]
    w = qweight.astype(jnp.float32) * jnp.repeat(scales, g, axis=0)
    if zs is not None:
        w = w - jnp.repeat(zs, g, axis=0)
    # f32 matmul: this path is also the small-shape fallback, and bf16
    # accumulation over long K loses ~1% per 256 terms.
    return (x.astype(jnp.float32) @ w).astype(jnp.bfloat16)
