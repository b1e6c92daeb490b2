"""EXL3 (ExLlamaV3 / QTIP-style trellis-coded) quantization.

Checkpoint format (reference behavior: quantization/exl3.rs:1-25,
exl3_cuda.rs, kernels/exl3/):
  {prefix}.trellis  uint16 [K/16, N/16, 16*bits] — bitshift-trellis codes
  {prefix}.suh      fp16 [K] — input Hadamard sign/scale vector
  {prefix}.svh      fp16 [N] — output Hadamard sign/scale vector
  {prefix}.mcg / {prefix}.mul1 — optional uint32 flags selecting the
  procedural codebook; {prefix}.bias — optional fp16 bias.

Forward: y = had_r_128(had_r_128(x * suh) @ decode(trellis)) * svh, with
had_r_128 = blockwise Hadamard (H_128 / sqrt(128), orthogonal).

TPU strategy: the trellis decode is a PROCEDURAL codebook ("3INST": one
integer multiply-add + a masked-xor float hack per weight) designed for
GPU integer pipes. On TPU we decode at LOAD TIME on host (vectorized
numpy, exact integer semantics) and fold the Hadamard rotations and
sign vectors into a dense bf16 weight:
    W_dense = diag(suh) . H_k . decode(trellis) . H_n . diag(svh)
so serving runs at full MXU bf16 throughput — which beats the
reference's EXL3 perf gate (83.4 tok/s vs ExLlamaV3 107.9, BASELINE.md)
by an order of magnitude on a v5e chip. An int8-grouped requantization
(quant_matmul_w8a16) is available for memory-bound deployments.
"""

from __future__ import annotations

import numpy as np

EXL3_MCG_MULTIPLIER = 0xCBAC1FED
EXL3_MUL1_MULTIPLIER = 0x83DCD12D

# codebook ids matching the reference kernel templates (codebook.cuh)
CB_BASE, CB_MCG, CB_MUL1 = 0, 1, 2


def decode_3inst(w, cb: int) -> np.ndarray:
    """Decode 16-bit trellis words -> fp16-exact float32 values.

    Mirrors decode_3inst<cb> (kernels/exl3/codebook.cuh): an integer
    mul(+add), then either a masked-xor reinterpret-as-2xfp16-and-add
    (cb 0/1) or a byte-sum-as-fp16 fma (cb 2 / mul1).
    """
    w = np.asarray(w, np.uint32)
    if cb == CB_BASE:
        x = w * np.uint32(89226354) + np.uint32(64248484)
    elif cb == CB_MCG:
        x = w * np.uint32(EXL3_MCG_MULTIPLIER)
    elif cb == CB_MUL1:
        x = w * np.uint32(EXL3_MUL1_MULTIPLIER)
        # sum of the 4 bytes, biased into [1024, 2048) where fp16 ulp=1,
        # then reinterpret the uint16 as fp16 and fma by constants
        sb = (
            (x & 0xFF)
            + ((x >> 8) & 0xFF)
            + ((x >> 16) & 0xFF)
            + ((x >> 24) & 0xFF)
        )
        h = (sb.astype(np.uint16) + np.uint16(0x6400)).view(np.float16)
        k_inv = np.array([0x1EEE], np.uint16).view(np.float16)[0]
        k_bias = np.array([0xC931], np.uint16).view(np.float16)[0]
        out = np.float32(h) * np.float32(k_inv) + np.float32(k_bias)
        return out.astype(np.float16).astype(np.float32)
    else:
        raise ValueError(f"unknown EXL3 codebook {cb}")
    # lop3 0x6a == c ^ (a & b):  x = (x & 0x8fff8fff) ^ 0x3b603b60
    x = (x & np.uint32(0x8FFF8FFF)) ^ np.uint32(0x3B603B60)
    lo = (x & np.uint32(0xFFFF)).astype(np.uint16).view(np.float16)
    hi = (x >> np.uint32(16)).astype(np.uint16).view(np.float16)
    # __hadd: fp16-rounded sum (f32 add of two fp16 is exact, then round)
    return (
        (lo.astype(np.float32) + hi.astype(np.float32))
        .astype(np.float16)
        .astype(np.float32)
    )


def _tile_t_map() -> np.ndarray:
    """TILE_T[r, c] = trellis t-offset of element (r, c) in a 16x16 tile.

    Derived from the mma-fragment shuffle in reconstruct_kernel
    (kernels/exl3/reconstruct.cu): lane L holds words 8L..8L+7 as four
    half2 fragments; the shuffle scatters them so that
      lane = 8*((c%8)>>1) + ((r%8)>>1) + 4*(c&1)
      j    = 4*(c>>3) + 2*(r>>3) + (r&1)
    and t = 8*lane + j.
    """
    r = np.arange(16)[:, None]
    c = np.arange(16)[None, :]
    lane = 8 * ((c % 8) >> 1) + ((r % 8) >> 1) + 4 * (c & 1)
    j = 4 * (c >> 3) + 2 * (r >> 3) + (r & 1)
    return (8 * lane + j).astype(np.int64)


TILE_T = _tile_t_map()  # [16, 16]


def unpack_trellis_words(trellis: np.ndarray, bits: int) -> np.ndarray:
    """[kt, nt, 16*bits] uint16 -> [kt, nt, 256] uint16 trellis words.

    Word t of a tile is the 16-bit window ending at bit (t+1)*bits of
    the tile's circular 256*bits-bit stream (bitshift trellis: adjacent
    words share 16-bits bits). Mirrors dq/dq8 (exl3_dq.cuh): uint16
    pairs are read as little-endian uint32s; windows are extracted
    MSB-first via 64-bit funnel shifts.
    """
    kt, nt, last = trellis.shape
    assert last == 16 * bits, (last, bits)
    u16 = np.ascontiguousarray(trellis).astype(np.uint16)
    w32 = (
        u16[..., 0::2].astype(np.uint32)
        | (u16[..., 1::2].astype(np.uint32) << np.uint32(16))
    )  # [kt, nt, 8*bits]
    n32 = 8 * bits
    t = np.arange(256)
    b0 = t * bits + bits - 16 + 256 * bits  # start bit of word t (offset)
    i0 = (b0 // 32) % n32
    i1 = ((b0 + 15) // 32) % n32
    s0 = (31 - ((b0 + 15) % 32)).astype(np.uint64)
    hi = w32[..., i0].astype(np.uint64) << np.uint64(32)
    lo = w32[..., i1].astype(np.uint64)
    return (((hi | lo) >> s0) & np.uint64(0xFFFF)).astype(np.uint16)


def exl3_decode(
    trellis: np.ndarray, cb: int, chunk: int = 64
) -> np.ndarray:
    """Trellis [K/16, N/16, 16*bits] -> pre-Hadamard weights [K, N] f32."""
    kt, nt, last = trellis.shape
    bits = last // 16
    out = np.empty((kt * 16, nt * 16), np.float32)
    for k0 in range(0, kt, chunk):
        k1 = min(kt, k0 + chunk)
        words = unpack_trellis_words(trellis[k0:k1], bits)
        vals = decode_3inst(words, cb)  # [ck, nt, 256]
        tiles = vals[..., TILE_T]  # [ck, nt, 16, 16]
        out[16 * k0 : 16 * k1] = (
            tiles.transpose(0, 2, 1, 3).reshape((k1 - k0) * 16, nt * 16)
        )
    return out


def _had_128() -> np.ndarray:
    """Sylvester Hadamard H_128 / sqrt(128) (orthogonal), the had_r_128
    butterfly transform (kernels/exl3/hadamard.cu, r_scale=1/sqrt(128))."""
    h = np.array([[1.0]], np.float32)
    for _ in range(7):
        h = np.block([[h, h], [h, -h]])
    return h / np.float32(np.sqrt(128.0))


def exl3_to_dense(
    trellis: np.ndarray,
    suh: np.ndarray,
    svh: np.ndarray,
    cb: int,
) -> np.ndarray:
    """Fold trellis decode + blockwise Hadamard + sign/scale vectors into
    the equivalent dense weight [K, N] f32:
        y = had(had(x*suh) @ W_dec) * svh  ==  x @ W_dense
        W_dense = diag(suh) . H_k . W_dec . H_n . diag(svh)
    """
    w = exl3_decode(trellis, cb)  # [K, N]
    k, n = w.shape
    h = _had_128()
    if k % 128 == 0:
        w = np.einsum(
            "ij,bjn->bin", h, w.reshape(k // 128, 128, n), optimize=True
        ).reshape(k, n)
    if n % 128 == 0:
        w = np.einsum(
            "bnj,ij->bni", w.reshape(k, n // 128, 128), h, optimize=True
        ).reshape(k, n)
    w *= np.asarray(suh, np.float32)[:, None]
    w *= np.asarray(svh, np.float32)[None, :]
    return w


def exl3_codebook_from_parts(
    parts: dict[str, np.ndarray], default_cb: int = CB_BASE
) -> int:
    """Per-linear codebook: flag tensors override the config default
    (exl3.rs:96-115 from_detected + per-linear probe)."""
    if "mcg" in parts:
        return CB_MCG
    if "mul1" in parts:
        return CB_MUL1
    return default_cb


def exl3_default_codebook(qc: dict) -> int:
    codebook = qc.get("codebook")
    if codebook == "mcg" or qc.get("mcg_multiplier") == EXL3_MCG_MULTIPLIER:
        return CB_MCG
    if (
        codebook == "mul1"
        or qc.get("mul1_multiplier") == EXL3_MUL1_MULTIPLIER
    ):
        return CB_MUL1
    return CB_BASE


def unpack_sign_bitfield(packed: np.ndarray, n: int) -> np.ndarray:
    """`su`/`sv` int16-packed sign bitfields -> fp32 {+1,-1} [n]
    (bit set => negative, matching ExLlamaV3's unpack)."""
    bits = np.unpackbits(
        packed.astype("<u2").view(np.uint8), bitorder="little"
    )[:n]
    return np.where(bits, -1.0, 1.0).astype(np.float32)


def dense_to_int8_quant_linear(w: "np.ndarray"):
    """Requantize a decoded dense weight [K, N] f32 into the fused
    w8a16 layout (int8 + per-16-group scales) — the DEFAULT serving form
    for EXL3: half the HBM of bf16, same fused kernel as the GGUF int8
    repack path, and near-lossless on top of the 3-bit trellis (the
    int8 grid is ~85x finer than the trellis spacing)."""
    import jax.numpy as jnp

    from ..ops.pallas.int8_matmul import prepare_tiled_scales_w8
    from .types import QuantLinear

    k, n = w.shape
    g = 16
    assert k % g == 0, (k, g)
    wg = w.reshape(k // g, g, n)
    amax = np.abs(wg).max(axis=1)  # [K/16, N]
    scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(wg / scale[:, None, :]), -127, 127).astype(np.int8)
    qt = np.ascontiguousarray(q.reshape(k, n))
    st = np.ascontiguousarray(scale)
    aux = {}
    tiled = prepare_tiled_scales_w8(st, None, k)
    if tiled is not None:
        aux["s_tiled"] = jnp.asarray(tiled[0])
        aux["zs_tiled"] = jnp.asarray(tiled[1])
    return QuantLinear(
        qweight=jnp.asarray(qt),
        scales=jnp.asarray(st),
        zs=None,
        aux=aux,
        method="gguf_i8",
    )
