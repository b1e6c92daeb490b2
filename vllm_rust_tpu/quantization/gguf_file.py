"""GGUF container parsing + GGML quant-block dequantization.

Reference: quantization/gguf/header.rs (own GGUF parser, 491 LoC) and
gguf/mod.rs. This is a clean-room implementation from the public GGUF
spec (v2/v3) and the GGML quantization block layouts: header → typed
metadata KVs → tensor infos → mmap'd data section; per-type dequant as
vectorized numpy (the C++ fast path in native/ggml_dequant.cpp is used
when built, with these as the portable fallback + correctness anchor).

Block layouts implemented here (all super-block structures from the
public ggml spec):
  Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 (32-element blocks)
  Q2_K/Q3_K/Q4_K/Q5_K/Q6_K (256-element super-blocks, 6-bit sub-scales)
"""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# metadata value types
_VT = {
    0: ("B", 1),  # uint8
    1: ("b", 1),
    2: ("H", 2),
    3: ("h", 2),
    4: ("I", 4),
    5: ("i", 4),
    6: ("f", 4),
    7: ("?", 1),
    10: ("Q", 8),
    11: ("q", 8),
    12: ("d", 8),
}

# ggml tensor types: id -> (name, block_elems, block_bytes)
GGML_TYPES = {
    0: ("F32", 1, 4),
    1: ("F16", 1, 2),
    2: ("Q4_0", 32, 18),
    3: ("Q4_1", 32, 20),
    6: ("Q5_0", 32, 22),
    7: ("Q5_1", 32, 24),
    8: ("Q8_0", 32, 34),
    10: ("Q2_K", 256, 84),
    11: ("Q3_K", 256, 110),
    12: ("Q4_K", 256, 144),
    13: ("Q5_K", 256, 176),
    14: ("Q6_K", 256, 210),
    16: ("IQ2_XXS", 256, 66),
    17: ("IQ2_XS", 256, 74),
    18: ("IQ3_XXS", 256, 98),
    19: ("IQ1_S", 256, 50),
    20: ("IQ4_NL", 32, 18),
    21: ("IQ3_S", 256, 110),
    22: ("IQ2_S", 256, 82),
    23: ("IQ4_XS", 256, 136),
    30: ("BF16", 1, 2),
}


@dataclass
class TensorInfo:
    name: str
    shape: tuple[int, ...]  # ggml ne order: ne[0] = innermost/contiguous
    ggml_type: int
    offset: int  # relative to data section start

    @property
    def type_name(self) -> str:
        return GGML_TYPES[self.ggml_type][0]

    @property
    def num_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def num_bytes(self) -> int:
        _, be, bb = GGML_TYPES[self.ggml_type]
        return self.num_elements // be * bb


class GGUFReader:
    """Parses a .gguf file; tensor data stays mmap'd until dequantized."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._pos = 0
        self.metadata: dict[str, object] = {}
        self.tensors: dict[str, TensorInfo] = {}
        self._parse()

    # -- low-level readers ---------------------------------------------------

    def _read(self, fmt: str, size: int):
        v = struct.unpack_from("<" + fmt, self._mm, self._pos)[0]
        self._pos += size
        return v

    def _read_string(self) -> str:
        n = self._read("Q", 8)
        s = self._mm[self._pos : self._pos + n].decode("utf-8", errors="replace")
        self._pos += n
        return s

    def _read_value(self, vtype: int):
        if vtype in _VT:
            fmt, size = _VT[vtype]
            return self._read(fmt, size)
        if vtype == 8:
            return self._read_string()
        if vtype == 9:  # array
            elem_type = self._read("I", 4)
            count = self._read("Q", 8)
            if elem_type in _VT and elem_type != 7:
                fmt, size = _VT[elem_type]
                arr = np.frombuffer(
                    self._mm, dtype=np.dtype(fmt), count=count, offset=self._pos
                )
                self._pos += size * count
                return arr
            return [self._read_value(elem_type) for _ in range(count)]
        raise ValueError(f"unknown GGUF value type {vtype}")

    # -- structure -----------------------------------------------------------

    def _parse(self) -> None:
        magic = self._read("I", 4)
        if magic != GGUF_MAGIC:
            raise ValueError(f"not a GGUF file (magic {magic:#x})")
        version = self._read("I", 4)
        if version not in (2, 3):
            raise ValueError(f"unsupported GGUF version {version}")
        n_tensors = self._read("Q", 8)
        n_kv = self._read("Q", 8)
        for _ in range(n_kv):
            key = self._read_string()
            vtype = self._read("I", 4)
            self.metadata[key] = self._read_value(vtype)
        infos = []
        for _ in range(n_tensors):
            name = self._read_string()
            n_dims = self._read("I", 4)
            shape = tuple(self._read("Q", 8) for _ in range(n_dims))
            ttype = self._read("I", 4)
            offset = self._read("Q", 8)
            infos.append(TensorInfo(name, shape, ttype, offset))
        align = int(self.metadata.get("general.alignment", 32))
        data_start = (self._pos + align - 1) // align * align
        self.data_offset = data_start
        for ti in infos:
            self.tensors[ti.name] = ti

    # -- tensor access -------------------------------------------------------

    def tensor_bytes(self, name: str) -> np.ndarray:
        ti = self.tensors[name]
        start = self.data_offset + ti.offset
        return np.frombuffer(self._mm, np.uint8, ti.num_bytes, start)

    def dequant(self, name: str, dtype=np.float32) -> np.ndarray:
        """Dequantized tensor in numpy C-order with shape = reversed ggml
        ne (i.e. [out, in] for a linear weight, torch convention)."""
        ti = self.tensors[name]
        raw = self.tensor_bytes(name)
        flat = dequantize(raw, ti.ggml_type, ti.num_elements)
        return flat.astype(dtype).reshape(tuple(reversed(ti.shape)))

    def close(self):
        self._mm.close()
        self._f.close()


# ---------------------------------------------------------------------------
# Dequantization (vectorized numpy; layouts per the public ggml spec)
# ---------------------------------------------------------------------------


def _f16(buf: np.ndarray) -> np.ndarray:
    return buf.view(np.float16).astype(np.float32)


def dequantize(raw: np.ndarray, ggml_type: int, n_elems: int) -> np.ndarray:
    name, be, bb = GGML_TYPES[ggml_type]
    from ..native import native_dequant

    native = native_dequant(name, raw, n_elems)
    if native is not None:
        return native
    fn = _DEQUANT.get(name)
    if fn is None:
        raise NotImplementedError(f"GGML type {name} dequant not implemented")
    blocks = raw.reshape(n_elems // be, bb)
    return fn(blocks).reshape(-1)


def _dq_f32(blocks):
    return blocks.reshape(-1).view(np.float32)


def _dq_f16(blocks):
    return blocks.reshape(-1).view(np.float16).astype(np.float32)


def _dq_bf16(blocks):
    u16 = blocks.reshape(-1).view(np.uint16).astype(np.uint32) << 16
    return u16.view(np.float32)


def _nibbles(qs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (qs & 0xF).astype(np.int32), (qs >> 4).astype(np.int32)


def _dq_q4_0(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    lo, hi = _nibbles(blocks[:, 2:18])
    q = np.concatenate([lo, hi], axis=1)  # elems 0..15 then 16..31
    return d * (q - 8)


def _dq_q4_1(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    m = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    lo, hi = _nibbles(blocks[:, 4:20])
    q = np.concatenate([lo, hi], axis=1)
    return d * q + m


def _dq_q5_0(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    qh = blocks[:, 2:6].copy().view(np.uint32).reshape(-1)  # [B]
    lo, hi = _nibbles(blocks[:, 6:22])
    j = np.arange(16)
    b_lo = ((qh[:, None] >> j) & 1).astype(np.int32)
    b_hi = ((qh[:, None] >> (j + 16)) & 1).astype(np.int32)
    q = np.concatenate([lo | (b_lo << 4), hi | (b_hi << 4)], axis=1)
    return d * (q - 16)


def _dq_q5_1(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    m = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    qh = blocks[:, 4:8].copy().view(np.uint32).reshape(-1)
    lo, hi = _nibbles(blocks[:, 8:24])
    j = np.arange(16)
    b_lo = ((qh[:, None] >> j) & 1).astype(np.int32)
    b_hi = ((qh[:, None] >> (j + 16)) & 1).astype(np.int32)
    q = np.concatenate([lo | (b_lo << 4), hi | (b_hi << 4)], axis=1)
    return d * q + m


def _dq_q8_0(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    q = blocks[:, 2:34].view(np.int8).astype(np.int32)
    return d * q


def _k_scales_6bit(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack q4_K/q5_K 12-byte scale/min packing → (sc[8], m[8]) per
    super-block (6-bit values)."""
    s = scales.astype(np.uint32)
    sc = np.empty((s.shape[0], 8), np.int32)
    m = np.empty((s.shape[0], 8), np.int32)
    for j in range(4):
        sc[:, j] = s[:, j] & 63
        m[:, j] = s[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (s[:, j + 4] & 0xF) | ((s[:, j - 4] >> 6) << 4)
        m[:, j] = (s[:, j + 4] >> 4) | ((s[:, j] >> 6) << 4)
    return sc, m


def _dq_q4_k(blocks):
    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]  # [B,1]
    dmin = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    sc, m = _k_scales_6bit(blocks[:, 4:16])  # [B,8]
    qs = blocks[:, 16:144]  # [B,128]
    out = np.empty((b, 256), np.float32)
    # 4 chunks of 32 bytes; chunk c covers sub-blocks 2c (low nibbles)
    # and 2c+1 (high nibbles)
    for c in range(4):
        chunk = qs[:, c * 32 : (c + 1) * 32]
        lo = (chunk & 0xF).astype(np.float32)
        hi = (chunk >> 4).astype(np.float32)
        s0 = (d * sc[:, 2 * c : 2 * c + 1]).astype(np.float32)
        m0 = (dmin * m[:, 2 * c : 2 * c + 1]).astype(np.float32)
        s1 = (d * sc[:, 2 * c + 1 : 2 * c + 2]).astype(np.float32)
        m1 = (dmin * m[:, 2 * c + 1 : 2 * c + 2]).astype(np.float32)
        out[:, c * 64 : c * 64 + 32] = s0 * lo - m0
        out[:, c * 64 + 32 : c * 64 + 64] = s1 * hi - m1
    return out


def _dq_q5_k(blocks):
    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    dmin = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    sc, m = _k_scales_6bit(blocks[:, 4:16])
    qh = blocks[:, 16:48]  # [B,32] high bits, bit j of byte i → elem
    qs = blocks[:, 48:176]  # [B,128]
    out = np.empty((b, 256), np.float32)
    for c in range(4):
        chunk = qs[:, c * 32 : (c + 1) * 32]
        lo = (chunk & 0xF).astype(np.int32)
        hi = (chunk >> 4).astype(np.int32)
        bit0 = ((qh >> (2 * c)) & 1).astype(np.int32)
        bit1 = ((qh >> (2 * c + 1)) & 1).astype(np.int32)
        q0 = (lo | (bit0 << 4)).astype(np.float32)
        q1 = (hi | (bit1 << 4)).astype(np.float32)
        s0 = (d * sc[:, 2 * c : 2 * c + 1]).astype(np.float32)
        m0 = (dmin * m[:, 2 * c : 2 * c + 1]).astype(np.float32)
        s1 = (d * sc[:, 2 * c + 1 : 2 * c + 2]).astype(np.float32)
        m1 = (dmin * m[:, 2 * c + 1 : 2 * c + 2]).astype(np.float32)
        out[:, c * 64 : c * 64 + 32] = s0 * q0 - m0
        out[:, c * 64 + 32 : c * 64 + 64] = s1 * q1 - m1
    return out


def _dq_q6_k(blocks):
    b = blocks.shape[0]
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    scales = blocks[:, 192:208].view(np.int8).astype(np.float32)  # [B,16]
    d = _f16(blocks[:, 208:210].reshape(-1))[:, None]
    out = np.empty((b, 256), np.float32)
    # two halves of 128 elements
    for h in range(2):
        ql_h = ql[:, h * 64 : (h + 1) * 64]
        qh_h = qh[:, h * 32 : (h + 1) * 32]
        lo = (ql_h & 0xF).astype(np.int32)  # [B,64]: elems n..n+63 low
        hi = (ql_h >> 4).astype(np.int32)  # elems n+64..n+127... see below
        # element l in [0,32): q = lo[l]   | ((qh>> 0)&3)<<4
        #           l in [32,64): q = lo[l] | ((qh>> 2... pattern:
        q1 = (lo[:, :32] | (((qh_h >> 0) & 3) << 4)) - 32
        q2 = (lo[:, 32:] | (((qh_h >> 2) & 3) << 4)) - 32
        q3 = (hi[:, :32] | (((qh_h >> 4) & 3) << 4)) - 32
        q4 = (hi[:, 32:] | (((qh_h >> 6) & 3) << 4)) - 32
        base = h * 128
        sb = scales[:, h * 8 : (h + 1) * 8]  # 8 sub-scales of 16 elems
        qcat = np.concatenate([q1, q2, q3, q4], axis=1).astype(np.float32)  # [B,128]
        s_expand = np.repeat(sb, 16, axis=1)  # [B,128]
        out[:, base : base + 128] = d * s_expand * qcat
    return out


def _dq_q2_k(blocks):
    b = blocks.shape[0]
    scales = blocks[:, 0:16]  # 4-bit sc | 4-bit m per 16-elem sub-block
    qs = blocks[:, 16:80]  # [B,64] 2-bit packed
    d = _f16(blocks[:, 80:82].reshape(-1))[:, None]
    dmin = _f16(blocks[:, 82:84].reshape(-1))[:, None]
    sc = (scales & 0xF).astype(np.float32)  # [B,16]
    mn = (scales >> 4).astype(np.float32)
    out = np.empty((b, 256), np.float32)
    # 2 halves of 128; within each half, shift cycles over 32-byte chunk
    for h in range(2):
        chunk = qs[:, h * 32 : (h + 1) * 32]  # [B,32]
        for s in range(4):  # shifts 0,2,4,6 → 32 elems each
            q = ((chunk >> (2 * s)) & 3).astype(np.float32)
            sub = h * 8 + s * 2  # two 16-elem sub-blocks per 32 elems
            dl = (d * sc[:, sub : sub + 1]).astype(np.float32)
            ml = (dmin * mn[:, sub : sub + 1]).astype(np.float32)
            dl2 = (d * sc[:, sub + 1 : sub + 2]).astype(np.float32)
            ml2 = (dmin * mn[:, sub + 1 : sub + 2]).astype(np.float32)
            base = h * 128 + s * 32
            out[:, base : base + 16] = dl * q[:, :16] - ml
            out[:, base + 16 : base + 32] = dl2 * q[:, 16:] - ml2
    return out


def _dq_q3_k(blocks):
    b = blocks.shape[0]
    hmask = blocks[:, 0:32]
    qs = blocks[:, 32:96]
    scales_raw = blocks[:, 96:108].astype(np.uint32)
    d = _f16(blocks[:, 108:110].reshape(-1))[:, None]
    # 6-bit scales: 16 values packed into 12 bytes (llama.cpp layout):
    # low 4 bits of sc[j]: bytes 0..7 (two per byte... actual layout:
    # sc[j] (j<8) = (scales[j] & 0xF) | (((scales[8 + j//2] >> (4*(j%2)... )
    sc = np.empty((b, 16), np.int32)
    a = scales_raw
    for j in range(8):
        sc[:, j] = a[:, j] & 0xF
        sc[:, j + 8] = a[:, j] >> 4
    for j in range(16):
        hi2 = (a[:, 8 + (j % 4)] >> (2 * (j // 4))) & 3
        sc[:, j] |= hi2 << 4
    sc = (sc - 32).astype(np.float32)
    out = np.empty((b, 256), np.float32)
    for h in range(2):
        chunk = qs[:, h * 32 : (h + 1) * 32]
        for s in range(4):
            q = ((chunk >> (2 * s)) & 3).astype(np.int32)
            bitpos = h * 4 + s
            hbit = ((hmask >> bitpos) & 1).astype(np.int32)
            qv = (q - (hbit ^ 1) * 4).astype(np.float32)  # subtract 4 if high bit NOT set
            sub = h * 8 + s * 2
            base = h * 128 + s * 32
            out[:, base : base + 16] = d * sc[:, sub : sub + 1] * qv[:, :16]
            out[:, base + 16 : base + 32] = (
                d * sc[:, sub + 1 : sub + 2] * qv[:, 16:]
            )
    return out


# IQ4 non-linear codebook (public ggml constant, kvalues_iq4nl)
IQ4_KVALUES = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    np.int32,
)


def _dq_iq4_nl(blocks):
    """IQ4_NL: 32-elem block {f16 d; u8 qs[16]}; w = d * kvalues[nibble]
    (reference quantization/gguf/iq/mod.rs + iq_dequant.cu, ADR 0025)."""
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    lo, hi = _nibbles(blocks[:, 2:18])
    q = np.concatenate([lo, hi], axis=1)  # elems 0..15 then 16..31
    return d * IQ4_KVALUES[q]


def _dq_iq4_xs(blocks):
    """IQ4_XS: 256-elem super-block {f16 d; u16 scales_h; u8 scales_l[4];
    u8 qs[128]}; sub-block ib of 32: ls = (l4 | (h2<<4)) - 32;
    w = d * ls * kvalues[nibble]."""
    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    scales_h = blocks[:, 2:4].view(np.uint16).reshape(-1).astype(np.uint32)
    scales_l = blocks[:, 4:8].astype(np.uint32)
    qs = blocks[:, 8:136]
    out = np.empty((b, 256), np.float32)
    for ib in range(8):
        l4 = (scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF
        h2 = (scales_h >> (2 * ib)) & 3
        ls = (l4 | (h2 << 4)).astype(np.int32) - 32
        dl = (d[:, 0] * ls)[:, None]
        chunk = qs[:, 16 * ib : 16 * (ib + 1)]
        out[:, 32 * ib : 32 * ib + 16] = dl * IQ4_KVALUES[chunk & 0xF]
        out[:, 32 * ib + 16 : 32 * ib + 32] = dl * IQ4_KVALUES[chunk >> 4]
    return out


# ---------------------------------------------------------------------------
# I-quants (IQ2_XS / IQ2_S / IQ3_XXS / IQ3_S): codebook-grid quants.
# Layouts per the public ggml spec; grids in iq_grids.py (format constants).
# Reference behavior: quantization/gguf/iq/mod.rs dequant_* (ADR 0025).
# ---------------------------------------------------------------------------


def _dq_iq2_xs(blocks):
    """IQ2_XS 74B block: {f16 d; u16 qs[32]; u8 scales[8]}. Each u16 =
    9-bit grid index + 7-bit ksigns index; scale nibble per 16 elems."""
    from .iq_grids import IQ2XS_GRID, SIGNS8

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))  # [B]
    qs = blocks[:, 2:66].copy().view(np.uint16).reshape(b, 8, 4)
    scales = blocks[:, 66:74]  # [B, 8]
    db = np.stack(
        [
            d[:, None] * (0.5 + (scales & 0xF)) * 0.25,
            d[:, None] * (0.5 + (scales >> 4)) * 0.25,
        ],
        axis=-1,
    )  # [B, 8, 2]
    dbl = db[:, :, [0, 0, 1, 1]]  # per-l sub-scale, [B, 8, 4]
    grid = IQ2XS_GRID[qs & 511].astype(np.float32)  # [B, 8, 4, 8]
    sgn = SIGNS8[qs >> 9]  # [B, 8, 4, 8]
    return (dbl[..., None] * grid * sgn).reshape(b, 256)


def _dq_iq2_s(blocks):
    """IQ2_S 82B block: {f16 d; u8 qs[32]; u8 signs[32]; u8 qh[8];
    u8 scales[8]}. 10-bit grid index = qs | qh bits; raw sign bytes."""
    from .iq_grids import IQ2S_GRID, SIGN_LUT

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:34].reshape(b, 8, 4).astype(np.int32)
    signs = blocks[:, 34:66].reshape(b, 8, 4)
    qh = blocks[:, 66:74].astype(np.int32)  # [B, 8]
    scales = blocks[:, 74:82]
    shifts = np.array([8, 6, 4, 2])  # (qh << (8-2l)) & 0x300
    idx = qs | ((qh[:, :, None] << shifts[None, None, :]) & 0x300)
    db = np.stack(
        [
            d[:, None] * (0.5 + (scales & 0xF)) * 0.25,
            d[:, None] * (0.5 + (scales >> 4)) * 0.25,
        ],
        axis=-1,
    )
    dbl = db[:, :, [0, 0, 1, 1]]
    grid = IQ2S_GRID[idx].astype(np.float32)  # [B, 8, 4, 8]
    sgn = SIGN_LUT[signs]  # [B, 8, 4, 8]
    return (dbl[..., None] * grid * sgn).reshape(b, 256)


def _dq_iq3_xxs(blocks):
    """IQ3_XXS 98B block: {f16 d; u8 qs[64]; u32 sas[8]}. Per 32-elem
    group: 8 grid bytes + one aux u32 = 4x7-bit ksigns + 4-bit scale."""
    from .iq_grids import IQ3XXS_GRID, SIGNS8

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:66].reshape(b, 8, 4, 2)  # [B, ib32, l, pair]
    aux = blocks[:, 66:98].copy().view(np.uint32)  # [B, 8]
    db = d[:, None] * (0.5 + (aux >> 28)) * 0.5  # [B, 8]
    ls = np.arange(4)
    ks = (aux[:, :, None] >> (7 * ls)[None, None, :]) & 127  # [B, 8, 4]
    sgn = SIGNS8[ks]  # [B, 8, 4, 8]
    grid = IQ3XXS_GRID[qs].astype(np.float32).reshape(b, 8, 4, 8)
    return (db[:, :, None, None] * grid * sgn).reshape(b, 256)


def _dq_iq3_s(blocks):
    """IQ3_S 110B block: {f16 d; u8 qs[64]; u8 qh[8]; u8 signs[32];
    u8 scales[4]}. 9-bit grid index; scale nibble shared per 2 groups."""
    from .iq_grids import IQ3S_GRID, SIGN_LUT

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:66].reshape(b, 8, 8).astype(np.int32)
    qh = blocks[:, 66:74].astype(np.int32)  # [B, 8] (one byte per ib32)
    signs = blocks[:, 74:106].reshape(b, 8, 4)
    scales = blocks[:, 106:110].astype(np.int32)  # [B, 4]
    nib = np.stack(
        [scales & 0xF, scales >> 4], axis=-1
    ).reshape(b, 8)  # per-ib32 4-bit scale
    db = d[:, None] * (1 + 2 * nib)  # [B, 8]
    # element pair l: idx1 = qs[2l] | ((qh << (8-2l)) & 256),
    #                 idx2 = qs[2l+1] | ((qh << (7-2l)) & 256)
    sh1 = np.array([8, 6, 4, 2])
    sh2 = np.array([7, 5, 3, 1])
    idx1 = qs[:, :, 0::2] | ((qh[:, :, None] << sh1[None, None, :]) & 256)
    idx2 = qs[:, :, 1::2] | ((qh[:, :, None] << sh2[None, None, :]) & 256)
    g1 = IQ3S_GRID[idx1].astype(np.float32)  # [B, 8, 4, 4]
    g2 = IQ3S_GRID[idx2].astype(np.float32)
    grid = np.concatenate([g1, g2], axis=-1)  # [B, 8, 4, 8]
    sgn = SIGN_LUT[signs]
    return (db[:, :, None, None] * grid * sgn).reshape(b, 256)


_DEQUANT = {
    "F32": _dq_f32,
    "F16": _dq_f16,
    "BF16": _dq_bf16,
    "IQ4_NL": _dq_iq4_nl,
    "IQ4_XS": _dq_iq4_xs,
    "IQ2_XS": _dq_iq2_xs,
    "IQ2_S": _dq_iq2_s,
    "IQ3_XXS": _dq_iq3_xxs,
    "IQ3_S": _dq_iq3_s,
    "Q4_0": _dq_q4_0,
    "Q4_1": _dq_q4_1,
    "Q5_0": _dq_q5_0,
    "Q5_1": _dq_q5_1,
    "Q8_0": _dq_q8_0,
    "Q2_K": _dq_q2_k,
    "Q3_K": _dq_q3_k,
    "Q4_K": _dq_q4_k,
    "Q5_K": _dq_q5_k,
    "Q6_K": _dq_q6_k,
}


# ---------------------------------------------------------------------------
# Exact int8 + per-16-group scale/zero extraction.
#
# Every GGML block format is `w[i] = s_g * q[i] - z_g` with a small integer
# q (|q| <= 127) and per-group (16 or coarser) float scale/zero, so the
# whole family maps EXACTLY onto one w8a16 fused kernel
# (ops/pallas/int8_matmul.py) at int8 HBM bandwidth — the TPU analogue of
# the reference's per-format MMVQ kernels (iq_dequant.cu q8_1 path,
# ADR 0025). Extractors return (q int8 [B,256|32], s [B,blk/16] f32,
# z [B,blk/16] f32 | None); dequant == repeat(s,16)*q - repeat(z,16).
# ---------------------------------------------------------------------------


def _x8_iq2_xs(blocks):
    from .iq_grids import IQ2XS_GRID, SIGNS8

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:66].copy().view(np.uint16).reshape(b, 8, 4)
    scales = blocks[:, 66:74]
    s = np.stack(
        [
            d[:, None] * (0.5 + (scales & 0xF)) * 0.25,
            d[:, None] * (0.5 + (scales >> 4)) * 0.25,
        ],
        axis=-1,
    ).reshape(b, 16)
    q = (
        IQ2XS_GRID[qs & 511].astype(np.float32) * SIGNS8[qs >> 9]
    ).reshape(b, 256)
    return q.astype(np.int8), s, None


def _x8_iq2_s(blocks):
    from .iq_grids import IQ2S_GRID, SIGN_LUT

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:34].reshape(b, 8, 4).astype(np.int32)
    signs = blocks[:, 34:66].reshape(b, 8, 4)
    qh = blocks[:, 66:74].astype(np.int32)
    scales = blocks[:, 74:82]
    shifts = np.array([8, 6, 4, 2])
    idx = qs | ((qh[:, :, None] << shifts[None, None, :]) & 0x300)
    s = np.stack(
        [
            d[:, None] * (0.5 + (scales & 0xF)) * 0.25,
            d[:, None] * (0.5 + (scales >> 4)) * 0.25,
        ],
        axis=-1,
    ).reshape(b, 16)
    q = (IQ2S_GRID[idx].astype(np.float32) * SIGN_LUT[signs]).reshape(b, 256)
    return q.astype(np.int8), s, None


def _x8_iq3_xxs(blocks):
    from .iq_grids import IQ3XXS_GRID, SIGNS8

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:66].reshape(b, 8, 4, 2)
    aux = blocks[:, 66:98].copy().view(np.uint32)
    db = d[:, None] * (0.5 + (aux >> 28)) * 0.5  # [B, 8] per-32
    ks = (aux[:, :, None] >> (7 * np.arange(4))[None, None, :]) & 127
    grid = IQ3XXS_GRID[qs].astype(np.float32).reshape(b, 8, 4, 8)
    q = (grid * SIGNS8[ks]).reshape(b, 256)
    return q.astype(np.int8), np.repeat(db, 2, axis=1), None


def _x8_iq3_s(blocks):
    from .iq_grids import IQ3S_GRID, SIGN_LUT

    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    qs = blocks[:, 2:66].reshape(b, 8, 8).astype(np.int32)
    qh = blocks[:, 66:74].astype(np.int32)
    signs = blocks[:, 74:106].reshape(b, 8, 4)
    scales = blocks[:, 106:110].astype(np.int32)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(b, 8)
    db = d[:, None] * (1 + 2 * nib)
    sh1, sh2 = np.array([8, 6, 4, 2]), np.array([7, 5, 3, 1])
    idx1 = qs[:, :, 0::2] | ((qh[:, :, None] << sh1[None, None, :]) & 256)
    idx2 = qs[:, :, 1::2] | ((qh[:, :, None] << sh2[None, None, :]) & 256)
    grid = np.concatenate(
        [IQ3S_GRID[idx1], IQ3S_GRID[idx2]], axis=-1
    ).astype(np.float32)
    q = (grid * SIGN_LUT[signs]).reshape(b, 256)
    return q.astype(np.int8), np.repeat(db, 2, axis=1), None


def _x8_iq4_nl(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]  # per-32 block
    lo, hi = _nibbles(blocks[:, 2:18])
    q = np.concatenate([lo, hi], axis=1)
    return (
        IQ4_KVALUES[q].astype(np.int8),
        np.repeat(d, 2, axis=1).astype(np.float32),
        None,
    )


def _x8_iq4_xs(blocks):
    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))
    scales_h = blocks[:, 2:4].copy().view(np.uint16).reshape(-1).astype(np.uint32)
    scales_l = blocks[:, 4:8].astype(np.uint32)
    qs = blocks[:, 8:136]
    q = np.empty((b, 256), np.int8)
    s = np.empty((b, 8), np.float32)
    for ib in range(8):
        l4 = (scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF
        h2 = (scales_h >> (2 * ib)) & 3
        s[:, ib] = d * ((l4 | (h2 << 4)).astype(np.int32) - 32)
        chunk = qs[:, 16 * ib : 16 * (ib + 1)]
        q[:, 32 * ib : 32 * ib + 16] = IQ4_KVALUES[chunk & 0xF]
        q[:, 32 * ib + 16 : 32 * ib + 32] = IQ4_KVALUES[chunk >> 4]
    return q, np.repeat(s, 2, axis=1), None


def _x8_q8_0(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    q = blocks[:, 2:34].copy().view(np.int8)
    return q, np.repeat(d, 2, axis=1).astype(np.float32), None


def _x8_q4_0(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    lo, hi = _nibbles(blocks[:, 2:18])
    q = np.concatenate([lo, hi], axis=1) - 8
    return q.astype(np.int8), np.repeat(d, 2, axis=1).astype(np.float32), None


def _x8_q4_1(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    m = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    lo, hi = _nibbles(blocks[:, 4:20])
    q = np.concatenate([lo, hi], axis=1)
    return (
        q.astype(np.int8),
        np.repeat(d, 2, axis=1).astype(np.float32),
        np.repeat(-m, 2, axis=1).astype(np.float32),
    )


def _x8_q5_0(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    qh = blocks[:, 2:6].copy().view(np.uint32).reshape(-1)
    lo, hi = _nibbles(blocks[:, 6:22])
    j = np.arange(16)
    b_lo = ((qh[:, None] >> j) & 1).astype(np.int32)
    b_hi = ((qh[:, None] >> (j + 16)) & 1).astype(np.int32)
    q = np.concatenate([lo | (b_lo << 4), hi | (b_hi << 4)], axis=1) - 16
    return q.astype(np.int8), np.repeat(d, 2, axis=1).astype(np.float32), None


def _x8_q5_1(blocks):
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    m = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    qh = blocks[:, 4:8].copy().view(np.uint32).reshape(-1)
    lo, hi = _nibbles(blocks[:, 8:24])
    j = np.arange(16)
    b_lo = ((qh[:, None] >> j) & 1).astype(np.int32)
    b_hi = ((qh[:, None] >> (j + 16)) & 1).astype(np.int32)
    q = np.concatenate([lo | (b_lo << 4), hi | (b_hi << 4)], axis=1)
    return (
        q.astype(np.int8),
        np.repeat(d, 2, axis=1).astype(np.float32),
        np.repeat(-m, 2, axis=1).astype(np.float32),
    )


def _x8_q2_k(blocks):
    b = blocks.shape[0]
    scales = blocks[:, 0:16]
    qs = blocks[:, 16:80]
    d = _f16(blocks[:, 80:82].reshape(-1))[:, None]
    dmin = _f16(blocks[:, 82:84].reshape(-1))[:, None]
    s = (d * (scales & 0xF)).astype(np.float32)  # [B, 16] per-16
    z = (dmin * (scales >> 4)).astype(np.float32)
    q = np.empty((b, 256), np.int8)
    for h in range(2):
        chunk = qs[:, h * 32 : (h + 1) * 32]
        for sh in range(4):
            q[:, h * 128 + sh * 32 : h * 128 + (sh + 1) * 32] = (
                (chunk >> (2 * sh)) & 3
            )
    return q, s, z


def _x8_q3_k(blocks):
    b = blocks.shape[0]
    hmask = blocks[:, 0:32]
    qs = blocks[:, 32:96]
    a = blocks[:, 96:108].astype(np.uint32)
    d = _f16(blocks[:, 108:110].reshape(-1))[:, None]
    sc = np.empty((b, 16), np.int32)
    for j in range(8):
        sc[:, j] = a[:, j] & 0xF
        sc[:, j + 8] = a[:, j] >> 4
    for j in range(16):
        sc[:, j] |= ((a[:, 8 + (j % 4)] >> (2 * (j // 4))) & 3) << 4
    s = (d * (sc - 32)).astype(np.float32)
    q = np.empty((b, 256), np.int8)
    for h in range(2):
        chunk = qs[:, h * 32 : (h + 1) * 32]
        for sh in range(4):
            qv = ((chunk >> (2 * sh)) & 3).astype(np.int32)
            hbit = ((hmask >> (h * 4 + sh)) & 1).astype(np.int32)
            q[:, h * 128 + sh * 32 : h * 128 + (sh + 1) * 32] = qv - (
                hbit ^ 1
            ) * 4
    return q, s, None


def _x8_q4_k(blocks):
    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    dmin = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    sc, m = _k_scales_6bit(blocks[:, 4:16])
    qs = blocks[:, 16:144]
    s32 = (d * sc).astype(np.float32)  # [B, 8] per-32
    z32 = (dmin * m).astype(np.float32)
    q = np.empty((b, 256), np.int8)
    for c in range(4):
        chunk = qs[:, c * 32 : (c + 1) * 32]
        q[:, c * 64 : c * 64 + 32] = chunk & 0xF
        q[:, c * 64 + 32 : c * 64 + 64] = chunk >> 4
    return q, np.repeat(s32, 2, axis=1), np.repeat(z32, 2, axis=1)


def _x8_q5_k(blocks):
    b = blocks.shape[0]
    d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
    dmin = _f16(blocks[:, 2:4].reshape(-1))[:, None]
    sc, m = _k_scales_6bit(blocks[:, 4:16])
    qh = blocks[:, 16:48]
    qs = blocks[:, 48:176]
    s32 = (d * sc).astype(np.float32)
    z32 = (dmin * m).astype(np.float32)
    q = np.empty((b, 256), np.int8)
    for c in range(4):
        chunk = qs[:, c * 32 : (c + 1) * 32]
        bit0 = ((qh >> (2 * c)) & 1).astype(np.int32)
        bit1 = ((qh >> (2 * c + 1)) & 1).astype(np.int32)
        q[:, c * 64 : c * 64 + 32] = (chunk & 0xF) | (bit0 << 4)
        q[:, c * 64 + 32 : c * 64 + 64] = (chunk >> 4) | (bit1 << 4)
    return q, np.repeat(s32, 2, axis=1), np.repeat(z32, 2, axis=1)


def _x8_q6_k(blocks):
    b = blocks.shape[0]
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    scales = blocks[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = _f16(blocks[:, 208:210].reshape(-1))[:, None]
    s = (d * scales).astype(np.float32)  # [B, 16] per-16
    q = np.empty((b, 256), np.int8)
    for h in range(2):
        ql_h = ql[:, h * 64 : (h + 1) * 64]
        qh_h = qh[:, h * 32 : (h + 1) * 32]
        lo = (ql_h & 0xF).astype(np.int32)
        hi = (ql_h >> 4).astype(np.int32)
        base = h * 128
        q[:, base : base + 32] = (lo[:, :32] | (((qh_h >> 0) & 3) << 4)) - 32
        q[:, base + 32 : base + 64] = (
            lo[:, 32:] | (((qh_h >> 2) & 3) << 4)
        ) - 32
        q[:, base + 64 : base + 96] = (
            hi[:, :32] | (((qh_h >> 4) & 3) << 4)
        ) - 32
        q[:, base + 96 : base + 128] = (
            hi[:, 32:] | (((qh_h >> 6) & 3) << 4)
        ) - 32
    return q, s, None


_INT8_GROUPED = {
    "IQ2_XS": _x8_iq2_xs,
    "IQ2_S": _x8_iq2_s,
    "IQ3_XXS": _x8_iq3_xxs,
    "IQ3_S": _x8_iq3_s,
    "IQ4_NL": _x8_iq4_nl,
    "IQ4_XS": _x8_iq4_xs,
    "Q8_0": _x8_q8_0,
    "Q4_0": _x8_q4_0,
    "Q4_1": _x8_q4_1,
    "Q5_0": _x8_q5_0,
    "Q5_1": _x8_q5_1,
    "Q2_K": _x8_q2_k,
    "Q3_K": _x8_q3_k,
    "Q4_K": _x8_q4_k,
    "Q5_K": _x8_q5_k,
    "Q6_K": _x8_q6_k,
}


def dequant_int8_grouped(
    raw: np.ndarray, ggml_type: int, n_elems: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None] | None:
    """Exact (q int8 [n], s f32 [n/16], z f32 [n/16] | None) extraction,
    or None if the format has no int8 mapping (float types)."""
    name, be, bb = GGML_TYPES[ggml_type]
    fn = _INT8_GROUPED.get(name)
    if fn is None:
        return None
    blocks = raw.reshape(n_elems // be, bb)
    q, s, z = fn(blocks)
    return (
        q.reshape(-1),
        s.reshape(-1),
        z.reshape(-1) if z is not None else None,
    )
