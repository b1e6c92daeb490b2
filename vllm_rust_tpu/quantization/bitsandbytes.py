"""BitsAndBytes NF4 / FP4 / blockwise-INT8 checkpoint loading.

Reference: quantization/bitsandbytes.rs + bnb_fused_matmul.cu. BnB
serializes each quantized linear as:
  {p}.weight                         uint8 packed nibbles (4-bit) or codes
  {p}.weight.absmax                  f32 [nblocks] (or uint8 if nested)
  {p}.weight.quant_map               f32 [16] codebook
  {p}.weight.nested_absmax           f32 (double-quant outer scales)
  {p}.weight.nested_quant_map        f32 [256]
  {p}.weight.quant_state.bitsandbytes__{nf4,fp4,int8}  uint8 JSON blob
     (shape, blocksize, nested offset, dtype)

Dequant math: w[i] = quant_map[code_i] * absmax[i // blocksize]; with
double quant, absmax itself is blockwise-int8: absmax = nested_quant_map
[code] * nested_absmax[j // nested_blocksize] + offset.

TPU strategy: dequantize to bf16 at load (the MXU path); BnB's blockwise
codes are non-affine (NF4 levels are quantile-spaced), so there is no
exact int8+scale mapping — memory-tight deployments should prefer the
AWQ/GPTQ/GGUF paths.
"""

from __future__ import annotations

import json

import numpy as np

# public NF4/FP4 codebooks (QLoRA paper / bitsandbytes functional.py)
NF4_TABLE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367,
        -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
        -0.09105003625154495, 0.0, 0.07958029955625534,
        0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
        0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
    ],
    np.float32,
)
FP4_TABLE = np.array(
    [0.0, 0.0052083333, 0.6666667, 1.0, 0.3333333, 0.5, 0.1666667, 0.25,
     -0.0, -0.0052083333, -0.6666667, -1.0, -0.3333333, -0.5, -0.1666667,
     -0.25],
    np.float32,
)


def parse_quant_state(blob: np.ndarray) -> dict:
    """The quant_state tensor is a uint8 buffer holding JSON."""
    try:
        return json.loads(bytes(np.asarray(blob, np.uint8).tobytes()))
    except Exception:
        return {}


def dequant_blockwise_absmax(
    absmax: np.ndarray,
    nested_absmax: np.ndarray | None,
    nested_quant_map: np.ndarray | None,
    offset: float,
    nested_blocksize: int = 256,
) -> np.ndarray:
    """Undo double quantization of the absmax vector."""
    if absmax.dtype != np.uint8 or nested_quant_map is None:
        return np.asarray(absmax, np.float32)
    codes = np.asarray(absmax, np.uint8)
    vals = np.asarray(nested_quant_map, np.float32)[codes]
    outer = np.repeat(
        np.asarray(nested_absmax, np.float32), nested_blocksize
    )[: codes.size]
    return vals * outer + np.float32(offset)


def dequant_bnb_4bit(
    packed: np.ndarray,  # uint8 [n/2] (or [n/2, 1])
    absmax: np.ndarray,  # f32 [n/blocksize]
    quant_map: np.ndarray,  # f32 [16]
    shape: tuple[int, int],
    blocksize: int = 64,
) -> np.ndarray:
    """4-bit blockwise dequant. BnB packs the FIRST element in the HIGH
    nibble: w[2i] = map[b >> 4], w[2i+1] = map[b & 0xF]."""
    packed = np.asarray(packed, np.uint8).reshape(-1)
    qm = np.asarray(quant_map, np.float32)
    vals = np.stack([qm[packed >> 4], qm[packed & 0xF]], axis=1).reshape(-1)
    n = int(np.prod(shape))
    vals = vals[:n]
    scale = np.repeat(np.asarray(absmax, np.float32), blocksize)[:n]
    return (vals * scale).reshape(shape)


def dequant_bnb_int8(
    codes: np.ndarray,  # uint8/int8 [out, in] linear-quant codes
    scb: np.ndarray,  # f32 [out] per-row absmax (SCB)
) -> np.ndarray:
    """LLM.int8() storage: w = code * SCB_row / 127."""
    q = np.asarray(codes).astype(np.int8).astype(np.float32)
    return q * (np.asarray(scb, np.float32)[:, None] / 127.0)


def load_bnb_linear(parts: dict[str, np.ndarray]) -> np.ndarray | None:
    """Assemble one linear's dense f32 [out, in] weight from its BnB
    tensor group, or None if the group is not quantized."""
    w = parts.get("weight")
    if w is None:
        return None
    state_key = next(
        (k for k in parts if k.startswith("weight.quant_state")), None
    )
    if state_key is None:
        if "SCB" in parts:  # 8-bit path
            return dequant_bnb_int8(w, parts["SCB"])
        return None  # plain dense
    state = parse_quant_state(parts[state_key])
    shape = tuple(state.get("shape", ()))
    if not shape:
        raise ValueError("bitsandbytes quant_state lacks a shape")
    blocksize = int(state.get("blocksize", 64))
    qm = parts.get("weight.quant_map")
    if qm is None:
        qm = NF4_TABLE if state_key.endswith("nf4") else FP4_TABLE
    absmax = dequant_blockwise_absmax(
        parts["weight.absmax"],
        parts.get("weight.nested_absmax"),
        parts.get("weight.nested_quant_map"),
        float(state.get("nested_offset", 0.0)),
        int(state.get("nested_blocksize", 256)),
    )
    return dequant_bnb_4bit(w, absmax, qm, shape, blocksize)
