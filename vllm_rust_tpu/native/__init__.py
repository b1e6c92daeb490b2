"""Native (C++) runtime components, loaded via ctypes.

Reference: the reference's native surface is its Rust crates + CUDA; our
TPU compute path is JAX/XLA/Pallas, and the host-side hot loops that the
GIL/numpy can't serve (GGUF dequant of multi-GB checkpoints) live here as
C++ compiled on demand (g++ -O3 -shared). Build artifacts are cached
next to the sources keyed by a source hash; every native entry point has
a pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "ggml_dequant.cpp")
_LIB = None
_TRIED = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "VLLM_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "vllm_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"ggml_dequant_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", so_path + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("native build failed (%s); using numpy fallback", e)
        return None


def get_lib():
    """The loaded native library, or None (fallback to numpy paths)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VLLM_TPU_NO_NATIVE") == "1":
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    for name in ("dq_q4_0", "dq_q8_0", "dq_q4_k", "dq_q5_k", "dq_q6_k"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, f32p, ctypes.c_int64]
        fn.restype = None
    lib.extract_q4_k.argtypes = [u8p, u8p, f32p, f32p, ctypes.c_int64]
    lib.extract_q4_k.restype = None
    _LIB = lib
    return _LIB


_NATIVE_FNS = {
    "Q4_0": ("dq_q4_0", 32, 18),
    "Q8_0": ("dq_q8_0", 32, 34),
    "Q4_K": ("dq_q4_k", 256, 144),
    "Q5_K": ("dq_q5_k", 256, 176),
    "Q6_K": ("dq_q6_k", 256, 210),
}


def native_dequant(type_name: str, raw: np.ndarray, n_elems: int):
    """Dequantize via the native library; None if unavailable."""
    lib = get_lib()
    if lib is None or type_name not in _NATIVE_FNS:
        return None
    fn_name, be, bb = _NATIVE_FNS[type_name]
    out = np.empty(n_elems, np.float32)
    raw = np.ascontiguousarray(raw)
    getattr(lib, fn_name)(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_elems // be,
    )
    return out


def native_extract_q4k(raw: np.ndarray, n_elems: int):
    """(q_vals uint8 [N], scales f32 [N/32], zs f32 [N/32]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    nb = n_elems // 256
    q = np.empty(n_elems, np.uint8)
    s = np.empty(nb * 8, np.float32)
    zs = np.empty(nb * 8, np.float32)
    raw = np.ascontiguousarray(raw)
    lib.extract_q4_k(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nb,
    )
    return q, s, zs
