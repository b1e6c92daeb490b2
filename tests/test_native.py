"""Native C++ dequant vs numpy reference equivalence."""

import numpy as np
import pytest

from vllm_rust_tpu.native import get_lib, native_dequant, native_extract_q4k
from vllm_rust_tpu.quantization.gguf_file import GGML_TYPES, _DEQUANT

rng = np.random.default_rng(7)

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def _random_blocks(tname, ttype, n_blocks=16):
    _, be, bb = GGML_TYPES[ttype]
    raw = rng.integers(0, 256, size=n_blocks * bb, dtype=np.uint8)
    # bound the f16 scale fields so values stay finite
    b = bytearray(raw.tobytes())
    d16 = np.float16(0.25).tobytes()
    for i in range(n_blocks):
        if tname == "Q6_K":
            b[i * bb + 208 : i * bb + 210] = d16
        else:
            b[i * bb : i * bb + 2] = d16
            if tname in ("Q4_K", "Q5_K"):
                b[i * bb + 2 : i * bb + 4] = np.float16(0.125).tobytes()
    return np.frombuffer(bytes(b), np.uint8), be * n_blocks


@needs_native
@pytest.mark.parametrize(
    "tname,ttype",
    [("Q4_0", 2), ("Q8_0", 8), ("Q4_K", 12), ("Q5_K", 13), ("Q6_K", 14)],
)
def test_native_matches_numpy(tname, ttype):
    raw, n = _random_blocks(tname, ttype)
    got = native_dequant(tname, raw, n)
    _, be, bb = GGML_TYPES[ttype]
    want = _DEQUANT[tname](raw.reshape(n // be, bb)).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@needs_native
def test_native_extract_q4k_matches_dequant():
    raw, n = _random_blocks("Q4_K", 12)
    q, s, zs = native_extract_q4k(raw, n)
    # recombine: w = q * s_group - zs_group must equal full dequant
    w = q.astype(np.float32) * np.repeat(s, 32) - np.repeat(zs, 32)
    want = native_dequant("Q4_K", raw, n)
    np.testing.assert_allclose(w, want, rtol=1e-6, atol=1e-6)
