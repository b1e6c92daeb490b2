"""GGUF parsing + dequantization tests.

Strategy (mirrors reference ADR 0025 golden-vector pinning, adapted for
the zero-egress environment): a minimal independent GGUF *writer* plus
scalar-loop dequant references written directly from the spec validate
the vectorized implementations; an end-to-end test builds a tiny Q4_K
llama GGUF and generates through the engine.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.quantization.gguf_file import (
    GGUFReader,
    dequantize,
)

rng = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# minimal GGUF writer (test-only)
# ---------------------------------------------------------------------------


def _w_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_value(v) -> bytes:
    if isinstance(v, bool):
        return struct.pack("<I?", 7, v)
    if isinstance(v, int):
        return struct.pack("<Iq", 11, v)
    if isinstance(v, float):
        return struct.pack("<If", 6, v)
    if isinstance(v, str):
        return struct.pack("<I", 8) + _w_string(v)
    if isinstance(v, list):  # array of strings or ints
        if v and isinstance(v[0], str):
            out = struct.pack("<IIQ", 9, 8, len(v))
            for s in v:
                out += _w_string(s)
            return out
        out = struct.pack("<IIQ", 9, 11, len(v))
        for x in v:
            out += struct.pack("<q", x)
        return out
    raise TypeError(type(v))


def write_gguf(path, metadata: dict, tensors: list[tuple[str, tuple, int, bytes]]):
    """tensors: (name, ggml_ne_shape, ggml_type, raw_bytes)."""
    align = 32
    out = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), len(metadata))
    for k, v in metadata.items():
        out += _w_string(k) + _w_value(v)
    offset = 0
    blobs = []
    for name, shape, ttype, raw in tensors:
        out += _w_string(name)
        out += struct.pack("<I", len(shape))
        for d in shape:
            out += struct.pack("<Q", d)
        out += struct.pack("<IQ", ttype, offset)
        pad = (-len(raw)) % align
        blobs.append(raw + b"\0" * pad)
        offset += len(raw) + pad
    pad = (-len(out)) % align
    out += b"\0" * pad
    for b in blobs:
        out += b
    with open(path, "wb") as f:
        f.write(out)


# ---------------------------------------------------------------------------
# scalar spec references
# ---------------------------------------------------------------------------


def ref_q4_0(raw: bytes, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    for b in range(n // 32):
        blk = raw[b * 18 : (b + 1) * 18]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        for j in range(16):
            q = blk[2 + j]
            out[b * 32 + j] = d * ((q & 0xF) - 8)
            out[b * 32 + j + 16] = d * ((q >> 4) - 8)
    return out


def ref_q8_0(raw: bytes, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    for b in range(n // 32):
        blk = raw[b * 34 : (b + 1) * 34]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        q = np.frombuffer(blk[2:34], np.int8)
        out[b * 32 : (b + 1) * 32] = d * q.astype(np.float32)
    return out


def ref_q4_k(raw: bytes, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 144 : (b + 1) * 144]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        dmin = np.frombuffer(blk[2:4], np.float16)[0].astype(np.float32)
        sc = np.zeros(8, np.int32)
        mn = np.zeros(8, np.int32)
        s = blk[4:16]
        for j in range(4):
            sc[j] = s[j] & 63
            mn[j] = s[j + 4] & 63
        for j in range(4, 8):
            sc[j] = (s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4)
            mn[j] = (s[j + 4] >> 4) | ((s[j] >> 6) << 4)
        qs = blk[16:144]
        for c in range(4):  # 32-byte chunks → sub-blocks 2c, 2c+1
            for j in range(32):
                byte = qs[c * 32 + j]
                out[b * 256 + c * 64 + j] = d * sc[2 * c] * (byte & 0xF) - dmin * mn[2 * c]
                out[b * 256 + c * 64 + 32 + j] = (
                    d * sc[2 * c + 1] * (byte >> 4) - dmin * mn[2 * c + 1]
                )
    return out


def ref_q6_k(raw: bytes, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 210 : (b + 1) * 210]
        ql = blk[0:128]
        qh = blk[128:192]
        scales = np.frombuffer(blk[192:208], np.int8)
        d = np.frombuffer(blk[208:210], np.float16)[0].astype(np.float32)
        for h in range(2):
            for l in range(32):
                qh_byte = qh[h * 32 + l]
                q1 = (ql[h * 64 + l] & 0xF) | (((qh_byte >> 0) & 3) << 4)
                q2 = (ql[h * 64 + 32 + l] & 0xF) | (((qh_byte >> 2) & 3) << 4)
                q3 = (ql[h * 64 + l] >> 4) | (((qh_byte >> 4) & 3) << 4)
                q4 = (ql[h * 64 + 32 + l] >> 4) | (((qh_byte >> 6) & 3) << 4)
                base = b * 256 + h * 128
                for k, q in enumerate((q1, q2, q3, q4)):
                    idx = base + k * 32 + l
                    sub = h * 8 + (k * 32 + l) // 16
                    out[idx] = d * scales[sub] * (q - 32)
    return out


def _sign(byte: int, j: int) -> float:
    return -1.0 if byte & (1 << j) else 1.0


def ref_iq2_xs(raw: bytes, n: int) -> np.ndarray:
    from vllm_rust_tpu.quantization.iq_grids import IQ2XS_GRID, KSIGNS

    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 74 : (b + 1) * 74]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        qs = np.frombuffer(blk[2:66], np.uint16)
        scales = blk[66:74]
        yi = b * 256
        for ib in range(8):
            db = [
                d * (0.5 + (scales[ib] & 0xF)) * 0.25,
                d * (0.5 + (scales[ib] >> 4)) * 0.25,
            ]
            for l in range(4):
                q = int(qs[4 * ib + l])
                grid = IQ2XS_GRID[q & 511]
                signs = KSIGNS[q >> 9]
                for j in range(8):
                    out[yi] = db[l // 2] * grid[j] * _sign(signs, j)
                    yi += 1
    return out


def ref_iq2_s(raw: bytes, n: int) -> np.ndarray:
    from vllm_rust_tpu.quantization.iq_grids import IQ2S_GRID

    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 82 : (b + 1) * 82]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        qs, signs = blk[2:34], blk[34:66]
        qh, scales = blk[66:74], blk[74:82]
        yi = b * 256
        for ib in range(8):
            db = [
                d * (0.5 + (scales[ib] & 0xF)) * 0.25,
                d * (0.5 + (scales[ib] >> 4)) * 0.25,
            ]
            for l in range(4):
                idx = qs[4 * ib + l] | ((qh[ib] << (8 - 2 * l)) & 0x300)
                grid = IQ2S_GRID[idx]
                sgn = signs[4 * ib + l]
                for j in range(8):
                    out[yi] = db[l // 2] * grid[j] * _sign(sgn, j)
                    yi += 1
    return out


def ref_iq3_xxs(raw: bytes, n: int) -> np.ndarray:
    from vllm_rust_tpu.quantization.iq_grids import IQ3XXS_GRID, KSIGNS

    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 98 : (b + 1) * 98]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        qs = blk[2:66]
        aux = np.frombuffer(blk[66:98], np.uint32)
        yi = b * 256
        for ib in range(8):
            db = d * (0.5 + (int(aux[ib]) >> 28)) * 0.5
            for l in range(4):
                signs = KSIGNS[(int(aux[ib]) >> (7 * l)) & 127]
                g1 = IQ3XXS_GRID[qs[8 * ib + 2 * l]]
                g2 = IQ3XXS_GRID[qs[8 * ib + 2 * l + 1]]
                for j in range(4):
                    out[yi + j] = db * g1[j] * _sign(signs, j)
                    out[yi + j + 4] = db * g2[j] * _sign(signs, j + 4)
                yi += 8
    return out


def ref_iq3_s(raw: bytes, n: int) -> np.ndarray:
    from vllm_rust_tpu.quantization.iq_grids import IQ3S_GRID

    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 110 : (b + 1) * 110]
        d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
        qs, qh = blk[2:66], blk[66:74]
        signs, scales = blk[74:106], blk[106:110]
        yi = b * 256
        for ib in range(8):
            nib = (scales[ib // 2] >> (4 * (ib % 2))) & 0xF
            db = d * (1 + 2 * nib)
            for l in range(4):
                i1 = qs[8 * ib + 2 * l] | ((qh[ib] << (8 - 2 * l)) & 256)
                i2 = qs[8 * ib + 2 * l + 1] | ((qh[ib] << (7 - 2 * l)) & 256)
                g1, g2 = IQ3S_GRID[i1], IQ3S_GRID[i2]
                sgn = signs[4 * ib + l]
                for j in range(4):
                    out[yi + j] = db * g1[j] * _sign(sgn, j)
                    out[yi + j + 4] = db * g2[j] * _sign(sgn, j + 4)
                yi += 8
    return out


@pytest.mark.parametrize(
    "tname,ttype,bb,ref",
    [
        ("Q4_0", 2, 18, ref_q4_0),
        ("Q8_0", 8, 34, ref_q8_0),
        ("Q4_K", 12, 144, ref_q4_k),
        ("Q6_K", 14, 210, ref_q6_k),
        ("IQ2_XS", 17, 74, ref_iq2_xs),
        ("IQ2_S", 22, 82, ref_iq2_s),
        ("IQ3_XXS", 18, 98, ref_iq3_xxs),
        ("IQ3_S", 21, 110, ref_iq3_s),
    ],
)
def test_dequant_matches_scalar_spec(tname, ttype, bb, ref):
    from vllm_rust_tpu.quantization.gguf_file import GGML_TYPES

    be = GGML_TYPES[ttype][1]
    n = be * 4
    raw = rng.integers(0, 256, size=(n // be) * bb, dtype=np.uint8)
    # keep f16 scale fields finite: overwrite d/dmin with small numbers
    raw_b = bytearray(raw.tobytes())
    for b in range(n // be):
        d_bytes = np.float16(0.25).tobytes()
        raw_b[b * bb : b * bb + 2] = d_bytes
        if tname in ("Q4_K",):
            raw_b[b * bb + 2 : b * bb + 4] = np.float16(0.125).tobytes()
        if tname == "Q6_K":
            raw_b[b * bb + 208 : b * bb + 210] = d_bytes
    raw = np.frombuffer(bytes(raw_b), np.uint8)
    got = dequantize(raw, ttype, n)
    want = ref(bytes(raw_b), n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def quantize_q4_k(w: np.ndarray) -> bytes:
    """Test-only Q4_K quantizer (simplified: per-32 scale via max-abs,
    min via min; 6-bit quantized against the super-block max)."""
    n = w.size
    out = b""
    for b in range(n // 256):
        blk = w[b * 256 : (b + 1) * 256].reshape(8, 32)
        mins = np.minimum(blk.min(axis=1), 0.0)
        scales = (blk - mins[:, None]).max(axis=1) / 15.0 + 1e-8
        d = float(scales.max() / 63.0) + 1e-12
        dmin = float((-mins).max() / 63.0) + 1e-12
        sc = np.clip(np.round(scales / d), 0, 63).astype(np.uint8)
        mn = np.clip(np.round(-mins / dmin), 0, 63).astype(np.uint8)
        q = np.clip(
            np.round((blk - (-(dmin * mn[:, None]))) / (d * sc[:, None] + 1e-12)),
            0,
            15,
        ).astype(np.uint8)
        spack = bytearray(12)
        for j in range(4):
            spack[j] = sc[j] | ((sc[j + 4] >> 4) << 6)
            spack[j + 4] = mn[j] | ((mn[j + 4] >> 4) << 6)
            spack[j + 8] = (sc[j + 4] & 0xF) | ((mn[j + 4] & 0xF) << 4)
        qs = bytearray(128)
        for c in range(4):
            for j in range(32):
                qs[c * 32 + j] = q[2 * c, j] | (q[2 * c + 1, j] << 4)
        out += (
            np.float16(d).tobytes()
            + np.float16(dmin).tobytes()
            + bytes(spack)
            + bytes(qs)
        )
    return out


def test_q4k_quant_roundtrip():
    w = (rng.normal(size=512) * 0.1).astype(np.float32)
    raw = np.frombuffer(quantize_q4_k(w), np.uint8)
    deq = dequantize(raw, 12, 512)
    err = np.abs(deq - w).mean() / (np.abs(w).mean() + 1e-9)
    # expected int4 min-max noise for gaussians: step = range/15,
    # E|e|/E|w| ≈ 8-9%
    assert err < 0.12, f"roundtrip error {err}"


def test_gguf_file_roundtrip(tmp_path):
    path = str(tmp_path / "t.gguf")
    lrng = np.random.default_rng(1234)  # local: isolate from other tests
    f32 = lrng.normal(size=(8, 4)).astype(np.float32)
    q40_src = lrng.normal(size=64).astype(np.float32)
    # q4_0 quantize: d = absmax/7? spec uses /-8..7 — test with dequant ref
    raw40 = bytearray()
    for b in range(2):
        blk = q40_src[b * 32 : (b + 1) * 32]
        d = np.abs(blk).max() / 7.0 + 1e-9
        q = np.clip(np.round(blk / d) + 8, 0, 15).astype(np.uint8)
        raw40 += np.float16(d).tobytes()
        for j in range(16):
            raw40.append(q[j] | (q[j + 16] << 4))
    write_gguf(
        path,
        {"general.architecture": "llama", "llama.block_count": 1},
        [
            ("a.weight", (4, 8), 0, f32.tobytes()),
            ("b.weight", (64,), 2, bytes(raw40)),
        ],
    )
    r = GGUFReader(path)
    assert r.metadata["general.architecture"] == "llama"
    np.testing.assert_array_equal(r.dequant("a.weight"), f32)
    deq = r.dequant("b.weight")
    err = np.abs(deq - q40_src).mean() / np.abs(q40_src).mean()
    assert err < 0.12  # int4 symmetric quant noise (analytic mean ~0.10)
    r.close()


def test_gguf_model_end_to_end(tmp_path):
    """Tiny llama as a Q4_K GGUF: load → engine → greedy generate, and
    compare with the same weights loaded dense."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.quantization.gguf import load_gguf_model
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_llama_config

    hidden, inter, vocab, layers = 64, 128, 256, 2
    mc = tiny_llama_config(
        hidden_size=hidden, intermediate_size=inter, vocab_size=vocab,
        num_hidden_layers=layers, tie_word_embeddings=True,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(3))

    tensors = []

    def add_f32(name, arr):
        arr = np.asarray(arr, np.float32)
        tensors.append((name, tuple(reversed(arr.shape)), 0, arr.tobytes()))

    def add_q4k(name, w_out_in):
        w = np.asarray(w_out_in, np.float32)
        tensors.append(
            (name, tuple(reversed(w.shape)), 12, quantize_q4_k(w.reshape(-1)))
        )

    add_f32("token_embd.weight", params["embed_tokens"]["weight"])
    add_f32("output_norm.weight", params["norm"])
    for i, lp in enumerate(params["layers"]):
        add_f32(f"blk.{i}.attn_norm.weight", lp["input_layernorm"])
        add_f32(f"blk.{i}.ffn_norm.weight", lp["post_attention_layernorm"])
        for gg, ours in [
            ("attn_q", "q_proj"), ("attn_k", "k_proj"),
            ("attn_v", "v_proj"), ("attn_output", "o_proj"),
        ]:
            add_q4k(f"blk.{i}.{gg}.weight", np.asarray(lp["self_attn"][ours]["weight"]).T)
        for gg, ours in [("ffn_gate", "gate_proj"), ("ffn_up", "up_proj"), ("ffn_down", "down_proj")]:
            add_q4k(f"blk.{i}.{gg}.weight", np.asarray(lp["mlp"][ours]["weight"]).T)

    path = str(tmp_path / "tiny.gguf")
    write_gguf(
        path,
        {
            "general.architecture": "llama",
            "llama.block_count": layers,
            "llama.embedding_length": hidden,
            "llama.feed_forward_length": inter,
            "llama.attention.head_count": 4,
            "llama.attention.head_count_kv": 2,
            "llama.context_length": 512,
            "llama.rope.freq_base": 10000.0,
            "llama.vocab_size": vocab,
        },
        tensors,
    )
    gmodel, gparams, gcfg = load_gguf_model(path, dtype=jnp.float32)
    assert gcfg.num_hidden_layers == layers
    from vllm_rust_tpu.quantization.types import QuantLinear

    assert isinstance(gparams["layers"][0]["self_attn"]["q_proj"], QuantLinear)

    cfg = EngineConfig(
        model=gcfg,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng_q = LLMEngine(gmodel, gparams, cfg)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    out_q = eng_q.generate([[5, 6, 7]], sp)[0].token_ids

    cfg2 = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng_f = LLMEngine(model, params, cfg2)
    out_f = eng_f.generate([[5, 6, 7]], sp)[0].token_ids
    agree = sum(a == b for a, b in zip(out_q, out_f))
    assert agree >= 4, f"Q4_K model diverged badly: {out_q} vs {out_f}"


@pytest.mark.parametrize(
    "tname,ttype,bb",
    [
        ("Q4_0", 2, 18),
        ("Q4_1", 3, 20),
        ("Q5_0", 6, 22),
        ("Q5_1", 7, 24),
        ("Q8_0", 8, 34),
        ("Q2_K", 10, 84),
        ("Q3_K", 11, 110),
        ("Q4_K", 12, 144),
        ("Q5_K", 13, 176),
        ("Q6_K", 14, 210),
        ("IQ2_XS", 17, 74),
        ("IQ2_S", 22, 82),
        ("IQ3_XXS", 18, 98),
        ("IQ3_S", 21, 110),
        ("IQ4_NL", 20, 18),
        ("IQ4_XS", 23, 136),
    ],
)
def test_int8_grouped_reconstructs_dequant(tname, ttype, bb):
    """The w8a16 repack is EXACT: repeat(s,16)*q - repeat(z,16) must
    reproduce the float dequant bit-for-bit (same fp32 operations)."""
    from vllm_rust_tpu.quantization.gguf_file import (
        GGML_TYPES,
        dequant_int8_grouped,
    )

    be = GGML_TYPES[ttype][1]
    n = be * 8
    raw = rng.integers(0, 256, size=(n // be) * bb, dtype=np.uint8)
    raw_b = bytearray(raw.tobytes())
    for b in range(n // be):
        raw_b[b * bb : b * bb + 2] = np.float16(0.25).tobytes()
        if tname in ("Q4_K", "Q5_K", "Q4_1", "Q5_1"):
            raw_b[b * bb + 2 : b * bb + 4] = np.float16(0.125).tobytes()
        if tname == "Q2_K":
            raw_b[b * bb + 80 : b * bb + 82] = np.float16(0.25).tobytes()
            raw_b[b * bb + 82 : b * bb + 84] = np.float16(0.125).tobytes()
        if tname == "Q3_K":
            raw_b[b * bb + 108 : b * bb + 110] = np.float16(0.25).tobytes()
        if tname == "Q6_K":
            raw_b[b * bb + 208 : b * bb + 210] = np.float16(0.25).tobytes()
    raw = np.frombuffer(bytes(raw_b), np.uint8)
    want = dequantize(raw, ttype, n)
    q, s, z = dequant_int8_grouped(raw, ttype, n)
    assert q.dtype == np.int8 and s.shape == (n // 16,)
    got = np.repeat(s, 16) * q.astype(np.float32)
    if z is not None:
        got = got - np.repeat(z, 16)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gguf_i8_model_end_to_end(tmp_path):
    """Tiny llama GGUF with Q6_K attention + IQ3_XXS MLP (random valid
    block bytes): load → QuantLinear(gguf_i8) layers → greedy generate,
    and i8 apply must equal the dense dequant matmul of the SAME file."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.quantization.gguf import load_gguf_model
    from vllm_rust_tpu.quantization.gguf_file import GGML_TYPES
    from vllm_rust_tpu.quantization.registry import apply_quantized_linear
    from vllm_rust_tpu.quantization.types import QuantLinear
    from vllm_rust_tpu.request import SamplingParams

    hidden, inter, vocab, layers = 64, 128, 256, 2
    r = np.random.default_rng(11)

    def rand_blocks(ttype, n_elems):
        _, be, bb = GGML_TYPES[ttype]
        raw = bytearray(
            r.integers(0, 256, size=(n_elems // be) * bb, dtype=np.uint8).tobytes()
        )
        off = 208 if GGML_TYPES[ttype][0] == "Q6_K" else 0
        for b in range(n_elems // be):
            raw[b * bb + off : b * bb + off + 2] = np.float16(0.02).tobytes()
        return bytes(raw)

    tensors = []

    def add_f32(name, arr):
        arr = np.asarray(arr, np.float32)
        tensors.append((name, tuple(reversed(arr.shape)), 0, arr.tobytes()))

    add_f32("token_embd.weight", r.normal(size=(vocab, hidden)) * 0.02)
    add_f32("output_norm.weight", np.ones(hidden))
    for i in range(layers):
        add_f32(f"blk.{i}.attn_norm.weight", np.ones(hidden))
        add_f32(f"blk.{i}.ffn_norm.weight", np.ones(hidden))
        for gg, shape, ttype in [
            ("attn_q", (hidden, hidden), 14),   # Q6_K
            ("attn_k", (hidden // 2, hidden), 14),
            ("attn_v", (hidden // 2, hidden), 14),
            ("attn_output", (hidden, hidden), 14),
            ("ffn_gate", (inter, hidden), 18),  # IQ3_XXS
            ("ffn_up", (inter, hidden), 18),
            ("ffn_down", (hidden, inter), 21),  # IQ3_S
        ]:
            n_out, n_in = shape
            tensors.append(
                (
                    f"blk.{i}.{gg}.weight",
                    (n_in, n_out),
                    ttype,
                    rand_blocks(ttype, n_out * n_in),
                )
            )

    path = str(tmp_path / "tiny_i8.gguf")
    write_gguf(
        path,
        {
            "general.architecture": "llama",
            "llama.block_count": layers,
            "llama.embedding_length": hidden,
            "llama.feed_forward_length": inter,
            "llama.attention.head_count": 4,
            "llama.attention.head_count_kv": 2,
            "llama.context_length": 512,
            "llama.rope.freq_base": 10000.0,
            "llama.vocab_size": vocab,
        },
        tensors,
    )
    gmodel, gparams, gcfg = load_gguf_model(path, dtype=jnp.float32)
    qp = gparams["layers"][0]["self_attn"]["q_proj"]
    gp = gparams["layers"][0]["mlp"]["gate_proj"]
    assert isinstance(qp, QuantLinear) and qp.method == "gguf_i8"
    assert isinstance(gp, QuantLinear) and gp.method == "gguf_i8"
    assert qp.zs is None and qp.qweight.dtype == jnp.int8

    # i8 apply == dense dequant of the same tensor
    reader = GGUFReader(path)
    w = reader.dequant("blk.0.attn_q.weight")  # [out, in]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, hidden)), jnp.bfloat16)
    got = np.asarray(apply_quantized_linear(x, qp), np.float32)
    want = np.asarray(x, np.float32) @ w.T
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)

    cfg = EngineConfig(
        model=gcfg,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng = LLMEngine(gmodel, gparams, cfg)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    out = eng.generate([[5, 6, 7]], sp)[0].token_ids
    assert len(out) == 8
