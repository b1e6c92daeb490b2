"""End-to-end Δppl gates for the IQ3_XXS and Q6_K SERVING paths
(VERDICT r4 next #7; reference ADR 0025 + BASELINE config #3 is a
Gemma-12B IQ3_XXS deployment).

The existing fidelity gates cover IQ/Q6_K only via the shared int8-group
serve form; this file drives the FULL production pipeline on real float
weights: quantize -> real GGUF block bytes (own writers below) ->
byte-parse (quantization/gguf_file.dequant_int8_grouped, the same
function load_gguf_model uses) -> int8 repack (the gguf_i8 QuantLinear
exactly as quantization/gguf.py:_int8_to_quant_linear builds it) ->
w8a16 kernel. Gates:
  1. serving ppl == float-dequant-of-same-codes ppl (kernel adds ~0)
  2. Δppl vs the float baseline under a per-format bound

gguf-py is absent in-env (zero-egress), so the byte layouts are pinned
against the scalar specs in tests/test_gguf.py instead of external
golden files; these writers produce REAL decodable blocks, which also
makes them the closest thing to a vendored fixture generator available.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_quant_accuracy import _build, _ppl, _quantize_model
from vllm_rust_tpu.quantization.gguf_file import (
    dequant_int8_grouped,
    dequantize,
)

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# writers: float[.., 256-multiple] -> real GGUF block bytes
# ---------------------------------------------------------------------------


def quantize_q6_k(w: np.ndarray) -> bytes:
    """Q6_K writer (210-byte blocks: ql[128] qh[64] sc[16]i8 d f16).
    Layout inverse of tests/test_gguf.py::ref_q6_k."""
    flat = w.reshape(-1)
    nb = flat.size // 256
    out = bytearray()
    for b in range(nb):
        x = flat[b * 256 : (b + 1) * 256]
        sub = x.reshape(16, 16)
        sub_max = np.abs(sub).max(axis=1)
        d = float(sub_max.max()) / (31.0 * 63.0) or 1e-8
        d = np.float16(d)
        df = float(d) or 1e-8
        sc = np.clip(np.rint(sub_max / (31.0 * df)), 1, 63).astype(np.int8)
        q = np.clip(
            np.rint(x / (df * sc.repeat(16).astype(np.float32))), -32, 31
        ).astype(np.int32) + 32
        ql = np.zeros(128, np.uint8)
        qh = np.zeros(64, np.uint8)
        for h in range(2):
            for el in range(32):
                qs = [q[h * 128 + k * 32 + el] for k in range(4)]
                ql[h * 64 + el] = (qs[0] & 0xF) | ((qs[2] & 0xF) << 4)
                ql[h * 64 + 32 + el] = (qs[1] & 0xF) | ((qs[3] & 0xF) << 4)
                qh[h * 32 + el] = (
                    (qs[0] >> 4)
                    | ((qs[1] >> 4) << 2)
                    | ((qs[2] >> 4) << 4)
                    | ((qs[3] >> 4) << 6)
                )
        out += bytes(ql) + bytes(qh) + sc.tobytes() + d.tobytes()
    return bytes(out)


def quantize_iq3_xxs(w: np.ndarray) -> bytes:
    """IQ3_XXS writer (98-byte blocks: d f16, qs[64] grid ids,
    aux[8]u32 = 4x7-bit sign ids + 4-bit group scale). Greedy nearest-
    grid encoder; sign patterns snap to the 128-entry ksigns table by
    flipping the smallest-|w| element when parity mismatches (the
    format's representable-sign constraint)."""
    from vllm_rust_tpu.quantization.iq_grids import IQ3XXS_GRID, KSIGNS

    grid = IQ3XXS_GRID.astype(np.float32)  # [256, 4]
    ks = np.asarray(KSIGNS, np.uint8)
    flat = w.reshape(-1)
    nb = flat.size // 256
    out = bytearray()
    for b in range(nb):
        x = flat[b * 256 : (b + 1) * 256].astype(np.float32)
        groups = x.reshape(8, 32)
        gmax = np.abs(groups).max(axis=1)
        d = float(gmax.max()) / (62.0 * 0.5 * 15.5) or 1e-8
        d16 = np.float16(d)
        df = float(d16) or 1e-8
        s4 = np.clip(
            np.rint(gmax / (62.0 * 0.5 * df) - 0.5), 0, 15
        ).astype(np.uint32)
        db = df * (0.5 + s4.astype(np.float32)) * 0.5  # [8]
        qs = np.zeros(64, np.uint8)
        aux = np.zeros(8, np.uint32)
        for ib in range(8):
            g = groups[ib]
            a = np.uint32(s4[ib]) << np.uint32(28)
            for row in range(4):
                r = g[row * 8 : row * 8 + 8]
                # sign pattern (bit j set = negative), parity-snapped
                m = 0
                for j in range(8):
                    if r[j] < 0:
                        m |= 1 << j
                if ks[m & 127] != m:
                    jmin = int(np.abs(r).argmin())
                    m ^= 1 << jmin
                assert ks[m & 127] == m
                a |= np.uint32(m & 127) << np.uint32(7 * row)
                # two quadruples of magnitudes -> nearest grid rows
                t = np.abs(r) / db[ib]
                for half in range(2):
                    tq = t[half * 4 : half * 4 + 4]
                    idx = int(
                        ((grid - tq[None, :]) ** 2).sum(axis=1).argmin()
                    )
                    qs[8 * ib + 2 * row + half] = idx
            aux[ib] = a
        out += d16.tobytes() + bytes(qs) + aux.tobytes()
    return bytes(out)


# ---------------------------------------------------------------------------
# production serve node (mirrors quantization/gguf.py _int8_to_quant_linear)
# ---------------------------------------------------------------------------


def _serve_node_from_bytes(raw: bytes, ggml_type: int, n_out: int, n_in: int):
    from vllm_rust_tpu.ops.pallas.int8_matmul import prepare_tiled_scales_w8
    from vllm_rust_tpu.quantization.types import QuantLinear

    arr = np.frombuffer(raw, np.uint8)
    q, s, z = dequant_int8_grouped(arr, ggml_type, n_out * n_in)
    qt = np.ascontiguousarray(q.reshape(n_out, n_in).T)
    st = np.ascontiguousarray(s.reshape(n_out, n_in // 16).T)
    zt = (
        np.ascontiguousarray(z.reshape(n_out, n_in // 16).T)
        if z is not None
        else None
    )
    aux = {}
    tiled = prepare_tiled_scales_w8(st, zt, n_in)
    if tiled is not None:
        aux["s_tiled"] = jnp.asarray(tiled[0])
        aux["zs_tiled"] = jnp.asarray(tiled[1])
    return QuantLinear(
        qweight=jnp.asarray(qt),
        scales=jnp.asarray(st),
        zs=jnp.asarray(zt) if zt is not None else None,
        aux=aux,
        method="gguf_i8",
    )


def _make_makers(ggml_type: int, writer):
    def mk_serving(w):
        # GGUF rows are output channels over the input dim: write w.T
        raw = writer(np.asarray(w, np.float32).T)
        return _serve_node_from_bytes(raw, ggml_type, w.shape[1], w.shape[0])

    def mk_ref(w):
        raw = np.frombuffer(
            writer(np.asarray(w, np.float32).T), np.uint8
        )
        deq = dequantize(raw, ggml_type, w.size)
        return {
            "weight": jnp.asarray(
                deq.reshape(w.shape[1], w.shape[0]).T, jnp.float32
            )
        }

    return mk_serving, mk_ref


def _build_256():
    """The 256-wide tiny model: IQ/K super-blocks span 256 input elems."""
    import jax

    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config(
        hidden_size=256, num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=256, vocab_size=256,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), scale=0.10)
    return model, params


@pytest.mark.parametrize(
    "name,ggml_type,writer,fid_bound,cost_bound",
    [
        ("q6_k", 14, quantize_q6_k, 0.005, 0.02),  # measured 0.0028/+1e-4
        ("iq3_xxs", 18, quantize_iq3_xxs, 0.005, 0.10),  # measured 0.031/-5e-4
    ],
)
def test_gguf_e2e_serving_ppl(name, ggml_type, writer, fid_bound,
                              cost_bound):
    mk_serving, mk_ref = _make_makers(ggml_type, writer)
    model, base = _build_256()
    ppl_base = _ppl(model, base)
    ppl_ref = _ppl(model, _quantize_model(base, mk_ref))
    ppl_serve = _ppl(model, _quantize_model(base, mk_serving))
    # 1. the production parse->repack->w8a16 path adds ~nothing over the
    #    float dequant of the same codes
    assert abs(ppl_serve - ppl_ref) / ppl_ref < fid_bound, (
        name, ppl_serve, ppl_ref,
    )
    # 2. the quantization itself stays within its format bound
    assert (ppl_serve - ppl_base) / ppl_base < cost_bound, (
        name, ppl_serve, ppl_base,
    )


def test_writers_roundtrip_against_scalar_spec():
    """The writers emit REAL blocks: production byte-decode must agree
    with the independent scalar spec decoders in tests/test_gguf.py."""
    from tests.test_gguf import ref_iq3_xxs, ref_q6_k

    rng = np.random.default_rng(5)
    w = (rng.standard_normal(512) * 0.1).astype(np.float32)
    for ggml_type, writer, ref in (
        (14, quantize_q6_k, ref_q6_k),
        (18, quantize_iq3_xxs, ref_iq3_xxs),
    ):
        raw = writer(w)
        got = dequantize(np.frombuffer(raw, np.uint8), ggml_type, w.size)
        want = ref(raw, w.size)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # and the codes actually approximate the weights
        err = np.abs(got - w).mean() / np.abs(w).mean()
        assert err < 0.5, (ggml_type, err)
