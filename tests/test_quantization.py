"""Quantization correctness: unpack round-trips, kernel vs dense ref,
end-to-end quantized model forward.

Reference test strategy: kernel outputs pinned against CPU reference
implementations (SURVEY.md §4 GPU tests; ADR 0025 golden-vector idea).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.ops.pallas.quant_matmul import (
    quant_matmul_w4a16,
    quant_matmul_w4a16_ref,
)
from vllm_rust_tpu.quantization.awq import (
    _AWQ_ORDER,
    load_awq_linear,
    repack_k_half,
    unpack_awq_int32,
)
from vllm_rust_tpu.quantization.gptq import unpack_gptq_cols, unpack_gptq_rows
from vllm_rust_tpu.quantization.types import QuantLinear


def pack_awq_int32(q: np.ndarray) -> np.ndarray:
    """Inverse of unpack_awq_int32 (test helper)."""
    r, c = q.shape
    out = np.zeros((r, c // 8), np.int32)
    for i in range(8):
        col = q[:, _AWQ_ORDER[i] :: 8] if False else q[:, np.arange(c // 8) * 8 + _AWQ_ORDER[i]]
        out |= (col.astype(np.int64) << (4 * i)).astype(np.int64).astype(np.uint32).view(np.int32)
    return out


def test_awq_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(16, 64), dtype=np.uint8)
    packed = pack_awq_int32(q)
    np.testing.assert_array_equal(unpack_awq_int32(packed), q)


def test_gptq_unpack_shapes():
    rng = np.random.default_rng(1)
    packed_rows = rng.integers(-(2**31), 2**31 - 1, size=(4, 8), dtype=np.int64).astype(np.int32)
    q = unpack_gptq_rows(packed_rows)
    assert q.shape == (32, 8)
    packed_cols = rng.integers(-(2**31), 2**31 - 1, size=(4, 2), dtype=np.int64).astype(np.int32)
    z = unpack_gptq_cols(packed_cols)
    assert z.shape == (4, 16)
    assert q.max() <= 15 and z.max() <= 15


def test_repack_k_half():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 16, size=(8, 4), dtype=np.uint8)
    p = repack_k_half(q)
    np.testing.assert_array_equal(p & 0xF, q[:4])
    np.testing.assert_array_equal(p >> 4, q[4:])


@pytest.mark.parametrize(
    "t,k,n,g", [(16, 256, 256, 128), (8, 512, 384, 128), (4, 256, 128, 64)]
)
def test_kernel_matches_ref(t, k, n, g):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(t, k)).astype(np.float32), jnp.bfloat16)
    qweight = jnp.asarray(rng.integers(0, 256, size=(k // 2, n), dtype=np.uint8))
    scales = jnp.asarray(
        rng.uniform(0.005, 0.02, size=(k // g, n)).astype(np.float32), jnp.bfloat16
    )
    zs = jnp.asarray(
        rng.uniform(0.0, 0.1, size=(k // g, n)).astype(np.float32), jnp.bfloat16
    )
    from vllm_rust_tpu.ops.pallas.quant_matmul import prepare_tiled_scales

    tiled = prepare_tiled_scales(np.asarray(scales), np.asarray(zs), k // 2)
    if tiled is not None:
        s_t, zs_t = jnp.asarray(tiled[0]), jnp.asarray(tiled[1])
    else:
        s_t = zs_t = None
    out_k = quant_matmul_w4a16(x, qweight, scales, zs, s_t, zs_t)
    out_r = quant_matmul_w4a16_ref(x, qweight, scales, zs)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32),
        np.asarray(out_r, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_awq_dequant_against_float():
    """Quantize a random weight matrix to AWQ format, load it, and check
    the quantized matmul approximates the float one."""
    rng = np.random.default_rng(4)
    k, n, g = 256, 128, 128
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    # simple symmetric-ish groupwise quant to int4
    wq = np.zeros((k, n), np.uint8)
    scales = np.zeros((k // g, n), np.float32)
    zeros = np.full((k // g, n), 8, np.uint8)
    for gi in range(k // g):
        blk = w[gi * g : (gi + 1) * g]
        s = np.abs(blk).max(axis=0) / 7.0 + 1e-8
        scales[gi] = s
        q = np.clip(np.round(blk / s) + 8, 0, 15).astype(np.uint8)
        wq[gi * g : (gi + 1) * g] = q

    ql = load_awq_linear(
        pack_awq_int32(wq), pack_awq_int32(zeros), scales.astype(np.float16)
    )
    x = rng.normal(size=(4, k)).astype(np.float32)
    from vllm_rust_tpu.quantization.awq import apply_awq

    out_q = np.asarray(apply_awq(jnp.asarray(x, jnp.bfloat16), ql), np.float32)
    # exact pipeline check: against the dequantized int4 weights
    w_deq = (wq.astype(np.float32) - 8.0) * np.repeat(scales, g, axis=0)
    out_deq = x @ w_deq
    err = np.abs(out_q - out_deq).mean() / (np.abs(out_deq).mean() + 1e-8)
    assert err < 0.02, f"pipeline relative error {err}"
    # sanity: against the original float weights (int4 noise only)
    out_f = x @ w
    err_f = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-8)
    assert err_f < 0.3, f"quantization error unexpectedly large {err_f}"


def test_quantized_model_forward():
    """Graft a QuantLinear into a tiny model and run the engine."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_llama_config

    rng = np.random.default_rng(5)
    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    # quantize every mlp gate_proj to 4-bit
    for lp in params["layers"]:
        w = np.asarray(lp["mlp"]["gate_proj"]["weight"], np.float32)
        k, n = w.shape
        g = k  # single group
        s = np.abs(w).max(axis=0) / 7.0 + 1e-8
        q = np.clip(np.round(w / s) + 8, 0, 15).astype(np.uint8)
        zs = (8.0 * s).astype(np.float32)
        from vllm_rust_tpu.quantization.awq import repack_k_half

        lp["mlp"]["gate_proj"] = QuantLinear(
            qweight=jnp.asarray(repack_k_half(q)),
            scales=jnp.asarray(s[None, :], jnp.bfloat16),
            zs=jnp.asarray(zs[None, :], jnp.bfloat16),
            method="awq",
        )

    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng = LLMEngine(model, params, cfg)
    outs = eng.generate(
        [[1, 2, 3]], SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    )
    assert len(outs[0].token_ids) == 5


# -- FP8 weights ----------------------------------------------------------------


def _fp8_quant(w, scale):
    import ml_dtypes

    return (w / scale).astype(ml_dtypes.float8_e4m3fn)


@pytest.mark.parametrize("granularity", ["tensor", "channel", "block"])
def test_fp8_apply_matches_float(granularity):
    from vllm_rust_tpu.quantization.fp8 import load_fp8_linear
    from vllm_rust_tpu.quantization.registry import apply_quantized_linear

    rng = np.random.default_rng(0)
    k, n = 64, 32
    w = rng.normal(size=(n, k)).astype(np.float32) * 0.1  # torch [N, K]
    if granularity == "tensor":
        scale = np.float32(np.abs(w).max() / 448.0 + 1e-6)
        ql = load_fp8_linear(_fp8_quant(w, scale), weight_scale=scale)
        w_ref = _fp8_quant(w, scale).astype(np.float32) * scale
    elif granularity == "channel":
        scale = (np.abs(w).max(axis=1) / 448.0 + 1e-6).astype(np.float32)  # [N]
        ql = load_fp8_linear(_fp8_quant(w, scale[:, None]), weight_scale=scale)
        w_ref = _fp8_quant(w, scale[:, None]).astype(np.float32) * scale[:, None]
    else:
        bs = 16
        sc = (
            np.abs(w.reshape(n // bs, bs, k // bs, bs)).max(axis=(1, 3)) / 448.0
            + 1e-6
        ).astype(np.float32)  # [N/bs, K/bs]
        expand = np.repeat(np.repeat(sc, bs, 0), bs, 1)
        ql = load_fp8_linear(_fp8_quant(w, expand), weight_scale_inv=sc)
        w_ref = _fp8_quant(w, expand).astype(np.float32) * expand

    x = rng.normal(size=(4, k)).astype(np.float32)
    got = np.asarray(apply_quantized_linear(jnp.asarray(x), ql))
    ref = x @ w_ref.T
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_fp8_checkpoint_end_to_end():
    """Quantize a tiny llama to fp8, load through the quant loader, and
    compare generation against the explicitly dequantized model."""
    import ml_dtypes

    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.quantization.loader import load_quantized_weights
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    ref_params = model.init_params(jax.random.PRNGKey(3))

    # build an fp8 checkpoint stream from the float params
    stream = []
    deq = jax.tree_util.tree_map(lambda x: x, ref_params)  # shallow copy tree
    for i, lp in enumerate(ref_params["layers"]):
        for mod, names in (("self_attn", ["q_proj", "k_proj", "v_proj", "o_proj"]),
                           ("mlp", ["gate_proj", "up_proj", "down_proj"])):
            for nme in names:
                w = np.asarray(lp[mod][nme]["weight"]).T  # [N, K] torch
                scale = np.float32(np.abs(w).max() / 448.0 + 1e-6)
                q = (w / scale).astype(ml_dtypes.float8_e4m3fn)
                base = f"model.layers.{i}.{mod}.{nme}"
                stream.append((f"{base}.weight", q))
                stream.append((f"{base}.weight_scale", np.asarray(scale)))
                # reference: dequantized weights
                deq["layers"][i][mod][nme] = {
                    "weight": jnp.asarray((q.astype(np.float32) * scale).T)
                }
    stream.append(("model.embed_tokens.weight",
                   np.asarray(ref_params["embed_tokens"]["weight"])))
    stream.append(("model.norm.weight", np.asarray(ref_params["norm"])))
    stream.append(("lm_head.weight",
                   np.asarray(ref_params["lm_head"]["weight"]).T))
    for i, lp in enumerate(ref_params["layers"]):
        for nrm in ("input_layernorm", "post_attention_layernorm"):
            stream.append((f"model.layers.{i}.{nrm}.weight", np.asarray(lp[nrm])))

    qparams = load_quantized_weights(model, "fp8", {}, stream)

    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    p = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    got = LLMEngine(model, qparams, cfg).generate([[1, 2, 3, 4]], p)[0].token_ids
    ref = LLMEngine(model, deq, cfg).generate([[1, 2, 3, 4]], p)[0].token_ids
    assert got == ref


# -- GPTQ desc_act ----------------------------------------------------------------


def test_gptq_desc_act_matches_dense():
    from vllm_rust_tpu.quantization.gptq import load_gptq_linear
    from vllm_rust_tpu.quantization.registry import apply_quantized_linear

    rng = np.random.default_rng(1)
    k, n, g = 64, 32, 16
    n_groups = k // g
    q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
    scales = rng.uniform(0.01, 0.1, size=(n_groups, n)).astype(np.float16)
    zeros = rng.integers(0, 16, size=(n_groups, n), dtype=np.uint8)

    # activation-order permutation: g_idx[k] = group of ORIGINAL row k
    perm_rows = rng.permutation(k)
    g_idx = np.empty(k, np.int32)
    g_idx[perm_rows] = np.repeat(np.arange(n_groups), g)

    # dense reference: w[k] = (q[k] - z[g_idx[k]]) * s[g_idx[k]]
    w_ref = (
        q.astype(np.float32) - (zeros.astype(np.float32) + 1)[g_idx]
    ) * scales.astype(np.float32)[g_idx]

    # pack as an AutoGPTQ checkpoint
    def pack_rows(qm):
        k_, n_ = qm.shape
        out = np.zeros((k_ // 8, n_), np.uint32)
        for j in range(8):
            out |= qm[j::8].astype(np.uint32) << (4 * j)
        return out.view(np.int32)

    def pack_cols(zm):
        r, n_ = zm.shape
        out = np.zeros((r, n_ // 8), np.uint32)
        for j in range(8):
            out |= zm[:, j::8].astype(np.uint32) << (4 * j)
        return out.view(np.int32)

    ql = load_gptq_linear(
        pack_rows(q), pack_cols(zeros), scales, g_idx=g_idx
    )
    assert "perm" in ql.aux
    x = rng.normal(size=(4, k)).astype(np.float32)
    got = np.asarray(apply_quantized_linear(jnp.asarray(x), ql))
    ref = x @ w_ref
    # scales are stored bf16 in the kernel layout
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=8e-2)


# -- GGUF IQ4 -------------------------------------------------------------------


def test_iq4_nl_dequant_spec():
    """Hand-built IQ4_NL block per the ggml spec."""
    from vllm_rust_tpu.quantization.gguf_file import IQ4_KVALUES, dequantize

    d = np.float16(0.5)
    idx = np.arange(32) % 16
    qs = (idx[:16] | (idx[16:] << 4)).astype(np.uint8)
    raw = np.frombuffer(d.tobytes() + qs.tobytes(), np.uint8)
    out = dequantize(raw.copy(), 20, 32)  # type 20 = IQ4_NL
    expect = 0.5 * IQ4_KVALUES[idx]
    np.testing.assert_allclose(out, expect, rtol=1e-3)


def test_iq4_xs_dequant_spec():
    from vllm_rust_tpu.quantization.gguf_file import IQ4_KVALUES, dequantize

    rng = np.random.default_rng(0)
    d = np.float16(0.25)
    ls = rng.integers(0, 64, size=8)  # 6-bit sub-scales
    scales_l = np.zeros(4, np.uint8)
    scales_h = np.uint16(0)
    for ib in range(8):
        scales_l[ib // 2] |= (ls[ib] & 0xF) << (4 * (ib % 2))
        scales_h |= np.uint16((ls[ib] >> 4) & 3) << np.uint16(2 * ib)
    idx = rng.integers(0, 16, size=256)
    qs = np.zeros(128, np.uint8)
    for ib in range(8):
        lo = idx[32 * ib : 32 * ib + 16]
        hi = idx[32 * ib + 16 : 32 * ib + 32]
        qs[16 * ib : 16 * (ib + 1)] = lo | (hi << 4)
    raw = np.frombuffer(
        d.tobytes() + scales_h.tobytes() + scales_l.tobytes() + qs.tobytes(),
        np.uint8,
    )
    out = dequantize(raw.copy(), 23, 256)  # type 23 = IQ4_XS
    expect = np.concatenate(
        [
            0.25 * (int(ls[ib]) - 32) * IQ4_KVALUES[idx[32 * ib : 32 * (ib + 1)]]
            for ib in range(8)
        ]
    )
    np.testing.assert_allclose(out, expect, rtol=1e-3)


@pytest.mark.parametrize(
    "t,k,n,g,has_z",
    [
        (1, 256, 256, 16, False),
        (8, 512, 256, 16, True),
        (4, 1024, 512, 32, True),
        (16, 512, 384, 16, False),
    ],
)
def test_w8a16_kernel_matches_ref(t, k, n, g, has_z):
    from vllm_rust_tpu.ops.pallas.int8_matmul import (
        prepare_tiled_scales_w8,
        quant_matmul_w8a16,
        quant_matmul_w8a16_ref,
    )

    r = np.random.default_rng(7)
    x = jnp.asarray(r.normal(size=(t, k)).astype(np.float32), jnp.bfloat16)
    qw = jnp.asarray(r.integers(-127, 128, size=(k, n)), jnp.int8)
    s = r.normal(size=(k // g, n)).astype(np.float32) * 0.05
    z = (
        r.normal(size=(k // g, n)).astype(np.float32) * 0.05
        if has_z
        else None
    )
    tiled = prepare_tiled_scales_w8(s, z, k)
    assert tiled is not None
    got = quant_matmul_w8a16(
        x,
        qw,
        jnp.asarray(s),
        jnp.asarray(z) if z is not None else None,
        s_tiled=jnp.asarray(tiled[0]),
        zs_tiled=jnp.asarray(tiled[1]),
        has_z=has_z,
    )
    want = quant_matmul_w8a16_ref(
        x, qw, jnp.asarray(s), jnp.asarray(z) if z is not None else None
    )
    # got/want differ only by bf16 accumulation order; scale tolerance
    # to the output magnitude.
    scale = np.maximum(np.abs(np.asarray(want, np.float32)), 1.0)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert np.max(err / scale) < 2e-2, float(np.max(err / scale))


def test_w8a16_dense_fallback_for_untileable():
    from vllm_rust_tpu.ops.pallas.int8_matmul import quant_matmul_w8a16

    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(size=(2, 48)), jnp.bfloat16)  # K=48 untileable
    qw = jnp.asarray(r.integers(-8, 8, size=(48, 32)), jnp.int8)
    s = jnp.asarray(r.normal(size=(3, 32)).astype(np.float32) * 0.1)
    out = quant_matmul_w8a16(x, qw, s, None)
    w = np.asarray(qw, np.float32) * np.repeat(np.asarray(s), 16, axis=0)
    want = np.asarray(x, np.float32) @ w
    np.testing.assert_allclose(
        np.asarray(out, np.float32), want, rtol=5e-2, atol=5e-2
    )


# -- BitsAndBytes ---------------------------------------------------------------


def _nf4_quantize(w: np.ndarray, blocksize: int = 64):
    """Blockwise NF4 quantization matching bitsandbytes serialization:
    packed uint8 (first element in HIGH nibble) + f32 absmax."""
    from vllm_rust_tpu.quantization.bitsandbytes import NF4_TABLE

    flat = w.reshape(-1).astype(np.float32)
    pad = (-flat.size) % blocksize
    flat_p = np.pad(flat, (0, pad))
    blocks = flat_p.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1) + 1e-12
    normed = blocks / absmax[:, None]
    codes = np.abs(normed[..., None] - NF4_TABLE).argmin(axis=-1)
    codes = codes.reshape(-1)[: flat.size + (flat.size % 2)]
    if codes.size % 2:
        codes = np.append(codes, 0)
    packed = (codes[0::2].astype(np.uint8) << 4) | codes[1::2].astype(np.uint8)
    return packed, absmax.astype(np.float32)


def test_bnb_nf4_dequant_roundtrip():
    from vllm_rust_tpu.quantization.bitsandbytes import (
        NF4_TABLE,
        dequant_bnb_4bit,
    )

    r = np.random.default_rng(11)
    w = r.normal(size=(24, 96)).astype(np.float32)
    packed, absmax = _nf4_quantize(w, blocksize=64)
    got = dequant_bnb_4bit(packed, absmax, NF4_TABLE, w.shape, blocksize=64)
    # NF4 is lossy; reconstruction error bounded by half the widest level gap
    err = np.abs(got - w) / np.repeat(absmax, 64)[: w.size].reshape(w.shape)
    assert err.max() <= 0.152, err.max()  # half the widest NF4 gap
    # values exactly on codebook levels reconstruct exactly
    exact = NF4_TABLE[r.integers(0, 16, size=(8, 64))].astype(np.float32)
    p2, a2 = _nf4_quantize(exact, 64)
    got2 = dequant_bnb_4bit(p2, a2, NF4_TABLE, exact.shape, 64)
    np.testing.assert_allclose(got2, exact, rtol=1e-6, atol=1e-7)


def test_bnb_double_quant_absmax():
    from vllm_rust_tpu.quantization.bitsandbytes import (
        dequant_blockwise_absmax,
    )

    r = np.random.default_rng(5)
    absmax_true = r.uniform(0.5, 2.0, size=512).astype(np.float32)
    offset = np.float32(absmax_true.mean())
    centered = absmax_true - offset
    nested_bs = 256
    outer = np.abs(centered.reshape(-1, nested_bs)).max(axis=1)
    # int8 linear codebook: code k maps to (k - 127.5) / 127.5... use the
    # simple symmetric map for the test: quant_map[c] = (c - 128) / 128
    qmap = ((np.arange(256) - 128) / 128).astype(np.float32)
    codes = np.clip(
        np.round(centered / np.repeat(outer, nested_bs) * 128) + 128, 0, 255
    ).astype(np.uint8)
    got = dequant_blockwise_absmax(codes, outer, qmap, float(offset), nested_bs)
    np.testing.assert_allclose(got, absmax_true, atol=float(outer.max()) / 64)


def test_bnb_loader_end_to_end():
    """NF4-quantize a tiny llama, load via the bitsandbytes path, and
    compare generation against the explicitly dequantized model."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.quantization.bitsandbytes import (
        NF4_TABLE,
        dequant_bnb_4bit,
    )
    from vllm_rust_tpu.quantization.loader import load_quantized_weights
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    ref_params = model.init_params(jax.random.PRNGKey(9))

    stream = []
    deq = jax.tree_util.tree_map(lambda x: x, ref_params)
    state_blob = None
    for i, lp in enumerate(ref_params["layers"]):
        for mod, names in (("self_attn", ["q_proj", "k_proj", "v_proj", "o_proj"]),
                           ("mlp", ["gate_proj", "up_proj", "down_proj"])):
            for nme in names:
                w = np.asarray(lp[mod][nme]["weight"]).T  # [N, K] torch layout
                packed, absmax = _nf4_quantize(w, 64)
                base = f"model.layers.{i}.{mod}.{nme}"
                state_blob = np.frombuffer(
                    json.dumps(
                        {"shape": list(w.shape), "blocksize": 64,
                         "dtype": "bfloat16"}
                    ).encode(),
                    np.uint8,
                )
                stream.append((f"{base}.weight", packed[:, None]))
                stream.append((f"{base}.weight.absmax", absmax))
                stream.append((f"{base}.weight.quant_map", NF4_TABLE))
                stream.append(
                    (f"{base}.weight.quant_state.bitsandbytes__nf4",
                     state_blob)
                )
                dw = dequant_bnb_4bit(packed, absmax, NF4_TABLE, w.shape, 64)
                deq["layers"][i][mod][nme] = {"weight": jnp.asarray(dw.T)}
    stream.append(("model.embed_tokens.weight",
                   np.asarray(ref_params["embed_tokens"]["weight"])))
    stream.append(("model.norm.weight", np.asarray(ref_params["norm"])))
    stream.append(("lm_head.weight",
                   np.asarray(ref_params["lm_head"]["weight"]).T))
    for i, lp in enumerate(ref_params["layers"]):
        for nrm in ("input_layernorm", "post_attention_layernorm"):
            stream.append((f"model.layers.{i}.{nrm}.weight", np.asarray(lp[nrm])))

    qparams = load_quantized_weights(model, "bitsandbytes", {}, stream)

    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    p = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    got = LLMEngine(model, qparams, cfg).generate([[1, 2, 3, 4]], p)[0].token_ids
    ref = LLMEngine(model, deq, cfg).generate([[1, 2, 3, 4]], p)[0].token_ids
    assert got == ref


# -- compressed-tensors ---------------------------------------------------------


def test_ct_packed_w4_matches_dense():
    from vllm_rust_tpu.quantization.compressed_tensors import (
        load_ct_packed_linear,
    )
    from vllm_rust_tpu.quantization.registry import apply_quantized_linear

    r = np.random.default_rng(2)
    n_out, n_in, g = 64, 256, 32
    q = r.integers(-8, 8, size=(n_out, n_in), dtype=np.int64)  # signed int4
    scales = r.uniform(0.01, 0.1, size=(n_out, n_in // g)).astype(np.float32)
    w_ref = q.astype(np.float32) * np.repeat(scales, g, axis=1)

    # pack: 8 nibbles per int32 word, LOW nibble first, biased by +8
    u = (q + 8).astype(np.uint32)
    words = np.zeros((n_out, n_in // 8), np.uint32)
    for j in range(8):
        words |= u[:, j::8] << (4 * j)
    ql = load_ct_packed_linear(words.view(np.int32), scales, None, None)
    x = r.normal(size=(4, n_in)).astype(np.float32)
    got = np.asarray(apply_quantized_linear(jnp.asarray(x), ql))
    want = x @ w_ref.T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=8e-2)


def test_ct_int8_per_channel_matches_dense():
    from vllm_rust_tpu.quantization.compressed_tensors import (
        load_ct_int8_linear,
    )
    from vllm_rust_tpu.quantization.registry import apply_quantized_linear

    r = np.random.default_rng(4)
    n_out, n_in = 64, 256
    w8 = r.integers(-127, 128, size=(n_out, n_in), dtype=np.int64).astype(np.int8)
    scales = r.uniform(0.005, 0.05, size=(n_out,)).astype(np.float32)
    w_ref = w8.astype(np.float32) * scales[:, None]

    ql = load_ct_int8_linear(w8, scales, None)
    x = r.normal(size=(4, n_in)).astype(np.float32)
    got = np.asarray(apply_quantized_linear(jnp.asarray(x), ql))
    want = x @ w_ref.T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=8e-2)
