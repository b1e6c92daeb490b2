"""Extra quantization formats: detection normalization, NVFP4 dequant,
experts_int8 online quantization (through the MoE layer), moe_wna16
expert dequant, checkpoint KV scales."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.quantization.formats_extra import (
    dequant_expert_int8,
    dequant_nvfp4,
    dequant_wna16_expert,
    load_kv_cache_scales,
    quantize_experts_int8,
    resolve_method,
)
from vllm_rust_tpu.quantization.registry import detect_quantization


def test_resolve_method_vendor_formats():
    assert resolve_method({"quantization_config": {
        "quant_method": "modelopt", "quant_algo": "FP8"}}) == "modelopt_fp8"
    assert resolve_method({"quantization_config": {
        "quant_method": "modelopt", "quant_algo": "NVFP4"}}) == "modelopt_fp4"
    assert resolve_method({"quantization_config": {
        "quant_method": "fbgemm_fp8"}}) == "fbgemm_fp8"
    assert resolve_method({"quantization_config": {
        "quant_method": "quark",
        "global_quant_config": {"weight": {"dtype": "fp8_e4m3"}},
    }}) == "quark_fp8"
    assert detect_quantization({"quantization_config": {
        "quant_method": "awq"}}) == "awq"
    assert detect_quantization({}) is None
    # torchao stores standard tensors — served dense (reference
    # quantization/torchao.rs:1-16)
    assert resolve_method(
        {"quantization_config": {"quant_method": "torchao"}}
    ) is None


def test_nvfp4_dequant_roundtrip():
    """Values representable in e2m1 with unit scales round-trip exactly."""
    # value table: codes 0..7 = 0, .5, 1, 1.5, 2, 3, 4, 6 (+sign bit 3)
    codes = np.array([[0x21, 0x53]], np.uint8)  # lo=.5, hi=1 | lo=1.5, hi=3
    bs = np.ones((1, 1), np.float32).astype(np.dtype("float8_e4m3fn"))
    out = dequant_nvfp4(codes, bs.view(np.uint8), np.float32(2.0))
    np.testing.assert_allclose(out, [[1.0, 2.0, 3.0, 6.0]])


def test_experts_int8_quant_dequant():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(2, 8, 4)).astype(np.float32)
    q = quantize_experts_int8({"gate_proj": {"weight": jnp.asarray(w)}})
    node = q["gate_proj"]
    assert node["qweight"].dtype == jnp.int8
    back = np.asarray(dequant_expert_int8(node))
    np.testing.assert_allclose(back, w, atol=np.abs(w).max() / 127 + 1e-6)


def test_experts_int8_through_moe_layer():
    from vllm_rust_tpu.layers.moe import MoESpec, moe_layer

    rng = np.random.default_rng(1)
    e, h, i, t = 4, 8, 16, 6
    params = {
        "router": {"weight": jnp.asarray(rng.normal(size=(h, e)), jnp.float32)},
        "experts": {
            "gate_proj": {"weight": jnp.asarray(rng.normal(size=(e, h, i)), jnp.float32)},
            "up_proj": {"weight": jnp.asarray(rng.normal(size=(e, h, i)), jnp.float32)},
            "down_proj": {"weight": jnp.asarray(rng.normal(size=(e, i, h)), jnp.float32)},
        },
    }
    spec = MoESpec(num_experts=e, top_k=2)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.float32)
    ref = np.asarray(moe_layer(spec, params, x, backend="dense"))

    qparams = dict(params)
    qparams["experts"] = quantize_experts_int8(params["experts"])
    got = np.asarray(moe_layer(spec, qparams, x, backend="dense"))
    # int8 per-channel quantization: ~1% relative error budget
    assert np.abs(got - ref).max() < 0.05 * np.abs(ref).max() + 0.05


def test_moe_wna16_awq_dequant():
    """AWQ-packed expert dequantizes to the scale/zero reconstruction."""
    k, n, g = 8, 8, 8
    rng = np.random.default_rng(2)
    q = rng.integers(0, 16, size=(k, n), dtype=np.int64)
    zeros = rng.integers(0, 16, size=(k // g, n), dtype=np.int64)
    scales = rng.uniform(0.5, 1.5, size=(k // g, n)).astype(np.float32)

    awq_order = [0, 2, 4, 6, 1, 3, 5, 7]

    def pack(vals):  # [r, c] int4 -> [r, c/8] int32 AWQ ordering
        r, c = vals.shape
        out = np.zeros((r, c // 8), np.int32)
        for j in range(c // 8):
            for pos, src in enumerate(awq_order):
                out[:, j] |= (vals[:, j * 8 + src].astype(np.int64) << (4 * pos)).astype(np.int64).astype(np.int32)
        return out

    dense = dequant_wna16_expert(pack(q), pack(zeros), scales, fmt="awq")
    ref = (q - np.repeat(zeros, g, axis=0)) * np.repeat(scales, g, axis=0)
    np.testing.assert_allclose(dense, ref, rtol=1e-6)


def test_kv_cache_scales_json(tmp_path):
    f = tmp_path / "kv_cache_scales.json"
    f.write_text(json.dumps(
        {"kv_cache": {"scaling_factor": {"0": 0.5, "1": {"0": 0.75}}}}
    ))
    assert load_kv_cache_scales(str(tmp_path), num_layers=2) == (0.75, 0.75)
    assert load_kv_cache_scales(str(tmp_path / "missing"), 2) is None
    assert load_kv_cache_scales(
        {"quantization_config": {"kv_scale": 0.25}}, 2
    ) == (0.25, 0.25)


def test_fp8_alias_loading():
    """An fbgemm_fp8 checkpoint loads through the shared fp8 path with
    per-channel scales."""
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.quantization.loader import load_quantized_weights
    from vllm_rust_tpu.quantization.types import QuantLinear
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    dense = model.init_params(jax.random.PRNGKey(0))
    h = mc.hidden_size

    rng = np.random.default_rng(3)
    wq = rng.normal(size=(h, h)).astype(np.float32).astype(
        np.dtype("float8_e4m3fn")
    )
    stream = [
        ("model.layers.0.self_attn.q_proj.weight", wq),
        ("model.layers.0.self_attn.q_proj.weight_scale",
         rng.uniform(0.5, 1.5, size=h).astype(np.float32)),
        ("model.embed_tokens.weight",
         rng.normal(size=(mc.vocab_size, h)).astype(np.float32)),
    ]
    params = load_quantized_weights(model, "fbgemm_fp8", {}, iter(stream))
    ql = params["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(ql, QuantLinear) and ql.method == "fp8"
    assert ql.scales.shape == (1, h)


def test_modelopt_fp4_loading():
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.quantization.loader import load_quantized_weights
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    h = mc.hidden_size
    rng = np.random.default_rng(4)
    packed = rng.integers(0, 256, size=(h, h // 2), dtype=np.uint8)
    bs = np.ones((h, h // 16), np.float32).astype(
        np.dtype("float8_e4m3fn")
    )
    stream = [
        ("model.layers.0.self_attn.q_proj.weight", packed),
        ("model.layers.0.self_attn.q_proj.weight_scale", bs),
        ("model.layers.0.self_attn.q_proj.weight_scale_2",
         np.float32(0.5)),
        ("model.embed_tokens.weight",
         rng.normal(size=(mc.vocab_size, h)).astype(np.float32)),
    ]
    params = load_quantized_weights(model, "modelopt_fp4", {}, iter(stream))
    w = params["layers"][0]["self_attn"]["q_proj"]["weight"]
    assert w.shape == (h, h)  # dense [K, N]
    assert np.isfinite(np.asarray(w)).all()
