"""int8-group MXU image vs the dense w4 reference (ops/int8_group.py).

The default serving path for AWQ/GPTQ/ct-w4: q8 = q - zero as int8,
group scales on the accumulator. Must match quant_matmul_w4a16_ref
(the correctness anchor both kernels share) to bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.ops.int8_group import (
    int8_group_matmul,
    lm_head_int8_matmul,
    prepare_int8_group,
    quantize_lm_head_int8,
)
from vllm_rust_tpu.ops.pallas.quant_matmul import quant_matmul_w4a16_ref
from vllm_rust_tpu.quantization.awq import make_w4a16_linear, repack_k_half


def _mk(k, n, g, seed=0, int_zero=True):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
    s = rng.uniform(0.005, 0.02, size=(k // g, n)).astype(np.float32)
    if int_zero:
        z = rng.integers(0, 16, size=(k // g, n)).astype(np.float32)
        zs = z * s
    else:
        zs = rng.uniform(-0.1, 0.1, size=(k // g, n)).astype(np.float32)
    return q, s, zs


@pytest.mark.parametrize("t", [1, 16, 300])
def test_matches_w4_reference(t):
    k, n, g = 512, 384, 128
    q, s, zs = _mk(k, n, g)
    img = prepare_int8_group(q, s, zs)
    assert img is not None and "zg" not in img  # integer zero -> exact
    x = jnp.asarray(np.random.default_rng(1).standard_normal((t, k)), jnp.bfloat16)
    ref = quant_matmul_w4a16_ref(
        x, jnp.asarray(repack_k_half(q)),
        jnp.asarray(s, jnp.bfloat16), jnp.asarray(zs, jnp.bfloat16))
    out = int8_group_matmul(
        x, jnp.asarray(img["q8g"]), jnp.asarray(img["sg"]))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_float_zero_residual_path():
    k, n, g = 256, 128, 64
    q, s, zs = _mk(k, n, g, int_zero=False)
    img = prepare_int8_group(q, s, zs)
    assert img is not None and "zg" in img
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, k)), jnp.bfloat16)
    ref = quant_matmul_w4a16_ref(
        x, jnp.asarray(repack_k_half(q)),
        jnp.asarray(s, jnp.bfloat16), jnp.asarray(zs, jnp.bfloat16))
    out = int8_group_matmul(
        x, jnp.asarray(img["q8g"]), jnp.asarray(img["sg"]),
        jnp.asarray(img["zg"]))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_small_groups_refused():
    q, s, zs = _mk(256, 128, 32)
    assert prepare_int8_group(q, s, zs) is None  # gs < MIN_GROUP


def test_make_w4a16_linear_defaults_to_int4_image(monkeypatch):
    # r5 default: NATIVE s4 serve (ops/int4_group.py) — half the HBM
    # bytes at the same dot numerics (benchmarks/int4_native_ab.py)
    monkeypatch.delenv("VLLM_TPU_W4_KERNEL", raising=False)
    monkeypatch.delenv("VLLM_TPU_W4_SERVE", raising=False)
    q, s, zs = _mk(512, 256, 128)
    ql = make_w4a16_linear(q, s, zs, None, "awq")
    assert "q4g" in ql.aux
    assert ql.in_features == 512 and ql.out_features == 256
    from vllm_rust_tpu.layers.linear import linear

    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 512)), jnp.bfloat16)
    out = linear(x, ql)
    ref = quant_matmul_w4a16_ref(
        x, jnp.asarray(repack_k_half(q)),
        jnp.asarray(s, jnp.bfloat16), jnp.asarray(zs, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_make_w4a16_linear_int8_image_escape(monkeypatch):
    monkeypatch.delenv("VLLM_TPU_W4_KERNEL", raising=False)
    monkeypatch.setenv("VLLM_TPU_W4_SERVE", "int8")
    q, s, zs = _mk(512, 256, 128)
    ql = make_w4a16_linear(q, s, zs, None, "awq")
    assert "q8g" in ql.aux
    assert ql.in_features == 512 and ql.out_features == 256
    from vllm_rust_tpu.layers.linear import linear

    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 512)), jnp.bfloat16)
    out = linear(x, ql)
    ref = quant_matmul_w4a16_ref(
        x, jnp.asarray(repack_k_half(q)),
        jnp.asarray(s, jnp.bfloat16), jnp.asarray(zs, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_w4_kernel_env_escape(monkeypatch):
    monkeypatch.setenv("VLLM_TPU_W4_KERNEL", "1")
    q, s, zs = _mk(512, 256, 128)
    ql = make_w4a16_linear(q, s, zs, None, "awq")
    assert "q8g" not in ql.aux
    assert ql.in_features == 512


def test_lm_head_int8():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((128, 512)).astype(np.float32) * 0.03
    q8, scale = quantize_lm_head_int8(w)
    x = jnp.asarray(rng.standard_normal((5, 128)), jnp.bfloat16)
    out = lm_head_int8_matmul(x, jnp.asarray(q8), jnp.asarray(scale))
    ref = np.asarray(x, np.float32) @ w
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.07, atol=0.03)


def test_quantize_lm_head_transform():
    from vllm_rust_tpu.quantization.compressed_tensors import quantize_lm_head

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((64, 256)) * 0.02, jnp.float32)
    params = {"lm_head": {"weight": w}}
    params = quantize_lm_head(params)
    from vllm_rust_tpu.layers.linear import linear

    x = jnp.asarray(rng.standard_normal((3, 64)), jnp.bfloat16)
    out = linear(x, params["lm_head"])
    ref = np.asarray(x, np.float32) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.07, atol=0.03)
    # tied-embedding models have no lm_head: transform is a no-op
    assert quantize_lm_head({"embed": 1}) == {"embed": 1}
