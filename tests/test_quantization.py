"""Quantization correctness: unpack round-trips, kernel vs dense ref,
end-to-end quantized model forward.

Reference test strategy: kernel outputs pinned against CPU reference
implementations (SURVEY.md §4 GPU tests; ADR 0025 golden-vector idea).
"""

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
