"""Quantized KV cache (fp8/int8) tests.

Reference: kv_cache/quantization.rs (KVCacheDtype, pinned scales,
contract #10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config


def make_engine(kv_dtype="auto", k_scale=1.0, v_scale=1.0):
    mc = tiny_llama_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(
            num_pages=32, page_size=16, kv_dtype=kv_dtype,
            k_scale=k_scale, v_scale=v_scale,
        ),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg)


@pytest.mark.parametrize("kv_dtype", ["fp8_e4m3", "fp8_e5m2"])
def test_fp8_kv_close_to_bf16(kv_dtype):
    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    base = make_engine("auto").generate([prompt], sp)[0].token_ids
    q = make_engine(kv_dtype).generate([prompt], sp)[0].token_ids
    agree = sum(a == b for a, b in zip(base, q))
    assert agree >= 9, f"fp8 KV diverged too much: {base} vs {q}"


def test_fp8_pool_dtype_and_memory():
    eng = make_engine("fp8_e4m3")
    assert eng.kv_pages[0].dtype == jnp.float8_e4m3fn
    assert eng.model.kv_scales == (1.0, 1.0)
    eng2 = make_engine("auto")
    assert eng2.kv_pages[0].dtype == jnp.float32
    assert eng2.model.kv_scales is None


def test_int8_kv_with_scale():
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    prompt = [7, 8, 9, 10]
    base = make_engine("auto").generate([prompt], sp)[0].token_ids
    # activations are O(1); scale 0.05 gives int8 range ~[-0.64, 0.64] at fine granularity
    q = make_engine("int8", k_scale=0.005, v_scale=0.005).generate([prompt], sp)[0].token_ids
    agree = sum(a == b for a, b in zip(base, q))
    assert agree >= 7, f"int8 KV diverged too much: {base} vs {q}"
