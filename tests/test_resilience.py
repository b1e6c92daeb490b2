"""Resilience: profiled KV sizing, tiny-pool degraded boot, rate
limiting, graceful-shutdown drain.

Reference: ADR 0022 (OOM graceful degradation), ADR 0024 (profiled
headroom), api/middleware.rs (rate limiter), shutdown.rs.
"""

import asyncio

import jax
import jax.numpy as jnp
import pytest

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_engine_config, tiny_llama_config


def test_profiled_sizing_falls_back_on_cpu():
    """CPU backends expose no memory stats: profiling returns None and
    boot uses the budget default (no crash)."""
    from vllm_rust_tpu.kv_cache.sizing import profile_kv_budget

    cfg = tiny_llama_config()
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    out = profile_kv_budget(
        model, params, max_tokens_per_step=32, max_num_seqs=4,
        pages_per_seq=8,
    )
    # CPU either reports None (no stats) or a real budget if the backend
    # grew stats support; both are acceptable, crash is not
    assert out is None or out >= 0


def test_degraded_boot_on_oom(monkeypatch):
    """An unallocatable pool degrades to a tiny pool instead of failing
    (ADR 0022)."""
    from vllm_rust_tpu.kv_cache.manager import KVCacheManager

    cfg = tiny_engine_config(tiny_llama_config())
    cfg.cache.num_pages = 4096
    model = from_config(cfg.model, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    real = KVCacheManager.create_device_pools
    calls = {"n": 0}

    def fake(self, dtype, sharding=None, num_slots=1):
        calls["n"] += 1
        if self.config.num_pages > 64:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory (test)")
        return real(self, dtype, sharding=sharding, num_slots=num_slots)

    monkeypatch.setattr(KVCacheManager, "create_device_pools", fake)
    eng = LLMEngine(model, params, cfg)
    assert eng.degraded_kv
    assert eng.config.cache.num_pages <= 64
    assert calls["n"] >= 2
    # serving still works on the tiny pool
    out = eng.generate(
        [[5, 6, 7]], [SamplingParams(max_tokens=3, temperature=0.0,
                                     ignore_eos=True)]
    )
    assert len(out[0].token_ids) == 3


def test_rate_limiter_unit():
    from vllm_rust_tpu.server.app import RateLimiter

    rl = RateLimiter(max_concurrent=2)
    assert rl.try_acquire() and rl.try_acquire()
    assert not rl.try_acquire()  # at cap
    rl.release()
    assert rl.try_acquire()

    rl2 = RateLimiter(rps=1000.0, burst=2)
    assert rl2.try_acquire() and rl2.try_acquire()
    # bucket drained; immediate third may fail (burst=2)
    ok3 = rl2.try_acquire()
    assert ok3 in (True, False)


def test_server_rate_limit_and_drain():
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_rust_tpu.engine.async_engine import AsyncLLMEngine
    from vllm_rust_tpu.server.app import build_app
    from vllm_rust_tpu.tokenizer import MockTokenizer

    async def main():
        cfg = tiny_engine_config(tiny_llama_config())
        model = from_config(cfg.model, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        tok = MockTokenizer()
        engine = LLMEngine(model, params, cfg, tokenizer=tok)
        aeng = AsyncLLMEngine(engine)
        app = build_app(aeng, tok, model_name="tiny",
                        max_concurrent_requests=1)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # hold the single slot with a long request, second gets 429
            t1 = asyncio.create_task(
                client.post("/v1/completions",
                            json={"prompt": "a", "max_tokens": 40,
                                  "ignore_eos": True, "temperature": 0.0})
            )
            await asyncio.sleep(0.05)
            r2 = await client.post(
                "/v1/completions",
                json={"prompt": "b", "max_tokens": 1},
            )
            assert r2.status == 429
            r1 = await t1
            assert r1.status == 200

            # draining: /v1 rejected, /health still served
            app["draining"] = True
            r3 = await client.post(
                "/v1/completions", json={"prompt": "c", "max_tokens": 1}
            )
            assert r3.status == 503
            r4 = await client.get("/health")
            assert r4.status == 200
        finally:
            await client.close()
            aeng.shutdown()

    asyncio.run(main())
