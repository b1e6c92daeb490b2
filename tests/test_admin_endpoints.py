"""Admin model-management endpoints: browse, restart (atomic engine
swap + 503 rejection during swap), /load."""

import asyncio

import jax
import jax.numpy as jnp
from aiohttp.test_utils import TestClient, TestServer

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.engine.async_engine import AsyncLLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.server.app import build_app
from vllm_rust_tpu.testing import tiny_llama_config
from vllm_rust_tpu.tokenizer import MockTokenizer


def _make_engine():
    mc = tiny_llama_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=64,
        token_buckets=(16, 32, 64),
        fetch_interval=2,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return AsyncLLMEngine(LLMEngine(model, params, cfg, tokenizer=MockTokenizer()))


def test_admin_models_load_restart():
    async def main():
        aeng = _make_engine()
        swapped = {}

        def factory(model_name):
            swapped["name"] = model_name
            return _make_engine(), MockTokenizer(), model_name or "swapped"

        app = build_app(aeng, MockTokenizer(), model_name="tiny-llama",
                        engine_factory=factory)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/admin/models")
            assert r.status == 200
            body = await r.json()
            assert body["current"] == "tiny-llama"
            assert isinstance(body["models"], list)

            r = await client.get("/load")
            assert r.status == 200
            body = await r.json()
            assert body["server_load"] == 0

            r = await client.post("/admin/restart", json={"model": "other"})
            assert r.status == 200
            body = await r.json()
            assert body["model"] == "other"
            assert swapped["name"] == "other"

            # server still serves after the swap
            r = await client.post("/v1/completions", json={
                "model": "other", "prompt": "hi", "max_tokens": 2})
            assert r.status == 200

            # no factory -> 400
            app2 = build_app(_make_engine(), MockTokenizer())
            c2 = TestClient(TestServer(app2))
            await c2.start_server()
            r = await c2.post("/admin/restart", json={})
            assert r.status == 400
            await c2.close()
        finally:
            await client.close()

    asyncio.run(main())


def test_restarting_rejects_requests():
    async def main():
        aeng = _make_engine()
        app = build_app(aeng, MockTokenizer(), model_name="tiny-llama")
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            app["restarting"] = True
            r = await client.post("/v1/completions", json={
                "model": "m", "prompt": "hi", "max_tokens": 2})
            assert r.status == 503
            r = await client.get("/health")
            assert r.status == 200  # health stays up
            app["restarting"] = False
            r = await client.post("/v1/completions", json={
                "model": "m", "prompt": "hi", "max_tokens": 2})
            assert r.status == 200
        finally:
            await client.close()

    asyncio.run(main())
