"""Prometheus metrics registry + server exposition (metrics.py).

Reference: crates/server/src/api/admin/prometheus.rs:15-196 (counter/
gauge/histogram inventory) and api/mod.rs:829-897 (text encoder).
"""

import asyncio

import jax
import jax.numpy as jnp

from tests.test_server import _make_client
from vllm_rust_tpu import metrics as M


def test_histogram_cumulative_buckets():
    h = M.Histogram("h_test", "help", [0.1, 1.0, 10.0])
    for v in (0.05, 0.5, 0.5, 5.0, 50.0):
        h.observe(v)
    lines = h.render()
    assert 'h_test_bucket{le="0.1"} 1' in lines
    assert 'h_test_bucket{le="1"} 3' in lines
    assert 'h_test_bucket{le="10"} 4' in lines
    assert 'h_test_bucket{le="+Inf"} 5' in lines
    assert "h_test_count 5" in lines
    assert any(l.startswith("h_test_sum 56.") for l in lines)


def test_request_timer_lifecycle():
    before_ttft = M.TIME_TO_FIRST_TOKEN.count
    before_e2e = M.E2E_LATENCY.count
    t = M.RequestTimer()
    t.on_output(1)  # first token -> TTFT
    t.on_output(1)  # second -> TPOT
    t.on_finish()
    assert M.TIME_TO_FIRST_TOKEN.count == before_ttft + 1
    assert M.E2E_LATENCY.count == before_e2e + 1
    assert t.n_generated == 2


def test_refresh_engine_gauges():
    M.refresh_engine_gauges(
        {
            "num_running": 3,
            "num_waiting": 2,
            "free_kv_pages": 10,
            "total_kv_pages": 40,
            "num_preemptions": 7,
        }
    )
    assert M.RUNNING_REQUESTS.value == 3
    assert M.KV_CACHE_USAGE_RATIO.value == 0.75
    assert M.NUM_PREEMPTIONS.value >= 7


def test_metrics_endpoint_exposition():
    async def main():
        client, aeng = await _make_client()
        try:
            r = await client.post(
                "/v1/completions",
                json={"model": "m", "prompt": "hello", "max_tokens": 4},
            )
            assert r.status == 200
            r = await client.get("/metrics")
            text = await r.text()
        finally:
            await client.close()
            aeng.shutdown()
        assert "# TYPE vllm_requests_total counter" in text
        assert "# TYPE vllm_time_to_first_token_seconds histogram" in text
        assert 'vllm_time_to_first_token_seconds_bucket{le="+Inf"}' in text
        assert "vllm_kv_cache_total_blocks" in text
        assert "vllm_generation_tokens_total" in text
        assert "vllm_server_accepting_requests 1" in text
        # legacy raw-stat gauges still present
        assert "vllm_tpu_num_steps" in text

    asyncio.run(main())


def test_admin_spa_served():
    async def main():
        client, aeng = await _make_client()
        try:
            r = await client.get("/admin")
            text = await r.text()
        finally:
            await client.close()
            aeng.shutdown()
        assert r.content_type == "text/html"
        for marker in ("viz-root", "drawLine", "vllm_generation_tokens_total",
                       "prefers-color-scheme: dark"):
            assert marker in text, marker

    asyncio.run(main())


def test_spec_decode_stats_exported():
    """VERDICT r2 #8: acceptance stats must reach /metrics + get_stats
    (reference engine/types.rs:322-390 SpecDecodingStats)."""
    import jax
    import jax.numpy as jnp

    from vllm_rust_tpu import metrics as M
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine.async_engine import AsyncLLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.spec_decode import NgramProposer
    from vllm_rust_tpu.spec_decode.engine import SpecLLMEngine
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng = SpecLLMEngine(model, params, cfg, proposer=NgramProposer(num_draft_tokens=3))
    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    eng.add_request("r", [5, 6, 7, 5, 6, 7, 5, 6], sp)
    while eng.has_unfinished:
        eng.step()

    async def main():
        import asyncio
        aeng = AsyncLLMEngine(eng, loop=asyncio.get_event_loop())
        try:
            s = aeng.get_stats()
            assert "spec_acceptance_rate" in s
            assert "spec_mean_accepted_length" in s
            assert s["spec_proposer"] == "NgramProposer"
            assert s["draft_tokens"] > 0
            M.refresh_engine_gauges(s)
        finally:
            aeng.shutdown()

    import asyncio
    asyncio.run(main())
    text = M.REGISTRY.render()
    assert "vllm_spec_decode_num_draft_tokens_total" in text
    assert "vllm_spec_decode_acceptance_rate" in text
    assert M.SPEC_DRAFT_TOKENS.value > 0
    assert M.SPEC_MEAN_ACCEPTED_LEN.value >= 1.0
