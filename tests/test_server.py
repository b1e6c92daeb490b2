"""HTTP API tests over a dummy-model engine.

Reference: crates/server API handler tests + grammar_strictness_e2e.rs
style end-to-end flows — here with aiohttp's test client.
"""

import json

import jax
import jax.numpy as jnp
import asyncio

from aiohttp.test_utils import TestClient, TestServer

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.engine.async_engine import AsyncLLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.server.app import build_app
from vllm_rust_tpu.testing import tiny_llama_config
from vllm_rust_tpu.tokenizer import MockTokenizer


def with_client(test_fn):
    """Run an async test against a fresh server (no pytest-asyncio here)."""

    def wrapper():
        async def main():
            client, aeng = await _make_client()
            try:
                await test_fn(client)
            finally:
                await client.close()
                aeng.shutdown()

        asyncio.run(main())

    wrapper.__name__ = test_fn.__name__  # keep pytest collection name;
    # (functools.wraps would leak the `client` arg into pytest's fixture
    # resolution)
    return wrapper


async def _make_client():
    model_cfg = tiny_llama_config()
    cfg = EngineConfig(
        model=model_cfg,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=8, max_tokens_per_step=128),
        max_model_len=128,
        token_buckets=(16, 32, 64, 128),
        fetch_interval=2,
    )
    model = from_config(model_cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = MockTokenizer()
    engine = LLMEngine(model, params, cfg, tokenizer=tok)
    aeng = AsyncLLMEngine(engine)
    app = build_app(aeng, tok, model_name="tiny-llama")
    server = TestServer(app)
    c = TestClient(server)
    await c.start_server()
    return c, aeng


@with_client
async def test_health_version_models(client):
    r = await client.get("/health")
    assert r.status == 200
    r = await client.get("/version")
    assert (await r.json())["version"]
    r = await client.get("/v1/models")
    data = await r.json()
    assert data["data"][0]["id"] == "tiny-llama"


@with_client
async def test_completions(client):
    r = await client.post(
        "/v1/completions",
        json={
            "prompt": "hello",
            "max_tokens": 6,
            "temperature": 0.0,
            "ignore_eos": True,
        },
    )
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "text_completion"
    assert data["choices"][0]["finish_reason"] == "length"
    assert data["usage"]["completion_tokens"] == 6
    assert data["usage"]["prompt_tokens"] == 5


@with_client
async def test_completions_streaming(client):
    r = await client.post(
        "/v1/completions",
        json={
            "prompt": "hi",
            "max_tokens": 5,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
            "stream_options": {"include_usage": True},
        },
    )
    assert r.status == 200
    assert r.headers["Content-Type"].startswith("text/event-stream")
    body = await r.text()
    chunks = [
        json.loads(line[6:])
        for line in body.splitlines()
        if line.startswith("data: ") and line != "data: [DONE]"
    ]
    assert body.rstrip().endswith("data: [DONE]")
    finishes = [c["choices"][0]["finish_reason"] for c in chunks if c["choices"]]
    assert finishes[-1] == "length"
    usage = [c for c in chunks if c.get("usage")]
    assert usage and usage[-1]["usage"]["completion_tokens"] == 5


@with_client
async def test_chat_completions(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": "abc"}],
            "max_tokens": 4,
            "temperature": 0.0,
            "ignore_eos": True,
        },
    )
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "chat.completion"
    assert data["choices"][0]["message"]["role"] == "assistant"


@with_client
async def test_anthropic_messages(client):
    r = await client.post(
        "/v1/messages",
        json={
            "model": "m",
            "messages": [{"role": "user", "content": "xyz"}],
            "max_tokens": 4,
        },
    )
    assert r.status == 200
    data = await r.json()
    assert data["type"] == "message"
    assert data["content"][0]["type"] == "text"
    assert data["usage"]["output_tokens"] >= 1


@with_client
async def test_anthropic_streaming(client):
    r = await client.post(
        "/v1/messages",
        json={
            "model": "m",
            "messages": [{"role": "user", "content": "xyz"}],
            "max_tokens": 4,
            "stream": True,
        },
    )
    body = await r.text()
    assert "event: message_start" in body
    assert "event: content_block_delta" in body or "event: message_stop" in body
    assert "event: message_stop" in body


@with_client
async def test_tokenize_detokenize(client):
    r = await client.post("/tokenize", json={"prompt": "abc"})
    data = await r.json()
    assert data["tokens"] == [97, 98, 99]
    r = await client.post("/detokenize", json={"tokens": [97, 98, 99]})
    assert (await r.json())["text"] == "abc"


@with_client
async def test_validation_error(client):
    r = await client.post("/v1/completions", json={"prompt": "x", "max_tokens": 0})
    assert r.status == 400
    data = await r.json()
    assert data["error"]["type"] == "invalid_request_error"


@with_client
async def test_metrics(client):
    await client.post(
        "/v1/completions",
        json={"prompt": "q", "max_tokens": 2, "temperature": 0.0, "ignore_eos": True},
    )
    r = await client.get("/metrics")
    text = await r.text()
    assert "vllm_tpu_generated_tokens" in text


@with_client
async def test_pause_resume(client):
    r = await client.post("/pause")
    assert (await client.get("/is_paused")).status == 200
    assert (await (await client.get("/is_paused")).json())["paused"] is True
    await client.post("/resume")
    assert (await (await client.get("/is_paused")).json())["paused"] is False


@with_client
async def test_embeddings_endpoint(client):
    r = await client.post(
        "/v1/embeddings", json={"input": ["hello", "world"]}
    )
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "list"
    assert len(data["data"]) == 2
    assert len(data["data"][0]["embedding"]) == 64
    assert data["usage"]["prompt_tokens"] == 10


@with_client
async def test_response_format_json(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": "emit json"}],
            "max_tokens": 40,
            "temperature": 0.7,
            "seed": 5,
            "response_format": {
                "type": "json_schema",
                "json_schema": {
                    "schema": {
                        "type": "object",
                        "properties": {"n": {"type": "integer"}},
                        "required": ["n"],
                    }
                },
            },
        },
    )
    assert r.status == 200
    data = await r.json()
    parsed = json.loads(data["choices"][0]["message"]["content"])
    assert isinstance(parsed["n"], int)


@with_client
async def test_responses_api(client):
    r = await client.post(
        "/v1/responses",
        json={"input": "hi there", "max_output_tokens": 5, "temperature": 0},
    )
    assert r.status == 200
    data = await r.json()
    assert data["status"] == "completed"
    assert data["output"][0]["content"][0]["type"] == "output_text"
    rid = data["id"]
    r = await client.get(f"/v1/responses/{rid}")
    assert (await r.json())["id"] == rid
    r = await client.get("/v1/responses/resp_nope")
    assert r.status == 404


@with_client
async def test_batches_api(client):
    import io

    jsonl = "\n".join(
        json.dumps(
            {
                "custom_id": f"r{i}",
                "method": "POST",
                "url": "/v1/chat/completions",
                "body": {
                    "messages": [{"role": "user", "content": f"q{i}"}],
                    "max_tokens": 3,
                    "temperature": 0,
                },
            }
        )
        for i in range(2)
    )
    from aiohttp import FormData

    fd = FormData()
    fd.add_field("file", io.BytesIO(jsonl.encode()), filename="b.jsonl")
    fd.add_field("purpose", "batch")
    r = await client.post("/v1/files", data=fd)
    fid = (await r.json())["id"]
    r = await client.post(
        "/v1/batches",
        json={"input_file_id": fid, "endpoint": "/v1/chat/completions"},
    )
    bid = (await r.json())["id"]
    for _ in range(100):
        b = await (await client.get(f"/v1/batches/{bid}")).json()
        if b["status"] == "completed":
            break
        await asyncio.sleep(0.1)
    assert b["status"] == "completed"
    assert b["request_counts"]["completed"] == 2
    r = await client.get(f"/v1/files/{b['output_file_id']}/content")
    lines = (await r.text()).splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["custom_id"] == "r0"


# -- encoder serving: score / rerank / classify / pooling ---------------------


def with_encoder_client(test_fn):
    def wrapper():
        async def main():
            from vllm_rust_tpu.config import ModelConfig
            from vllm_rust_tpu.engine.encoder import EncoderRunner

            mc = ModelConfig.from_dict(
                dict(
                    architectures=["BertForSequenceClassification"],
                    model_type="bert",
                    vocab_size=128,
                    hidden_size=32,
                    intermediate_size=64,
                    num_hidden_layers=2,
                    num_attention_heads=4,
                    max_position_embeddings=64,
                    num_labels=2,
                    id2label={"0": "neg", "1": "pos"},
                )
            )
            from vllm_rust_tpu.models import from_config as fc

            model = fc(mc, dtype=jnp.float32)
            params = model.init_params(jax.random.PRNGKey(0))
            tok = MockTokenizer()
            runner = EncoderRunner(model, params, tok, token_buckets=(16, 32, 64))
            app = build_app(None, tok, model_name="tiny-bert", encoder=runner)
            server = TestServer(app)
            client = TestClient(server)
            await client.start_server()
            try:
                await test_fn(client)
            finally:
                await client.close()

        asyncio.run(main())

    wrapper.__name__ = test_fn.__name__
    return wrapper


@with_encoder_client
async def test_encoder_score_and_rerank(client):
    r = await client.post(
        "/v1/score", json={"text_1": "a b c", "text_2": ["d e", "f g h"]}
    )
    assert r.status == 200, await r.text()
    data = await r.json()
    assert len(data["data"]) == 2
    assert all("score" in d for d in data["data"])

    r = await client.post(
        "/v1/rerank",
        json={"query": "a b", "documents": ["c d", "e f", "g h"], "top_n": 2},
    )
    data = await r.json()
    assert len(data["results"]) == 2
    assert (
        data["results"][0]["relevance_score"]
        >= data["results"][1]["relevance_score"]
    )
    assert "text" in data["results"][0]["document"]


@with_encoder_client
async def test_encoder_classify_embeddings_pooling(client):
    r = await client.post("/classify", json={"input": ["x y", "z w"]})
    data = await r.json()
    assert len(data["data"]) == 2
    assert data["data"][0]["label"] in ("neg", "pos")
    assert abs(sum(data["data"][0]["probs"]) - 1.0) < 1e-4

    r = await client.post("/v1/embeddings", json={"input": ["a b c"]})
    data = await r.json()
    assert len(data["data"][0]["embedding"]) == 32

    r = await client.post("/pooling", json={"input": ["a b"], "pooling": "cls"})
    data = await r.json()
    assert len(data["data"][0]["data"]) == 32

    # generate endpoints must 400 cleanly on an encoder server
    r = await client.post(
        "/v1/completions", json={"model": "m", "prompt": "hi"}
    )
    assert r.status == 400


@with_client
async def test_decoder_score_fallback(client):
    """Decoder engines score via embedding cosine similarity."""
    r = await client.post(
        "/score", json={"text_1": "a b c d", "text_2": "a b c d"}
    )
    assert r.status == 200, await r.text()
    data = await r.json()
    # identical texts -> cosine similarity 1
    assert abs(data["data"][0]["score"] - 1.0) < 1e-4


@with_client
async def test_admin_estimate_and_device(client):
    r = await client.get("/admin/device")
    assert r.status == 200
    data = await r.json()
    assert "chip_profile" in data or "error" in data

    r = await client.post(
        "/admin/estimate",
        json={
            "hf_config": {
                "architectures": ["LlamaForCausalLM"],
                "hidden_size": 4096,
                "intermediate_size": 11008,
                "num_hidden_layers": 32,
                "num_attention_heads": 32,
                "num_key_value_heads": 32,
                "vocab_size": 32000,
            },
            "weight_dtype": "awq",
            "batch_size": 8,
        },
    )
    assert r.status == 200, await r.text()
    est = await r.json()
    assert est["model"]["num_params"] > 6e9
    assert est["decode_tok_s_per_seq"] > 0
    assert est["aggregate_tok_s"] >= est["decode_tok_s_per_seq"]
    assert isinstance(est["fits"], bool)
    assert est["ttft_s"] > 0
