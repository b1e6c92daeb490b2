"""Streaming tool-call / reasoning delta parsing.

Gate (VERDICT round 1 #7, reference api/streaming.rs): streamed chunks
must reassemble EXACTLY to the non-streaming parse, for every format.
"""

import json

import pytest

from vllm_rust_tpu.reasoning import get_reasoning_parser
from vllm_rust_tpu.tool_parser import get_tool_parser
from vllm_rust_tpu.tool_parser.streaming import (
    StreamingReasoningParser,
    StreamingToolParser,
)

SAMPLES = {
    "hermes": (
        'I will check.\n<tool_call>\n{"name": "get_weather", "arguments": '
        '{"city": "NYC"}}\n</tool_call> done'
    ),
    "mistral": '[TOOL_CALLS][{"name": "f", "arguments": {"x": 1}}]',
    "llama4_pythonic": (
        "<|python_start|>[get_weather(city='NYC')]<|python_end|>"
    ),
    "granite": '<|tool_call|>[{"name": "f", "arguments": {"x": 1}}]',
    "internlm2": (
        'ok<|action_start|><|plugin|>{"name": "f", "parameters": {"x": 2}}'
        "<|action_end|>"
    ),
    "qwen3coder": (
        "<tool_call>\n<function=get_weather>\n<parameter=city>\nNYC\n"
        "</parameter>\n</function>\n</tool_call>"
    ),
    "kimi_k2": (
        "<|tool_calls_section_begin|><|tool_call_begin|>functions.f:0"
        '<|tool_call_argument_begin|>{"x": 1}<|tool_call_end|>'
        "<|tool_calls_section_end|>"
    ),
    "olmo3": (
        "<function_calls>\nget_weather(city='NYC')\n</function_calls>"
    ),
    "xlam": '[{"name": "f", "arguments": {"x": 1}}]',
}


def reassemble(name: str, text: str, chunk: int):
    parse = get_tool_parser(name)
    json_calls = name in ("xlam",)
    st = StreamingToolParser(parse, json_calls=json_calls)
    deltas = []
    for i in range(0, len(text), chunk):
        deltas.extend(st.push(text[i : i + chunk]))
    deltas.extend(st.finish())
    content = "".join(d.get("content", "") for d in deltas)
    calls: dict[int, dict] = {}
    for d in deltas:
        for tc in d.get("tool_calls", []):
            e = calls.setdefault(tc["index"], {"name": "", "arguments": ""})
            fn = tc.get("function", {})
            if "name" in fn:
                e["name"] = fn["name"]
            e["arguments"] += fn.get("arguments", "")
    return content, [calls[i] for i in sorted(calls)]


@pytest.mark.parametrize("name", sorted(SAMPLES))
@pytest.mark.parametrize("chunk", [1, 3, 7])
def test_stream_reassembles_to_final(name, chunk):
    text = SAMPLES[name]
    final_content, final_calls = get_tool_parser(name)(text)
    got_content, got_calls = reassemble(name, text, chunk)
    assert got_content == final_content, (
        f"{name}: streamed content {got_content!r} != {final_content!r}"
    )
    assert len(got_calls) == len(final_calls)
    for g, f in zip(got_calls, final_calls):
        assert g["name"] == f.name
        assert g["arguments"] == f.arguments


def test_stream_content_before_call_emitted_early():
    st = StreamingToolParser(get_tool_parser("hermes"))
    deltas = st.push("Hello there, let me ")
    text = "".join(d.get("content", "") for d in deltas)
    assert text.startswith("Hello there,")  # not held hostage by the parser


def test_stream_call_announced_once_with_stable_id():
    text = SAMPLES["hermes"]
    st = StreamingToolParser(get_tool_parser("hermes"))
    deltas = []
    for ch in text:
        deltas.extend(st.push(ch))
    deltas.extend(st.finish())
    ids = [
        tc["id"]
        for d in deltas
        for tc in d.get("tool_calls", [])
        if "id" in tc
    ]
    assert len(ids) == 1  # announced exactly once


# ---------------------------------------------------------------- reasoning

@pytest.mark.parametrize("chunk", [1, 4])
def test_reasoning_stream_reassembles(chunk):
    parser = get_reasoning_parser("deepseek_r1")
    text = "<think>step one\nstep two</think>The answer is 42."
    final_r, final_c = parser.parse(text)
    st = StreamingReasoningParser(parser)
    deltas = []
    for i in range(0, len(text), chunk):
        deltas.extend(st.push(text[i : i + chunk]))
    deltas.extend(st.finish())
    got_r = "".join(d.get("reasoning_content", "") for d in deltas)
    got_c = "".join(d.get("content", "") for d in deltas)
    assert got_r == (final_r or "")
    assert got_c == final_c


def test_reasoning_stream_implicit_open():
    parser = get_reasoning_parser("deepseek_r1")
    text = "thinking silently</think>visible"
    final_r, final_c = parser.parse(text)
    st = StreamingReasoningParser(parser)
    deltas = []
    for ch in text:
        deltas.extend(st.push(ch))
    deltas.extend(st.finish())
    assert "".join(d.get("reasoning_content", "") for d in deltas) == final_r
    assert "".join(d.get("content", "") for d in deltas) == final_c


def test_reasoning_streams_incrementally():
    """Reasoning must flow DURING the think block, not only at close."""
    parser = get_reasoning_parser("deepseek_r1")
    st = StreamingReasoningParser(parser)
    st.push("<think>a long reasoning passage that keeps going")
    deltas = st.push(" and going")
    combined = "".join(d.get("reasoning_content", "") for d in deltas)
    assert st.reasoning_sent > 0  # emitted before </think> arrived


# ---------------------------------------------------------- server-level SSE

def test_server_streaming_with_tools_and_reasoning():
    """The /v1/chat/completions SSE path with tool & reasoning parsers
    active: chunks are well-formed, a finish chunk closes the stream."""
    import asyncio
    import json as _json

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

    async def main():
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
        app = build_app(
            aeng, tok, model_name="tiny",
            tool_parser="hermes", reasoning_parser="qwen3",
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 6,
                    "temperature": 0.0,
                    "ignore_eos": True,
                    "stream": True,
                    "tools": [{"type": "function",
                               "function": {"name": "f", "parameters": {}}}],
                },
            )
            assert r.status == 200
            body = await r.text()
            chunks = [
                _json.loads(line[6:])
                for line in body.splitlines()
                if line.startswith("data: ") and line != "data: [DONE]"
            ]
            assert chunks, body
            # exactly one chunk carries the finish reason
            finishes = [
                c["choices"][0]["finish_reason"]
                for c in chunks
                if c["choices"] and c["choices"][0]["finish_reason"]
            ]
            assert finishes and finishes[-1] in ("stop", "length", "tool_calls")
            assert body.rstrip().endswith("data: [DONE]")
        finally:
            await client.close()
            aeng.shutdown()

    asyncio.run(main())
