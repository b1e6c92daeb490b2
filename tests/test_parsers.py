"""Tool-call and reasoning parser tests."""

import json

from vllm_rust_tpu.reasoning import available_reasoning_parsers, get_reasoning_parser
from vllm_rust_tpu.tool_parser import available_tool_parsers, get_tool_parser


def test_hermes():
    p = get_tool_parser("hermes")
    text = (
        'Let me check.\n<tool_call>\n{"name": "get_weather", '
        '"arguments": {"city": "SF"}}\n</tool_call>'
    )
    content, calls = p(text)
    assert content == "Let me check."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "SF"}
    assert calls[0].to_openai()["type"] == "function"


def test_hermes_multiple_and_plain():
    p = get_tool_parser("hermes")
    text = (
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>'
    )
    content, calls = p(text)
    assert [c.name for c in calls] == ["a", "b"]
    content, calls = p("no tools here")
    assert content == "no tools here" and calls == []


def test_mistral():
    p = get_tool_parser("mistral")
    content, calls = p('[TOOL_CALLS] [{"name": "f", "arguments": {"a": 2}}]')
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"a": 2}


def test_llama_json():
    p = get_tool_parser("llama3_json")
    content, calls = p('{"name": "lookup", "parameters": {"q": "tpu"}}')
    assert calls[0].name == "lookup"
    assert json.loads(calls[0].arguments) == {"q": "tpu"}
    content, calls = p("just text")
    assert calls == [] and content == "just text"


def test_pythonic():
    p = get_tool_parser("pythonic")
    content, calls = p("[get_weather(city='SF', units='C'), now()]")
    assert [c.name for c in calls] == ["get_weather", "now"]
    assert json.loads(calls[0].arguments) == {"city": "SF", "units": "C"}


def test_deepseek():
    p = get_tool_parser("deepseek_v3")
    text = (
        "thinking...<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>"
        'search<｜tool▁sep｜>{"q": "x"}'
    )
    content, calls = p(text)
    assert content == "thinking..."
    assert calls[0].name == "search"


def test_reasoning_deepseek_r1():
    p = get_reasoning_parser("deepseek_r1")
    r, c = p.parse("<think>step 1, step 2</think>The answer is 4.")
    assert r == "step 1, step 2"
    assert c == "The answer is 4."
    # implicit open (template starts inside the think block)
    r, c = p.parse("step A</think>Answer.")
    assert r == "step A" and c == "Answer."
    # unterminated
    r, c = p.parse("<think>still going")
    assert r == "still going" and c == ""


def test_reasoning_no_tags():
    p = get_reasoning_parser("qwen3")
    r, c = p.parse("plain answer")
    assert r is None and c == "plain answer"


def test_registries():
    assert "hermes" in available_tool_parsers()
    assert "mistral" in available_tool_parsers()
    assert "deepseek_r1" in available_reasoning_parsers()
    assert len(available_reasoning_parsers()) >= 8
