"""Tests for the extended tool-call / reasoning parser suite
(reference: crates/core/src/tool_parser/*.rs wire formats)."""

import json

from vllm_rust_tpu.tool_parser import available_tool_parsers, get_tool_parser
from vllm_rust_tpu.reasoning import available_reasoning_parsers, get_reasoning_parser


def _one(name, text):
    content, calls = get_tool_parser(name)(text)
    assert len(calls) == 1, f"{name}: {calls}"
    return content, calls[0]


def test_llama4_pythonic():
    content, tc = _one(
        "llama4_pythonic", "<|python_start|>[get_weather(city='NYC')]<|python_end|>"
    )
    assert tc.name == "get_weather"
    assert json.loads(tc.arguments) == {"city": "NYC"}


def test_olmo3():
    content, calls = get_tool_parser("olmo3")(
        "<function_calls>\nget_weather(city='NYC')\nget_time(tz='EST')\n</function_calls>"
    )
    assert [c.name for c in calls] == ["get_weather", "get_time"]
    assert json.loads(calls[1].arguments) == {"tz": "EST"}


def test_granite():
    content, tc = _one(
        "granite", '<|tool_call|>[{"name": "f", "arguments": {"x": 1}}]'
    )
    assert tc.name == "f" and json.loads(tc.arguments) == {"x": 1}


def test_granite_20b_fc():
    content, calls = get_tool_parser("granite-20b-fc")(
        '<function_call>{"name": "a", "arguments": {}}\n'
        '<function_call>{"name": "b", "arguments": {"k": 2}}'
    )
    assert [c.name for c in calls] == ["a", "b"]


def test_internlm2():
    content, tc = _one(
        "internlm2",
        'ok<|action_start|><|plugin|>{"name": "w", "parameters": {"c": "SF"}}<|action_end|>',
    )
    assert content == "ok"
    assert json.loads(tc.arguments) == {"c": "SF"}


def test_jamba_and_hunyuan():
    txt = '<tool_calls>[{"name": "f", "arguments": {"x": 1}}]</tool_calls>'
    for name in ("jamba", "hunyuan"):
        content, tc = _one(name, txt)
        assert tc.name == "f"
    # hunyuan ignores tool calls inside think blocks
    content, calls = get_tool_parser("hunyuan")(
        "<think><tool_calls>[{\"name\": \"f\", \"arguments\": {}}]</tool_calls></think>done"
    )
    assert calls == [] and "done" in content


def test_kimi_k2():
    content, tc = _one(
        "kimi_k2",
        "<|tool_calls_section_begin|>"
        '<|tool_call_begin|>functions.get_weather:0<|tool_call_argument_begin|>{"city": "NYC"}<|tool_call_end|>'
        "<|tool_calls_section_end|>",
    )
    assert tc.name == "get_weather"
    assert json.loads(tc.arguments) == {"city": "NYC"}


def test_minimax():
    content, calls = get_tool_parser("minimax")(
        '<think>inner</think>hi<tool_calls>\n{"name": "a", "arguments": {}}\n'
        '{"name": "b", "arguments": {"z": true}}\n</tool_calls>'
    )
    assert [c.name for c in calls] == ["a", "b"]
    assert content == "hi"


def test_minimax_m2():
    content, tc = _one(
        "minimax_m2",
        '<minimax:tool_call>\n<invoke name="get_weather">\n'
        '<parameter name="city">NYC</parameter>\n<parameter name="n">3</parameter>\n'
        "</invoke>\n</minimax:tool_call>",
    )
    assert tc.name == "get_weather"
    assert json.loads(tc.arguments) == {"city": "NYC", "n": 3}


def test_phi4mini():
    content, calls = get_tool_parser("phi4mini")(
        'functools[{"name": "f", "arguments": {"a": 1}}, {"name": "g", "parameters": {}}]'
    )
    assert [c.name for c in calls] == ["f", "g"]


def test_xlam():
    content, tc = _one("xlam", '```json\n[{"name": "f", "arguments": {}}]\n```')
    assert tc.name == "f"
    content, tc = _one("xlam", '</think>\n[{"name": "g", "arguments": {"q": 1}}]')
    assert tc.name == "g"


def test_glm4():
    content, tc = _one(
        "glm4",
        "<tool_call>get_weather\n<arg_key>city</arg_key>\n<arg_value>NYC</arg_value>\n"
        "<arg_key>n</arg_key>\n<arg_value>42</arg_value>\n</tool_call>",
    )
    assert tc.name == "get_weather"
    assert json.loads(tc.arguments) == {"city": "NYC", "n": 42}


def test_qwen3coder_and_seed_oss():
    content, tc = _one(
        "qwen3_coder",
        "<tool_call>\n<function=get_weather>\n<parameter=city>NYC</parameter>\n</function>\n</tool_call>",
    )
    assert tc.name == "get_weather" and json.loads(tc.arguments) == {"city": "NYC"}
    content, tc = _one(
        "seed_oss",
        "<seed:think>hmm</seed:think><seed:tool_call>\n<function=f>\n"
        "<parameter=k>true</parameter>\n</function>\n</seed:tool_call>",
    )
    assert json.loads(tc.arguments) == {"k": True}


def test_step3():
    content, tc = _one(
        "step3",
        "<｜tool_calls_begin｜>\n<｜tool_call_begin｜>function<｜tool_sep｜>\n"
        '<steptml:invoke name="get_weather">\n'
        '<steptml:parameter name="city">NYC</steptml:parameter>\n'
        "</steptml:invoke>\n<｜tool_call_end｜>\n<｜tool_calls_end｜>",
    )
    assert tc.name == "get_weather" and json.loads(tc.arguments) == {"city": "NYC"}


def test_ernie45():
    content, tc = _one(
        "ernie45",
        '<think>plan</think><tool_call>{"name": "f", "arguments": {"x": 1}}</tool_call>',
    )
    assert tc.name == "f"


def test_gigachat3():
    content, tc = _one("gigachat3", 'function call{"name": "f", "arguments": {}}')
    assert tc.name == "f"


def test_longcat():
    content, tc = _one(
        "longcat", '<longcat_tool_call>{"name": "f", "arguments": {"a": 2}}</longcat_tool_call>'
    )
    assert json.loads(tc.arguments) == {"a": 2}


def test_deepseek_v31():
    content, tc = _one(
        "deepseek_v31",
        "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_weather<｜tool▁sep｜>"
        '{"city": "NYC"}<｜tool▁call▁end｜><｜tool▁calls▁end｜>',
    )
    assert tc.name == "get_weather"


def test_deepseek_v32():
    content, tc = _one(
        "deepseek_v32",
        '<｜DSML｜function_calls>\n<｜DSML｜invoke name="get_weather">\n'
        '<｜DSML｜parameter name="city" string="true">NYC</｜DSML｜parameter>\n'
        '<｜DSML｜parameter name="n">7</｜DSML｜parameter>\n'
        "</｜DSML｜invoke>\n</｜DSML｜function_calls>",
    )
    assert json.loads(tc.arguments) == {"city": "NYC", "n": 7}


def test_functiongemma():
    content, tc = _one(
        "functiongemma",
        "<start_function_call>call:get_weather{city:<escape>NYC<escape>}<end_function_call>",
    )
    assert tc.name == "get_weather"
    assert json.loads(tc.arguments) == {"city": "NYC"}


def test_gemma4_tool():
    content, tc = _one(
        "gemma4", '<|tool_call>call:get_weather{city:<|"|>NYC<|"|>}<tool_call|>'
    )
    assert json.loads(tc.arguments) == {"city": "NYC"}


def test_json_parser():
    content, calls = get_tool_parser("json")(
        '[{"name": "a", "arguments": {}}, {"name": "b", "arguments": {"x": 1}}]'
    )
    assert [c.name for c in calls] == ["a", "b"]


def test_no_false_positives():
    """Plain text must pass through every parser unchanged."""
    plain = "The weather in NYC is sunny, around 25 degrees."
    for name in available_tool_parsers():
        content, calls = get_tool_parser(name)(plain)
        assert calls == [], name
        assert content == plain, name


def test_reasoning_registry_breadth():
    names = available_reasoning_parsers()
    for required in (
        "deepseek_r1", "mistral", "seed_oss", "minimax_m2", "ernie45",
        "gemma4", "olmo3", "step3p5", "glm45", "kimi_k2", "identity",
        "gpt_oss", "hunyuan_a13b", "minimax_m2_append_think", "holo2",
    ):
        assert required in names, required


def test_reasoning_mistral():
    r, c = get_reasoning_parser("mistral").parse("[THINK]plan[/THINK]answer")
    assert r == "plan" and c == "answer"
    # R1 mode: implicit open
    r, c = get_reasoning_parser("mistral").parse("reasoning...[/THINK]done")
    assert r == "reasoning..." and c == "done"


def test_reasoning_ernie45():
    r, c = get_reasoning_parser("ernie45").parse(
        "<think>plan</think>\n\n<response>\nanswer\n</response>\n"
    )
    assert r == "plan" and c == "answer"


def test_reasoning_gemma4():
    p = get_reasoning_parser("gemma4")
    r, c = p.parse("<|channel>thought\nplanning<channel|>The answer<turn|>")
    assert r == "planning" and c == "The answer"
    # unclosed trailing channel: body is reasoning, never content
    r, c = p.parse("<|channel>thought\nstill going")
    assert r == "still going" and c == ""


def test_reasoning_minimax_append():
    r, c = get_reasoning_parser("minimax_m2_append_think").parse("inner stuff")
    assert r is None and c == "<think>inner stuff"
