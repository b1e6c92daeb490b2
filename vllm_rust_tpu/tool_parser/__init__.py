"""Tool-call output parsers.

Reference: crates/core/src/tool_parser/ (29 files, ~27 formats, registry
in tool_parser/mod.rs). Each parser turns a model's raw completion into
(content, [ToolCall]) where arguments are JSON strings (OpenAI wire
format). Streaming requests buffer and parse on finish in this round.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded string (OpenAI convention)
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}")

    def to_openai(self) -> dict:
        return {
            "id": self.id,
            "type": "function",
            "function": {"name": self.name, "arguments": self.arguments},
        }


ParseResult = tuple[str, list[ToolCall]]  # (content, tool calls)

_REGISTRY: dict[str, Callable[[str], ParseResult]] = {}


def register_tool_parser(*names: str):
    def deco(fn):
        for n in names:
            _REGISTRY[n] = fn
        return fn

    return deco


def get_tool_parser(name: str) -> Callable[[str], ParseResult]:
    _ensure_formats()
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown tool parser {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def _ensure_formats():
    from . import formats  # noqa: F401  (registers extended parsers)


def available_tool_parsers() -> list[str]:
    _ensure_formats()
    return sorted(_REGISTRY)


def _json_call(obj: dict, name_key="name", args_key="arguments") -> ToolCall | None:
    name = obj.get(name_key)
    args = obj.get(args_key, obj.get("parameters", {}))
    if not isinstance(name, str):
        return None
    if isinstance(args, str):
        return ToolCall(name=name, arguments=args)
    return ToolCall(name=name, arguments=json.dumps(args))


# ---------------------------------------------------------------------------
# formats
# ---------------------------------------------------------------------------


@register_tool_parser("hermes", "qwen", "qwen3", "qwen2")
def parse_hermes(text: str) -> ParseResult:
    """<tool_call>{"name": ..., "arguments": {...}}</tool_call> blocks
    (Hermes/Qwen convention, reference tool_parser/hermes.rs)."""
    calls: list[ToolCall] = []
    content_parts: list[str] = []
    pos = 0
    for m in re.finditer(r"<tool_call>\s*(.*?)\s*</tool_call>", text, re.S):
        content_parts.append(text[pos : m.start()])
        pos = m.end()
        try:
            obj = json.loads(m.group(1))
            tc = _json_call(obj)
            if tc:
                calls.append(tc)
        except json.JSONDecodeError:
            content_parts.append(m.group(0))
    content_parts.append(text[pos:])
    return "".join(content_parts).strip(), calls


@register_tool_parser("mistral")
def parse_mistral(text: str) -> ParseResult:
    """[TOOL_CALLS] [{"name": ..., "arguments": {...}}, ...]
    (reference tool_parser/mistral.rs)."""
    marker = "[TOOL_CALLS]"
    idx = text.find(marker)
    if idx < 0:
        return text, []
    content = text[:idx].strip()
    payload = text[idx + len(marker) :].strip()
    try:
        arr = json.loads(payload)
        if isinstance(arr, dict):
            arr = [arr]
        calls = [tc for o in arr if (tc := _json_call(o))]
        return content, calls
    except json.JSONDecodeError:
        return text, []


@register_tool_parser("llama3_json", "llama")
def parse_llama_json(text: str) -> ParseResult:
    """Bare JSON object(s) with name/parameters, optionally after
    <|python_tag|> (reference tool_parser/llama.rs)."""
    t = text.strip()
    if t.startswith("<|python_tag|>"):
        t = t[len("<|python_tag|>") :]
    candidates = [c.strip() for c in t.split(";")] if ";" in t else [t]
    calls = []
    for c in candidates:
        if not (c.startswith("{") and c.endswith("}")):
            return text, []
        try:
            obj = json.loads(c)
        except json.JSONDecodeError:
            return text, []
        tc = _json_call(obj)
        if tc is None:
            return text, []
        calls.append(tc)
    return "", calls


@register_tool_parser("pythonic")
def parse_pythonic(text: str) -> ParseResult:
    """[get_weather(city='SF'), other_fn(x=3)]
    (reference tool_parser/pythonic.rs)."""
    import ast

    t = text.strip()
    if not (t.startswith("[") and t.endswith("]")):
        return text, []
    try:
        tree = ast.parse(t, mode="eval")
    except SyntaxError:
        return text, []
    if not isinstance(tree.body, ast.List):
        return text, []
    calls = []
    for el in tree.body.elts:
        if not isinstance(el, ast.Call) or not isinstance(el.func, ast.Name):
            return text, []
        args = {}
        for kw in el.keywords:
            try:
                args[kw.arg] = ast.literal_eval(kw.value)
            except ValueError:
                return text, []
        calls.append(ToolCall(name=el.func.id, arguments=json.dumps(args)))
    return "", calls


@register_tool_parser("deepseek_v3", "deepseek")
def parse_deepseek(text: str) -> ParseResult:
    """DeepSeek tool-call blocks:
    <｜tool▁calls▁begin｜>...<｜tool▁call▁begin｜>fn<｜tool▁sep｜>{json}
    (reference tool_parser/deepseek*.rs)."""
    begin = "<｜tool▁calls▁begin｜>"
    if begin not in text:
        return text, []
    content, _, rest = text.partition(begin)
    calls = []
    for m in re.finditer(
        r"<｜tool▁call▁begin｜>(?:function<｜tool▁sep｜>)?([\w\-.]+)\s*\n?```json\n(.*?)\n```",
        rest,
        re.S,
    ):
        try:
            args = json.loads(m.group(2))
            calls.append(ToolCall(name=m.group(1), arguments=json.dumps(args)))
        except json.JSONDecodeError:
            continue
    if not calls:
        # simpler variant: name<sep>{json}
        for m in re.finditer(
            r"<｜tool▁call▁begin｜>([\w\-.]+)<｜tool▁sep｜>(\{.*?\})", rest, re.S
        ):
            try:
                args = json.loads(m.group(2))
                calls.append(ToolCall(name=m.group(1), arguments=json.dumps(args)))
            except json.JSONDecodeError:
                continue
    return content.strip(), calls
