"""Reasoning-content parsers (thinking-tag extraction).

Reference: crates/core/src/reasoning/mod.rs (ReasoningParser trait +
tag-mode machinery, ~15 parsers). A parser splits a completion into
(reasoning_content, content). The tag machinery covers most models;
named parsers bind concrete tags/quirks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

_REGISTRY: dict[str, "TagReasoningParser"] = {}


@dataclass(frozen=True)
class TagReasoningParser:
    """Extract <open>...<close> as reasoning.

    ``implicit_open``: models (DeepSeek-R1 served with its chat template)
    start generating INSIDE the think block — treat a leading close tag
    as closing an implicit open."""

    open_tag: str
    close_tag: str
    implicit_open: bool = False

    def parse(self, text: str) -> tuple[str | None, str]:
        start = text.find(self.open_tag)
        close = text.find(self.close_tag)
        if start < 0 and self.implicit_open and close >= 0:
            reasoning = text[:close]
            content = text[close + len(self.close_tag) :]
            return reasoning.strip(), content.lstrip("\n")
        if start < 0:
            return None, text
        if close < 0:  # unterminated think block: everything is reasoning
            return text[start + len(self.open_tag) :].strip(), ""
        reasoning = text[start + len(self.open_tag) : close]
        content = text[:start] + text[close + len(self.close_tag) :]
        return reasoning.strip(), content.lstrip("\n")


def register_reasoning_parser(name: str, parser: TagReasoningParser):
    _REGISTRY[name] = parser


def get_reasoning_parser(name: str) -> TagReasoningParser:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown reasoning parser {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available_reasoning_parsers() -> list[str]:
    return sorted(_REGISTRY)


for _name, _p in {
    "deepseek_r1": TagReasoningParser("<think>", "</think>", implicit_open=True),
    "deepseek_v3": TagReasoningParser("<think>", "</think>", implicit_open=True),
    "qwen3": TagReasoningParser("<think>", "</think>"),
    "granite": TagReasoningParser(
        "Here is my thought process:", "Here is my response:"
    ),
    "exaone": TagReasoningParser("<thought>", "</thought>"),
    "glm4": TagReasoningParser("<think>", "</think>"),
    "hunyuan": TagReasoningParser("<think>", "</think>", implicit_open=True),
    "kimi": TagReasoningParser("◁think▷", "◁/think▷"),
    "step3": TagReasoningParser("<think>", "</think>", implicit_open=True),
    "gptoss": TagReasoningParser(
        "<|channel|>analysis<|message|>", "<|channel|>final<|message|>"
    ),
}.items():
    register_reasoning_parser(_name, _p)
