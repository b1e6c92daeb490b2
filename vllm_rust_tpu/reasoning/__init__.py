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
        if start < 0 and self.implicit_open and close < 0:
            # generation starts INSIDE the think block (R1 template) and
            # the close tag has not arrived: everything is reasoning —
            # keeps streaming and final parses consistent
            return text.strip() or None, ""
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


class Ernie45ReasoningParser(TagReasoningParser):
    """Ernie 4.5: ``<think>…</think>`` plus an optional ``<response>``
    wrapper around the content (reference reasoning/mod.rs
    Ernie45ReasoningParser)."""

    def __init__(self):
        super().__init__("<think>", "</think>", implicit_open=True)

    def parse(self, text: str) -> tuple[str | None, str]:
        import re

        reasoning, content = super().parse(text)
        m = re.search(r"(?s)<response>\s*(.*?)\s*</response>", content)
        if m:
            content = m.group(1)
        return reasoning, content


class Gemma4ReasoningParser(TagReasoningParser):
    """Gemma 4 channel format: ``<|channel>thought\\n…<channel|>answer``;
    consumes every channel block, unclosed trailing channel is reasoning
    (reference reasoning/mod.rs Gemma4ReasoningParser:1025-1063)."""

    START = "<|channel>"
    END = "<channel|>"

    def __init__(self):
        super().__init__(self.START, self.END)

    def parse(self, text: str) -> tuple[str | None, str]:
        reasoning_parts: list[str] = []
        content_parts: list[str] = []
        pos = 0
        if self.START not in text and self.END in text:
            # start tag lost upstream — leading close tag
            close = text.find(self.END)
            reasoning_parts.append(self._strip_label(text[:close]))
            pos = close + len(self.END)
        while True:
            start = text.find(self.START, pos)
            if start < 0:
                content_parts.append(text[pos:])
                break
            content_parts.append(text[pos:start])
            close = text.find(self.END, start)
            if close < 0:  # truncated mid-thought
                reasoning_parts.append(
                    self._strip_label(text[start + len(self.START) :])
                )
                break
            reasoning_parts.append(
                self._strip_label(text[start + len(self.START) : close])
            )
            pos = close + len(self.END)
        content = "".join(content_parts).strip()
        for suffix in ("<turn|>", "<eos>"):
            if content.endswith(suffix):
                content = content[: -len(suffix)].rstrip()
        reasoning = "\n".join(p for p in (r.strip() for r in reasoning_parts) if p)
        return (reasoning or None), content

    @staticmethod
    def _strip_label(body: str) -> str:
        if body.startswith("thought\n"):
            return body[len("thought\n") :]
        if body.strip() == "thought":
            return ""
        return body


class MiniMaxM2AppendThinkParser(TagReasoningParser):
    """MiniMax M2 append-think mode: the whole output is content with a
    ``<think>`` prefix re-attached (reference reasoning/mod.rs:862-876)."""

    def __init__(self):
        super().__init__("<think>", "</think>")

    def parse(self, text: str) -> tuple[str | None, str]:
        return None, f"<think>{text}"


class IdentityReasoningParser(TagReasoningParser):
    def __init__(self):
        super().__init__("", "")

    def parse(self, text: str) -> tuple[str | None, str]:
        return None, text


_R1 = dict(implicit_open=True)

for _name, _p in {
    # DeepSeek family (R1 mode: leading close tag closes an implicit open)
    "deepseek_r1": TagReasoningParser("<think>", "</think>", **_R1),
    "deepseek_v3": TagReasoningParser("<think>", "</think>", **_R1),
    "deepseek_v3_thinking": TagReasoningParser("<think>", "</think>", **_R1),
    "qwen3": TagReasoningParser("<think>", "</think>"),
    "mistral": TagReasoningParser("[THINK]", "[/THINK]", **_R1),
    "granite": TagReasoningParser(
        "Here is my thought process:", "Here is my response:"
    ),
    "exaone": TagReasoningParser("<thought>", "</thought>"),
    "glm4": TagReasoningParser("<think>", "</think>"),
    "glm45": TagReasoningParser("<think>", "</think>", **_R1),
    "hunyuan": TagReasoningParser("<think>", "</think>", **_R1),
    "hunyuan_a13b": TagReasoningParser("<think>", "</think>", **_R1),
    "kimi": TagReasoningParser("◁think▷", "◁/think▷"),
    "kimi_k2": TagReasoningParser("<think>", "</think>", **_R1),
    "step3": TagReasoningParser("<think>", "</think>", **_R1),
    "step3p5": TagReasoningParser("<think>", "</think>", **_R1),
    "olmo3": TagReasoningParser("<think>", "</think>", **_R1),
    "seed_oss": TagReasoningParser("<seed:think>", "</seed:think>", **_R1),
    "minimax_m2": TagReasoningParser("<think>", "</think>", **_R1),
    "minimax_m2_append_think": MiniMaxM2AppendThinkParser(),
    "holo2": TagReasoningParser("<think>", "</think>", **_R1),
    "ernie45": Ernie45ReasoningParser(),
    "gemma4": Gemma4ReasoningParser(),
    "gptoss": TagReasoningParser(
        "<|channel|>analysis<|message|>", "<|channel|>final<|message|>"
    ),
    "gpt_oss": TagReasoningParser(
        "<|channel|>analysis<|message|>", "<|channel|>final<|message|>"
    ),
    "identity": IdentityReasoningParser(),
}.items():
    register_reasoning_parser(_name, _p)
