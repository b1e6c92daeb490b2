"""OpenAI / Anthropic API request & response types.

Reference: crates/server/src/api/types.rs (shared DTOs, 2318 LoC) and
validation.rs. Pydantic models give us parsing + validation in one step.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Literal

from pydantic import BaseModel, Field, field_validator

from ..request import SamplingParams


def _gen_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


# ---------------------------------------------------------------------------
# OpenAI: completions
# ---------------------------------------------------------------------------


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: str | list[str] | list[int] | list[list[int]] = ""
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    n: int = 1
    stream: bool = False
    stream_options: dict | None = None
    logprobs: int | None = None
    echo: bool = False
    stop: str | list[str] | None = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: int | None = None
    min_tokens: int = 0
    ignore_eos: bool = False
    stop_token_ids: list[int] | None = None
    logit_bias: dict[str, float] | None = None
    typical_p: float = 1.0
    bad_words: list[str] | None = None
    allowed_token_ids: list[int] | None = None
    user: str | None = None

    @field_validator("max_tokens")
    @classmethod
    def _positive(cls, v):
        if v < 1:
            raise ValueError("max_tokens must be >= 1")
        return v

    def sampling_params(self) -> SamplingParams:
        stops = self.stop if isinstance(self.stop, list) else (
            [self.stop] if self.stop else []
        )
        return SamplingParams(
            max_tokens=self.max_tokens,
            min_tokens=self.min_tokens,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            min_p=self.min_p,
            repetition_penalty=self.repetition_penalty,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            seed=self.seed,
            stop=stops,
            stop_token_ids=self.stop_token_ids or [],
            ignore_eos=self.ignore_eos,
            # completions-style logprobs=N means chosen + N alternatives
            logprobs=1 if self.logprobs is not None else None,
            top_logprobs=self.logprobs,
            prompt_logprobs=self.echo and self.logprobs is not None,
            echo=self.echo,
            logit_bias={int(k): v for k, v in (self.logit_bias or {}).items()},
            typical_p=self.typical_p,
            bad_words=list(self.bad_words or []),
            allowed_token_ids=list(self.allowed_token_ids or []),
        )


# ---------------------------------------------------------------------------
# OpenAI: chat completions
# ---------------------------------------------------------------------------


class ChatMessage(BaseModel):
    role: str
    content: str | list[dict] | None = None
    name: str | None = None
    tool_calls: list[dict] | None = None
    tool_call_id: str | None = None
    reasoning_content: str | None = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: list[ChatMessage]
    max_tokens: int | None = None
    max_completion_tokens: int | None = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    n: int = 1
    stream: bool = False
    stream_options: dict | None = None
    logprobs: bool = False
    top_logprobs: int | None = None
    stop: str | list[str] | None = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: int | None = None
    min_tokens: int = 0
    ignore_eos: bool = False
    stop_token_ids: list[int] | None = None
    tools: list[dict] | None = None
    tool_choice: Any = None
    response_format: dict | None = None
    chat_template: str | None = None
    chat_template_kwargs: dict = Field(default_factory=dict)
    logit_bias: dict[str, float] | None = None
    typical_p: float = 1.0
    bad_words: list[str] | None = None
    allowed_token_ids: list[int] | None = None
    user: str | None = None

    def _constraint(self) -> dict | None:
        rf = self.response_format
        if not rf:
            return None
        kind = rf.get("type")
        if kind == "json_object":
            return {"json_object": True}
        if kind == "json_schema":
            js = rf.get("json_schema", {})
            schema = js.get("schema", js)
            return {"json_schema": schema}
        if kind in ("grammar", "ebnf"):
            # vLLM-style EBNF grammar response format
            g = rf.get("grammar") or rf.get("ebnf")
            if isinstance(g, dict):
                g = g.get("definition") or g.get("grammar")
            return {"ebnf": g}
        if kind == "regex":
            r = rf.get("regex")
            if isinstance(r, dict):
                r = r.get("pattern")
            return {"regex": r}
        if kind == "choice":
            return {"choice": rf.get("choice")}
        if kind in (None, "text"):
            return None
        raise ValueError(f"unsupported response_format type {kind!r}")

    def sampling_params(self) -> SamplingParams:
        stops = self.stop if isinstance(self.stop, list) else (
            [self.stop] if self.stop else []
        )
        return SamplingParams(
            constraint=self._constraint(),
            max_tokens=self.max_completion_tokens or self.max_tokens or 1024,
            min_tokens=self.min_tokens,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            min_p=self.min_p,
            repetition_penalty=self.repetition_penalty,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            seed=self.seed,
            stop=stops,
            stop_token_ids=self.stop_token_ids or [],
            ignore_eos=self.ignore_eos,
            logprobs=1 if self.logprobs else None,
            top_logprobs=self.top_logprobs,
            logit_bias={int(k): v for k, v in (self.logit_bias or {}).items()},
            typical_p=self.typical_p,
            bad_words=list(self.bad_words or []),
            allowed_token_ids=list(self.allowed_token_ids or []),
        )


# ---------------------------------------------------------------------------
# Anthropic: messages
# ---------------------------------------------------------------------------


class AnthropicMessagesRequest(BaseModel):
    model: str = ""
    messages: list[dict]
    system: str | list[dict] | None = None
    max_tokens: int = 1024
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    stop_sequences: list[str] = Field(default_factory=list)
    stream: bool = False
    metadata: dict | None = None

    def sampling_params(self) -> SamplingParams:
        return SamplingParams(
            max_tokens=self.max_tokens,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            stop=list(self.stop_sequences),
        )

    def to_chat_messages(self) -> list[dict]:
        msgs: list[dict] = []
        if self.system:
            sys_text = (
                self.system
                if isinstance(self.system, str)
                else "".join(b.get("text", "") for b in self.system)
            )
            msgs.append({"role": "system", "content": sys_text})
        for m in self.messages:
            content = m.get("content")
            if isinstance(content, list):
                content = "".join(
                    b.get("text", "") for b in content if b.get("type") == "text"
                )
            msgs.append({"role": m["role"], "content": content})
        return msgs


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


class EmbeddingRequest(BaseModel):
    model: str = ""
    input: str | list[str] | list[int] | list[list[int]]
    encoding_format: Literal["float", "base64"] = "float"
    dimensions: int | None = None
    user: str | None = None


# ---------------------------------------------------------------------------
# Response builders (plain dicts — serialized with json.dumps)
# ---------------------------------------------------------------------------


def completion_response(
    request_id: str, model: str, choices: list[dict], usage: dict
) -> dict:
    return {
        "id": request_id,
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage,
    }


def chat_response(
    request_id: str, model: str, choices: list[dict], usage: dict
) -> dict:
    return {
        "id": request_id,
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage,
    }


def usage_dict(prompt_tokens: int, completion_tokens: int) -> dict:
    return {
        "prompt_tokens": prompt_tokens,
        "completion_tokens": completion_tokens,
        "total_tokens": prompt_tokens + completion_tokens,
    }
