"""Tokenizer wrapper + chat templates.

Reference: crates/core/src/tokenizer.rs:7 (TokenizerWrapper over HF
tokenizers) and :272 (ChatTemplateEngine, minijinja). Here: the `tokenizers`
library + jinja2 for chat templates from tokenizer_config.json, with the
tool-aware render context the OpenAI chat endpoint needs.
"""

from __future__ import annotations

import json
import os
from typing import Any


class TokenizerWrapper:
    def __init__(self, model_dir: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
        self.eos_token_id: int | None = None
        self.bos_token_id: int | None = None
        self.chat_template: str | None = None
        self._load_config(model_dir)

    def _load_config(self, model_dir: str) -> None:
        cfg_path = os.path.join(model_dir, "tokenizer_config.json")
        if not os.path.exists(cfg_path):
            return
        with open(cfg_path) as f:
            cfg = json.load(f)
        self.chat_template = cfg.get("chat_template")

        def tok_to_id(t):
            if t is None:
                return None
            if isinstance(t, dict):
                t = t.get("content")
            return self._tok.token_to_id(t) if t else None

        self.eos_token_id = tok_to_id(cfg.get("eos_token"))
        self.bos_token_id = tok_to_id(cfg.get("bos_token"))
        self._eos_token = cfg.get("eos_token")
        self._bos_token = cfg.get("bos_token")
        gen_cfg = os.path.join(model_dir, "generation_config.json")
        if os.path.exists(gen_cfg):
            with open(gen_cfg) as f:
                g = json.load(f)
            if self.eos_token_id is None and g.get("eos_token_id") is not None:
                e = g["eos_token_id"]
                self.eos_token_id = e[0] if isinstance(e, list) else e

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        return self._tok.encode(text, add_special_tokens=add_special_tokens).ids

    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def apply_chat_template(
        self,
        messages: list[dict[str, Any]],
        *,
        tools: list[dict] | None = None,
        add_generation_prompt: bool = True,
        chat_template: str | None = None,
        **extra,
    ) -> str:
        template = chat_template or self.chat_template
        if template is None:
            # trivial fallback
            parts = [f"{m['role']}: {m.get('content','')}" for m in messages]
            if add_generation_prompt:
                parts.append("assistant:")
            return "\n".join(parts)
        import jinja2

        env = jinja2.Environment(
            loader=jinja2.BaseLoader(), keep_trailing_newline=True
        )
        env.filters["tojson"] = lambda v, **kw: json.dumps(v, **kw)
        env.globals["raise_exception"] = _raise_template_error
        tmpl = env.from_string(template)
        ctx = dict(
            messages=messages,
            tools=tools,
            add_generation_prompt=add_generation_prompt,
            bos_token=getattr(self, "_bos_token", None) or "",
            eos_token=getattr(self, "_eos_token", None) or "",
            **extra,
        )
        if isinstance(ctx["bos_token"], dict):
            ctx["bos_token"] = ctx["bos_token"].get("content", "")
        if isinstance(ctx["eos_token"], dict):
            ctx["eos_token"] = ctx["eos_token"].get("content", "")
        return tmpl.render(**ctx)


def _raise_template_error(msg: str):
    raise ValueError(f"chat template error: {msg}")


class MockTokenizer:
    """Byte-level mock for engine tests (reference testing/ fixtures):
    token id = byte value; decode maps back to latin-1 text."""

    eos_token_id = 0
    bos_token_id = None
    chat_template = None

    def __init__(self, vocab_size: int = 256):
        self.vocab_size = vocab_size

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        return [b % self.vocab_size for b in text.encode("utf-8")]

    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:
        return bytes(int(i) % 256 for i in ids).decode("utf-8", errors="replace")

    def apply_chat_template(self, messages, **kw) -> str:
        return "\n".join(m.get("content", "") for m in messages)


def load_tokenizer(model_dir: str) -> TokenizerWrapper:
    return TokenizerWrapper(model_dir)
