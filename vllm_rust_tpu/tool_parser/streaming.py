"""Incremental (streaming) tool-call and reasoning parsing.

Reference: crates/server/src/api/streaming.rs (1187 LoC) +
crates/core/src/tool_parser/ streaming partial-parse. Design here: a
**re-parse + diff** wrapper over the existing final-text parsers. Each
pushed chunk re-parses the accumulated text with the format's final
parser and diffs against what was already emitted:

  - content is emitted only up to the earliest point that could still
    become part of a tool-call marker (marker hold-back), so emitted
    content never has to be retracted;
  - a call is announced (id + name) the first time the final parser
    resolves it; its argument string streams as a delta whenever it
    grows.

Because the emitted stream is derived from the final parser itself,
re-assembling the deltas ALWAYS equals the non-streaming parse — for
every registered format, by construction (the reference needs 29
hand-written incremental parsers to approximate this).
"""

from __future__ import annotations

import uuid

# conservative global marker set: any text that could begin one of these
# is held back until resolved (union over the registered wire formats)
DEFAULT_MARKERS = [
    "<tool_call>", "</tool_call>",
    "<|tool_call|>", "<|tool▁calls▁begin|>", "<tool▁calls▁begin>",
    "[TOOL_CALLS]",
    "<|python_start|>", "<|python_tag|>",
    "<function_calls>", "<function=", "<function_call>",
    "<tools>", "<tool>",
    "<|action_start|>", "<|plugin|>",
    "<|channel|>", "<|call|>",
    "<seed:tool_call>", "<minimax:tool_call>",
    "<|tool_calls_section_begin|>", "<|tool_call_begin|>",
    "<longcat_tool_call>", "<|toolcall|>", "<gigachat3_tool_call|>",
    "<APIs>", "[Calls]", "``", "functioncall",
]

# formats whose calls are bare JSON (no marker): hold back at braces
JSON_CALL_MARKERS = ["{", "["]


class StreamingToolParser:
    """Wraps a final-text tool parser into an incremental one."""

    def __init__(self, parse_fn, markers: list[str] | None = None,
                 json_calls: bool = False):
        self.parse = parse_fn
        self.markers = list(markers or DEFAULT_MARKERS)
        if json_calls:
            self.markers += JSON_CALL_MARKERS
        self.text = ""
        self.content_sent = 0
        # per call index: {"id": str, "name_sent": bool, "args_sent": int}
        self.calls_state: list[dict] = []
        self.finished_calls = []

    # -- helpers ------------------------------------------------------------

    def _hold_back(self, content: str, start: int) -> int:
        """Largest safe emission end within content[start:]: stop at the
        first character that begins (or could begin) a marker."""
        end = len(content)
        region = content[start:]
        for m in self.markers:
            # full occurrence anywhere in the unemitted region
            i = region.find(m)
            if i >= 0:
                end = min(end, start + i)
        # longest tail of the emittable window that is a strict prefix of
        # some marker must also be withheld
        window = content[start:end]
        max_m = max((len(m) for m in self.markers), default=0)
        held = 0
        for k in range(1, min(max_m, len(window)) + 1):
            suf = window[-k:]
            if any(len(m) > k and m.startswith(suf) for m in self.markers):
                held = k
        end -= held
        # trailing whitespace may be stripped by the final parser — hold
        while end > start and content[end - 1] in " \n\t":
            end -= 1
        return max(end, start)

    def _diff(self, final: bool) -> list[dict]:
        """OpenAI chat deltas for the current accumulated text."""
        try:
            content, calls = self.parse(self.text)
        except Exception:
            if not final:
                return []  # partial text confused the parser; wait
            content, calls = self.text, []
        deltas: list[dict] = []

        # content
        end = len(content) if final else self._hold_back(
            content, self.content_sent
        )
        if end > self.content_sent:
            deltas.append({"content": content[self.content_sent : end]})
            self.content_sent = end

        # calls
        for i, call in enumerate(calls):
            if i >= len(self.calls_state):
                self.calls_state.append(
                    {"id": f"call_{uuid.uuid4().hex[:24]}",
                     "name_sent": False, "args_sent": 0}
                )
            st = self.calls_state[i]
            entry: dict = {"index": i}
            fn: dict = {}
            if not st["name_sent"]:
                entry["id"] = st["id"]
                entry["type"] = "function"
                fn["name"] = call.name
                st["name_sent"] = True
            args = call.arguments or ""
            if len(args) > st["args_sent"]:
                fn["arguments"] = args[st["args_sent"] :]
                st["args_sent"] = len(args)
            if fn or "id" in entry:
                entry["function"] = fn
                deltas.append({"tool_calls": [entry]})
        if final:
            self.finished_calls = calls
        return deltas

    # -- public -------------------------------------------------------------

    def push(self, new_text: str) -> list[dict]:
        self.text += new_text
        return self._diff(final=False)

    def finish(self) -> list[dict]:
        return self._diff(final=True)

    @property
    def has_calls(self) -> bool:
        return bool(self.calls_state)


class StreamingReasoningParser:
    """Incremental thinking-tag splitter over a TagReasoningParser.

    push(delta) -> list of {"reasoning_content": str} / {"content": str}
    deltas whose concatenation per channel equals the final parse."""

    def __init__(self, parser):
        self.parser = parser
        self.text = ""
        self.reasoning_sent = 0
        self.content_sent = 0

    def _guards(self) -> tuple[str, ...]:
        return (self.parser.open_tag, self.parser.close_tag)

    def _safe_len(self, s: str, sent: int) -> int:
        """Emit up to the last point that cannot be a partial tag or
        strippable trailing whitespace."""
        end = len(s)
        for tag in self._guards():
            for k in range(1, min(len(tag), end) + 1):
                if tag.startswith(s[end - k :]):
                    end = min(end, len(s) - k)
                    break
        while end > sent and s[end - 1] in " \n\t":
            end -= 1
        return max(end, sent)

    def _diff(self, final: bool) -> list[dict]:
        reasoning, content = self.parser.parse(self.text)
        reasoning = reasoning or ""
        out = []
        r_end = len(reasoning) if final else self._safe_len(
            reasoning, self.reasoning_sent
        )
        if r_end > self.reasoning_sent:
            out.append(
                {"reasoning_content": reasoning[self.reasoning_sent : r_end]}
            )
            self.reasoning_sent = r_end
        c_end = len(content) if final else self._safe_len(
            content, self.content_sent
        )
        if c_end > self.content_sent:
            out.append({"content": content[self.content_sent : c_end]})
            self.content_sent = c_end
        return out

    def push(self, new_text: str) -> list[dict]:
        self.text += new_text
        return self._diff(final=False)

    def finish(self) -> list[dict]:
        return self._diff(final=True)
