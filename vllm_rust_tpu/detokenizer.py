"""Incremental, UTF-8-safe detokenization.

Reference contract #7 (engine/helpers.rs:2850-2870): never slice a
multi-byte character at a chunk boundary; if the newly decoded text ends
in a replacement character, emit nothing and retry next step.
"""

from __future__ import annotations

REPLACEMENT = "�"


def detokenize_incrementally(
    tokenizer,
    all_ids: list[int],
    prefix_offset: int,
    read_offset: int,
) -> tuple[str, int, int]:
    """Returns (new_text_delta, new_prefix_offset, new_read_offset).

    The window [prefix_offset, read_offset) is previously-emitted context
    that anchors BPE merges; text is emitted only once it is stable and
    does not end mid-codepoint."""
    prefix_text = tokenizer.decode(all_ids[prefix_offset:read_offset])
    full_text = tokenizer.decode(all_ids[prefix_offset:])
    if len(full_text) > len(prefix_text) and not full_text.endswith(REPLACEMENT):
        delta = full_text[len(prefix_text):]
        return delta, read_offset, len(all_ids)
    return "", prefix_offset, read_offset


def find_stop(
    output_text: str, new_text: str, stops: list[str]
) -> tuple[str | None, int]:
    """Check whether any stop string appears once ``new_text`` is appended.

    Returns (matched_stop or None, truncate_at) where truncate_at is the
    index into the combined text where output should be cut (stop string
    excluded, matching reference/OpenAI semantics)."""
    if not stops:
        return None, -1
    combined = output_text + new_text
    # search window includes tail of old text in case the stop string spans
    # the boundary
    start = max(0, len(output_text) - max(len(s) for s in stops))
    best: tuple[str | None, int] = (None, -1)
    for s in stops:
        idx = combined.find(s, start)
        if idx != -1 and (best[1] == -1 or idx < best[1]):
            best = (s, idx)
    return best
