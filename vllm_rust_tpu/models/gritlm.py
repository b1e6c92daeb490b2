"""GritLM: dual generative/embedding model on a Llama backbone.

Reference: crates/core/src/models/gritlm.rs:1-587 — generation is plain
causal-LM Llama; embedding mode runs the same causal backbone and
mean-pools the hidden states while EXCLUDING the instruction prefix
(`<s><|user|>\\nINSTRUCTION\\n<|embed|>\\n` or `<s><|embed|>\\n`) so task
instructions do not leak into the embedding (gritlm.rs:79-115
get_instruction_len).

TPU-native mapping: the backbone is the repo's functional Llama; the
instruction length is computed HOST-side from the prompt token ids (pure
python over a short list — no reason to trace it) and handed to the
embedding runner as a per-sequence pool offset (engine/embedding.py
``pool_skip``). Pooling itself stays one fused XLA segment-sum.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp

from .llama import LlamaForCausalLM

# Token-id patterns of the GritLM (Mistral-tokenizer) chat tags, as pinned
# by the reference (gritlm.rs:48-63 GritLMTokenIds::new). These are
# checkpoint-tokenizer constants, not tunables.
_USER_PATTERN = (28789, 28766, 1838, 28766, 28767, 13)  # <|user|>\n
_EMBED_NEWLINE_PATTERN = (13, 28789, 28766, 11888, 28766, 29958, 13)  # \n<|embed|>\n
_EMBED_PATTERN = (29871, 28766, 11888, 28766, 29958, 13)  # <|embed|>\n


def _find_subarray(arr: Sequence[int], target: Sequence[int], start: int):
    """First index >= start where `target` occurs in `arr`
    (gritlm.rs:66-76)."""
    t = len(target)
    for i in range(start, len(arr) - t + 1):
        if tuple(arr[i : i + t]) == tuple(target):
            return i
    return None


def get_instruction_len(token_ids: Sequence[int]) -> int:
    """Number of leading tokens to EXCLUDE from embedding pooling: BOS +
    user tags + instruction text + embed tags (gritlm.rs:84-115). Only
    content tokens after the embed tag are pooled; without any embed tag
    only the BOS token is skipped."""
    if not token_ids:
        return 0
    if _find_subarray(token_ids, _USER_PATTERN, 1) == 1:
        pattern = _EMBED_NEWLINE_PATTERN
    else:
        pattern = _EMBED_PATTERN
    idx = _find_subarray(token_ids, pattern, 1)
    if idx is not None:
        return idx + len(pattern)
    return 1  # BOS only


class GritLMForCausalLM(LlamaForCausalLM):
    """GritLM (reference models/gritlm.rs): Llama weights; generation is
    the stock causal path, embedding mode pools with the instruction
    prefix masked out (``embed_instruction_len`` consumed by
    engine/embedding.py)."""

    def __init__(self, config, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)

    # embedding-mode hook: engine_embed computes per-input pool offsets
    # with this (host-side) before dispatching the pooled prefill
    embed_instruction_len = staticmethod(get_instruction_len)
