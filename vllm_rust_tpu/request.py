"""Request and sequence state.

Reference: crates/core/src/request.rs:9-160 (SequenceState,
num_computed_tokens, block table, status, finish reason) and
engine/types.rs GenerationParams. Block-table math lives in
kv_cache/block_table.py.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import numpy as np


class RequestStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    PREEMPTED = "preempted"
    FINISHED = "finished"


class FinishReason(enum.Enum):
    STOP = "stop"  # EOS or stop token/string
    LENGTH = "length"
    ABORT = "abort"
    ERROR = "error"


@dataclass
class SamplingParams:
    """Per-request sampling controls (reference: sampling/mod.rs:38-120)."""

    max_tokens: int = 128
    min_tokens: int = 0
    temperature: float = 1.0
    top_k: int = 0  # 0 = off
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: int | None = None
    stop: list[str] = field(default_factory=list)
    stop_token_ids: list[int] = field(default_factory=list)
    ignore_eos: bool = False
    logprobs: int | None = None
    # number of top-token logprobs to return per step (OpenAI
    # top_logprobs; reference sampling/mod.rs logprobs payload)
    top_logprobs: int | None = None
    # prompt logprobs / echo (reference engine/helpers.rs:860-890
    # contract #4: computed only on the ORIGINAL prefill)
    prompt_logprobs: bool = False
    echo: bool = False
    logit_bias: dict[int, float] = field(default_factory=dict)
    # typical-p (locally typical) sampling; 1.0 = off
    typical_p: float = 1.0
    # ban these token sequences from being generated (token-id lists;
    # strings are tokenized at admission — reference
    # logits_processor.rs BadWords)
    bad_words: list = field(default_factory=list)
    # restrict sampling to this token-id whitelist (reference
    # logits_processor.rs AllowedTokenIds)
    allowed_token_ids: list[int] = field(default_factory=list)
    # structured output: {"choice": [...]} | {"regex": str} |
    # {"json_schema": {...}} | {"json_object": True} (grammar/constraint.py)
    constraint: dict | None = None
    # name of a loaded LoRA adapter (engine.lora manager slot lookup)
    lora_name: str | None = None
    greedy: bool | None = None  # derived: temperature == 0

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.greedy is None:
            self.greedy = self.temperature == 0.0

    @property
    def uses_penalties(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
        )


@dataclass
class Sequence:
    """One request's full mutable state inside the engine."""

    request_id: str
    prompt_token_ids: list[int]
    params: SamplingParams
    priority: int = 0
    arrival_time: float = field(default_factory=time.monotonic)

    status: RequestStatus = RequestStatus.WAITING
    # set on first waiting→running transition (queue-time metric); stays
    # put across preemption re-admissions
    first_scheduled_time: float | None = None
    generated_token_ids: list[int] = field(default_factory=list)
    # tokens whose KV is present in cache (reference: num_computed_tokens)
    num_computed_tokens: int = 0
    # persistent engine slot for device-side per-seq state (sampling seeds,
    # penalty counts); assigned at first scheduling, stable across steps
    slot: int = -1
    # 3-axis mrope (Qwen2-VL family): [3, prompt_len] position triple +
    # decode delta (pos3 = 1d_index + delta past the prompt)
    mrope_pos: "np.ndarray | None" = None
    mrope_delta: int = 0
    finish_reason: FinishReason | None = None
    stop_reason: str | int | None = None
    # incremental detokenization state (UTF-8-safe streaming, contract #7)
    prefix_offset: int = 0
    read_offset: int = 0
    output_text: str = ""
    # number of prompt tokens matched from the prefix cache
    num_cached_tokens: int = 0
    # gen_idx -> (cycle_id, ring_slot, row): ring location of each
    # still-on-device sampled token (token-ring pipeline, engine/engine.py)
    pending: dict[int, tuple[int, int, int]] = field(default_factory=dict)
    # structured output: compiled Constraint + current DFA state
    constraint: object | None = None
    constraint_state: int = 0
    # wave scheduling: this seq needs its last token resolved (host-side
    # DFA / bad-word suffix advance) before it can be scheduled again
    resolve_before_schedule: bool = False
    # LoRA adapter slot (-1 = none)
    lora_slot: int = -1
    # swap-mode preemption: KV pages live in host memory awaiting resume
    swapped: bool = False
    # allowed_token_ids compiled to a packed bitmask [ceil(V/32)] i32
    allowed_mask: object | None = None
    # accumulated top-logprob candidates per emitted token
    top_logprobs_acc: list | None = None
    # accumulated chosen-token logprobs (params.logprobs requests)
    logprobs_acc: list | None = None
    # prompt logprobs collected during the original prefill (contract #4)
    prompt_logprobs_acc: list | None = None

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_generated(self) -> int:
        return len(self.generated_token_ids)

    @property
    def total_len(self) -> int:
        """Prompt + generated. After recompute-preemption, re-prefill covers
        this full range while the generation budget stays based on
        num_generated (reference contract: helpers.rs:1432-1470)."""
        return self.num_prompt_tokens + self.num_generated

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.generated_token_ids

    @property
    def is_finished(self) -> bool:
        return self.status == RequestStatus.FINISHED

    @property
    def remaining_prefill(self) -> int:
        """Tokens whose KV still needs computing before decode can start."""
        return max(0, self.total_len - self.num_computed_tokens)

    def reset_for_recompute(self) -> None:
        """Recompute preemption: drop KV, keep generated tokens separate
        from prompt (reference contract #3)."""
        self.num_computed_tokens = 0
        self.status = RequestStatus.PREEMPTED


@dataclass
class RequestOutput:
    """Per-step output delta for one request."""

    request_id: str
    new_token_ids: list[int]
    new_text: str
    finished: bool
    finish_reason: FinishReason | None = None
    stop_reason: str | int | None = None
    output_text: str = ""  # cumulative
    token_ids: list[int] = field(default_factory=list)  # cumulative generated
    logprobs: list[float] | None = None
    # per emitted token: list of (token_id, logprob) candidates, best-first
    top_logprobs: list[list[tuple[int, float]]] | None = None
    # prompt-position logprobs (echo): [None, lp(tok1|tok0), ...]
    prompt_logprobs: list | None = None
