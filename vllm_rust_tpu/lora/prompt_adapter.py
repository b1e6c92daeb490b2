"""Prompt adapters (prefix tuning): learned virtual-token embeddings
prepended to the prompt.

Reference: crates/core/src/prompt_adapter/ (prefix-tuning style
adapters). TPU design: a prompt adapter is n_virtual learned embedding
rows; serving reuses the multimodal injection path (engine/vlm.py) —
the prompt is prefixed with n placeholder tokens and the adapter's
embeddings override them inside the jitted step, so prefill runs
unmodified and the adapter costs nothing at decode time.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.encdec import _NullProposer
from ..request import SamplingParams, Sequence
from ..scheduler import ScheduledSeq
from ..spec_decode.engine import SpecLLMEngine


@dataclass
class PromptAdapter:
    name: str
    embeddings: jax.Array  # [n_virtual, hidden]

    @property
    def num_virtual_tokens(self) -> int:
        return self.embeddings.shape[0]


class PromptAdapterManager:
    """Registry with LRU eviction (mirror of lora/manager.py LoraManager,
    reference prompt_adapter/ + lora/manager.rs:53)."""

    def __init__(self, capacity: int = 8):
        self.capacity = capacity
        self._adapters: dict[str, PromptAdapter] = {}

    def register(self, name: str, embeddings, dtype=jnp.bfloat16) -> PromptAdapter:
        a = PromptAdapter(name, jnp.asarray(np.asarray(embeddings), dtype))
        if name not in self._adapters and len(self._adapters) >= self.capacity:
            self._adapters.pop(next(iter(self._adapters)))
        self._adapters[name] = a
        return a

    def load_peft(self, name: str, weights: dict, dtype=jnp.bfloat16):
        """PEFT prompt-tuning checkpoint: 'prompt_embeddings' tensor."""
        for key in ("prompt_embeddings", "prompt_encoder.embedding.weight"):
            if key in weights:
                return self.register(name, weights[key], dtype)
        raise ValueError(
            f"no prompt embeddings found in adapter {name!r}: {list(weights)}"
        )

    def get(self, name: str) -> PromptAdapter:
        if name not in self._adapters:
            raise ValueError(
                f"unknown prompt adapter {name!r}; loaded: {self.list()}"
            )
        a = self._adapters.pop(name)  # LRU touch
        self._adapters[name] = a
        return a

    def unload(self, name: str) -> bool:
        return self._adapters.pop(name, None) is not None

    def list(self) -> list[str]:
        return sorted(self._adapters)


class PromptAdapterEngine(SpecLLMEngine):
    """Engine with per-request prompt-adapter injection. Same slot-buffer
    mechanics as the VLM engine: adapter embeddings land in a per-slot
    device buffer, the step injects them at the virtual-token positions
    (which survive chunked prefill and preemption-recompute for free)."""

    def __init__(self, model, params, config, tokenizer=None,
                 max_virtual_tokens: int = 64, adapter_capacity: int = 8):
        super().__init__(model, params, config, tokenizer,
                         proposer=_NullProposer())
        h = model.config.hidden_size
        self.adapters = PromptAdapterManager(adapter_capacity)
        self.max_mm_tokens = max_virtual_tokens
        self.mm_buf = jnp.zeros(
            (self.num_slots + 1, max_virtual_tokens, h), model.dtype
        )
        self._mm: dict[str, tuple[jax.Array, list[tuple[int, int]]]] = {}

    # -- admission ---------------------------------------------------------

    def add_request_with_adapter(
        self,
        request_id: str,
        prompt_ids: list[int],
        adapter_name: str,
        params: SamplingParams | None = None,
        pad_token_id: int = 0,
    ) -> None:
        a = self.adapters.get(adapter_name)
        n = a.num_virtual_tokens
        if n > self.max_mm_tokens:
            raise ValueError(
                f"adapter {adapter_name!r} has {n} virtual tokens; engine "
                f"budget is {self.max_mm_tokens}"
            )
        expanded = [pad_token_id] * n + list(prompt_ids)
        self._mm[request_id] = (a.embeddings, [(0, n)])
        self.add_request(request_id, expanded, params)

    # -- engine hooks (identical contract to engine/vlm.py) -----------------

    def _assign_slot(self, seq: Sequence) -> None:
        super()._assign_slot(seq)
        mm = self._mm.get(seq.request_id)
        if mm is not None:
            e, _ = mm
            self.mm_buf = self.mm_buf.at[seq.slot, : e.shape[0]].set(
                e.astype(self.mm_buf.dtype)
            )

    def _build_mm(self, scheduled: list[ScheduledSeq], t_pad: int):
        mm_idx = np.full(t_pad, -1, np.int32)
        any_mm = False
        offset = 0
        for sch in scheduled:
            seq, nt = sch.seq, sch.num_tokens
            mm = self._mm.get(seq.request_id)
            if mm is not None:
                _, spans = mm
                start = seq.num_computed_tokens
                base = 0
                for s0, ln in spans:
                    lo, hi = max(start, s0), min(start + nt, s0 + ln)
                    if lo < hi:
                        any_mm = True
                        rel = np.arange(lo, hi)
                        mm_idx[offset + (lo - start) : offset + (hi - start)] = (
                            base + rel - s0
                        )
                    base += ln
            offset += nt
        if not any_mm:
            return None
        return self.mm_buf, jnp.asarray(mm_idx)

    def _finish(self, seq, reason, stop_reason=None) -> None:
        super()._finish(seq, reason, stop_reason)
        self._mm.pop(seq.request_id, None)
