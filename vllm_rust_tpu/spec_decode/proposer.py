"""Draft proposer protocol.

Reference: spec_decode/mod.rs:75 DraftProposer (init_request /
propose_for_request / on_tokens_verified / on preempt/complete). Host-side
proposers (ngram, suffix) need only `propose`; model-based proposers
(draft model, EAGLE, Medusa, MTP) additionally manage device state via
the lifecycle hooks.
"""

from __future__ import annotations

from typing import Protocol

from ..request import Sequence


class DraftProposer(Protocol):
    max_draft_tokens: int

    def propose(self, seq: Sequence) -> list[int]:
        """Return up to max_draft_tokens draft token ids for this seq."""
        ...

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        """Called after verification with the number of accepted drafts."""
        ...

    def on_request_complete(self, seq: Sequence) -> None: ...
