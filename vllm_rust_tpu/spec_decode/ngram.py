"""N-gram (prompt-lookup) draft proposer.

Reference: spec_decode/ngram.rs (510 LoC): zero-VRAM drafting — find the
most recent earlier occurrence of the sequence's trailing n-gram and
propose the tokens that followed it. Tries the longest n-gram first
(higher precision), down to ``min_ngram``.
"""

from __future__ import annotations

from ..request import Sequence


class NgramProposer:
    def __init__(
        self,
        num_draft_tokens: int = 4,
        min_ngram: int = 1,
        max_ngram: int = 4,
    ):
        self.max_draft_tokens = num_draft_tokens
        self.min_ngram = min_ngram
        self.max_ngram = max_ngram

    def propose(self, seq: Sequence) -> list[int]:
        tokens = seq.all_token_ids
        n = len(tokens)
        if n < self.min_ngram + 1:
            return []
        for m in range(min(self.max_ngram, n - 1), self.min_ngram - 1, -1):
            tail = tokens[n - m :]
            # scan for the most recent earlier occurrence of `tail`
            for start in range(n - m - 1, -1, -1):
                if tokens[start : start + m] == tail:
                    follow = tokens[start + m : start + m + self.max_draft_tokens]
                    if follow:
                        return list(follow)
                    break
        return []

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        pass

    def on_request_complete(self, seq: Sequence) -> None:
        pass
