"""Suffix-automaton draft proposer.

Reference: spec_decode/suffix.rs (920) — zero-VRAM prompt lookup that
finds the LONGEST suffix of the sequence that occurred earlier (the
n-gram proposer is limited to a fixed max n) and proposes the tokens
that followed that occurrence. Built incrementally per sequence as
tokens are verified, O(1) amortized per token.
"""

from __future__ import annotations

from ..request import Sequence


class _SuffixAutomaton:
    """Classic online suffix automaton with first-end-position tracking."""

    def __init__(self):
        self.next: list[dict[int, int]] = [{}]
        self.link = [-1]
        self.len = [0]
        self.first = [0]  # earliest end position (token count) per state
        self.last = 0
        self.n = 0

    def extend(self, c: int) -> None:
        self.n += 1
        cur = len(self.len)
        self.next.append({})
        self.len.append(self.len[self.last] + 1)
        self.link.append(0)
        self.first.append(self.n)
        p = self.last
        while p != -1 and c not in self.next[p]:
            self.next[p][c] = cur
            p = self.link[p]
        if p == -1:
            self.link[cur] = 0
        else:
            q = self.next[p][c]
            if self.len[p] + 1 == self.len[q]:
                self.link[cur] = q
            else:
                clone = len(self.len)
                self.next.append(dict(self.next[q]))
                self.len.append(self.len[p] + 1)
                self.link.append(self.link[q])
                self.first.append(self.first[q])
                while p != -1 and self.next[p].get(c) == q:
                    self.next[p][c] = clone
                    p = self.link[p]
                self.link[q] = clone
                self.link[cur] = clone
        self.last = cur

    def longest_earlier_suffix(self) -> tuple[int, int]:
        """(length L, end position) of the longest proper suffix of the
        stream that also occurred ending before the current position."""
        v = self.link[self.last]
        if v <= 0:
            return 0, 0
        return self.len[v], self.first[v]


class SuffixProposer:
    def __init__(self, num_draft_tokens: int = 4, min_match: int = 1):
        self.max_draft_tokens = num_draft_tokens
        self.min_match = min_match
        self._sams: dict[str, tuple[_SuffixAutomaton, int]] = {}

    def propose(self, seq: Sequence) -> list[int]:
        tokens = seq.all_token_ids
        sam, consumed = self._sams.get(seq.request_id, (None, 0))
        if sam is None:
            sam = _SuffixAutomaton()
        for t in tokens[consumed:]:
            sam.extend(t)
        self._sams[seq.request_id] = (sam, len(tokens))
        length, end = sam.longest_earlier_suffix()
        if length < self.min_match:
            return []
        return list(tokens[end : end + self.max_draft_tokens])

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        pass  # propose() extends lazily from the verified stream

    def on_preempt(self, seq: Sequence) -> None:
        pass  # token history is unchanged by preemption

    def on_request_complete(self, seq: Sequence) -> None:
        self._sams.pop(seq.request_id, None)
